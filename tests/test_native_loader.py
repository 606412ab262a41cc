"""Native C++ image decoder + prefetch loader (ctypes binding).

Builds are produced by `make -C native`; tests skip if absent. PNG decode
is validated against a from-scratch PNG writer (zlib via Python) so no
image library is required.
"""

import os
import struct
import subprocess
import zlib

import numpy as np
import pytest

from myslam_tpu.io import native_loader

REPO = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                   check=True, capture_output=True)
    assert native_loader.available()


def write_png(path, img, color=False):
    """Minimal PNG writer (8-bit gray or RGB, filter 0)."""
    h, w = img.shape[:2]

    def chunk(tag, data):
        c = tag + data
        return (struct.pack(">I", len(data)) + c
                + struct.pack(">I", zlib.crc32(c) & 0xFFFFFFFF))

    ctype = 2 if color else 0
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    rows = b""
    for y in range(h):
        rows += b"\x00" + img[y].tobytes()
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(rows)) + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def write_pgm(path, img):
    h, w = img.shape
    with open(path, "wb") as f:
        f.write(f"P5\n{w} {h}\n255\n".encode() + img.tobytes())


class TestDecode:
    def test_png_gray_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (48, 64), dtype=np.uint8)
        p = tmp_path / "g.png"
        write_png(str(p), img)
        out = native_loader.decode_file(str(p))
        assert out is not None and out.shape == (48, 64)
        assert np.array_equal(out, img.astype(np.float32))

    def test_png_rgb_luma(self, tmp_path):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
        p = tmp_path / "c.png"
        write_png(str(p), img, color=True)
        out = native_loader.decode_file(str(p))
        ref = (0.299 * img[..., 0] + 0.587 * img[..., 1]
               + 0.114 * img[..., 2]).astype(np.float32)
        assert out.shape == (32, 40)
        assert np.abs(out - ref).max() < 0.51

    def test_pgm(self, tmp_path):
        img = np.arange(0, 120, dtype=np.uint8).reshape(10, 12)
        p = tmp_path / "i.pgm"
        write_pgm(str(p), img)
        out = native_loader.decode_file(str(p))
        assert np.array_equal(out, img.astype(np.float32))

    def test_bad_file(self, tmp_path):
        p = tmp_path / "junk.png"
        p.write_bytes(b"not an image at all")
        assert native_loader.decode_file(str(p)) is None


class TestPrefetch:
    def test_ordered_iteration(self, tmp_path):
        rng = np.random.default_rng(2)
        paths = []
        imgs = []
        for i in range(12):
            img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
            p = tmp_path / f"f{i}.png"
            write_png(str(p), img)
            paths.append(str(p))
            imgs.append(img)
        loader = native_loader.PrefetchLoader(paths, n_workers=3, ahead=4)
        seen = []
        for idx, img in loader:
            assert np.array_equal(img, imgs[idx].astype(np.float32))
            seen.append(idx)
        loader.close()
        assert seen == list(range(12))

    def test_failed_frame_is_empty(self, tmp_path):
        good = tmp_path / "a.png"
        write_png(str(good), np.zeros((8, 8), np.uint8))
        bad = tmp_path / "b.png"
        bad.write_bytes(b"junk")
        loader = native_loader.PrefetchLoader([str(good), str(bad)],
                                             n_workers=1, ahead=2)
        out = list(loader)
        loader.close()
        assert len(out) == 2
        assert out[1][1].size == 0
