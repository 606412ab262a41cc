"""End-to-end wiring of the pretrained / retrained vocabulary.

The reference loads a ~1M-leaf DBoW2 vocabulary at startup
(src/System.cc:62-76); this framework can (a) import one from the DBoW2
text format and use it for loop closing + relocalization, or (b) train
its own and periodically retrain it from the whole keyframe arena so BoW
scores do not saturate on long sequences.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from myslam_tpu.io import synthetic
from myslam_tpu.matching import vocabulary
from myslam_tpu.slam import tracking
from myslam_tpu.utils.config import Settings, load_settings


def _write_vocab(path, k=8, seed=0):
    """DBoW2 text format: header `k L 0 0`, then BFS nodes
    `parent is_leaf d0..d31 weight` (k level-1 nodes, k^2 leaves)."""
    rng = np.random.default_rng(seed)
    lines = [f"{k} 2 0 0"]
    nid = 0
    lvl1 = []
    for _ in range(k):
        nid += 1
        d = rng.integers(0, 256, 32)
        lines.append("0 0 " + " ".join(map(str, d)) + " 0")
        lvl1.append(nid)
    for p in lvl1:
        for _ in range(k):
            nid += 1
            d = rng.integers(0, 256, 32)
            lines.append(f"{p} 1 " + " ".join(map(str, d)) + " 0.5")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def _run(cam, cfg, n_frames=40):
    seq = synthetic.FeatureSequence(cam, feat_cap=cfg.feat_cap,
                                    noise_px=0.3, desc_flips=2)
    tr = tracking.Tracker(cam, cfg)
    for i in range(n_frames):
        feats, _ = seq.frame(i)
        tr.process_frame(feats, i, i * 0.1)
    return tr


def test_pretrained_vocab_drives_loop_closer(tmp_path):
    """vocab_path -> load_dbow2_text -> LoopCloser: the loaded word set
    (k^2 leaves cut at depth 2) is what detect/reloc score against."""
    p = tmp_path / "voc.txt"
    _write_vocab(str(p), k=8)
    cam = synthetic.default_camera()
    cfg = tracking.TrackingConfig(
        kf_cap=32, pt_cap=4096, feat_cap=256,
        local_kf=8, local_pts=1024, ba_free=6, ba_fixed=6,
        ba_pts=1024, ba_obs=6, max_new_points=128,
        vocab_path=str(p), vocab_retrain_every=4)
    tr = _run(cam, cfg)
    assert tr.loop_closer is not None
    assert tr.loop_closer.vocab.words.shape[0] == 64  # 8^2 leaves
    assert tr.loop_closer.db.bow.shape[1] == 64
    # a pretrained vocabulary is never retrained away
    assert tr.n_kf >= 5
    assert tr.loop_closer.vocab.words.shape[0] == 64


def test_periodic_retrain_grows_vocab():
    """Without a vocab file the 2-KF bootstrap vocabulary is retrained
    from ALL keyframes every vocab_retrain_every insertions; word count
    grows with the map and the database is rebuilt to the new width."""
    cam = synthetic.default_camera()
    cfg = tracking.TrackingConfig(
        kf_cap=32, pt_cap=4096, feat_cap=256,
        local_kf=8, local_pts=1024, ba_free=6, ba_fixed=6,
        ba_pts=1024, ba_obs=6, max_new_points=128,
        vocab_words=128, vocab_retrain_every=2, vocab_words_max=1024)
    tr = _run(cam, cfg, n_frames=50)
    lc = tr.loop_closer
    assert lc is not None
    assert tr.n_kf > 4  # enough insertions to trigger a retrain
    W = lc.vocab.words.shape[0]
    assert W > 128, "vocabulary never retrained/grew"
    assert lc.db.bow.shape[1] == W
    # every live keyframe must be re-encoded in the rebuilt database
    kf_valid = np.asarray(tr.store.kf_valid)
    db_valid = np.asarray(lc.db.valid)
    assert (db_valid[kf_valid]).all()
    # and the rebuilt rows actually score: self-similarity is maximal
    scores, _ = vocabulary.query_database(
        lc.db, lc.db.bow[np.nonzero(kf_valid)[0][0]])
    assert float(np.asarray(scores).max()) > 0.5


def test_settings_key_and_system_arg(tmp_path):
    p = tmp_path / "voc.txt"
    _write_vocab(str(p), k=4)
    yaml = tmp_path / "cfg.yaml"
    yaml.write_text("%YAML:1.0\nCamera.fx: 450.0\n"
                    f"Vocabulary.path: {p}\n")
    s = load_settings(str(yaml))
    assert s.vocab_path == str(p)

    from myslam_tpu.slam.system import System
    sys_ = System(settings=s)
    assert sys_.tracker.cfg.vocab_path == str(p)
    # ctor arg wins over settings
    sys2 = System(settings=s, vocab_file="other.txt")
    assert sys2.tracker.cfg.vocab_path == "other.txt"
