"""DBoW2 text-vocabulary import (matching/vocabulary.load_dbow2_text):
build a tiny k=3, L=2 tree in the reference's text format and verify the
depth-cut word set and idf accumulation."""

import numpy as np
import jax.numpy as jnp

from myslam_tpu.matching import vocabulary


def _write_vocab(path, k=3, L=2, seed=0):
    """Emit DBoW2 text: header then BFS nodes `parent is_leaf 32b w`."""
    rng = np.random.default_rng(seed)
    lines = [f"{k} {L} 0 0"]
    descs = {}
    nid = 0
    # level 1: k children of root (id 0)
    lvl1 = []
    for _ in range(k):
        nid += 1
        d = rng.integers(0, 256, 32)
        descs[nid] = d
        lines.append("0 0 " + " ".join(map(str, d)) + " 0")
        lvl1.append(nid)
    # level 2: k leaves per level-1 node
    for p in lvl1:
        for _ in range(k):
            nid += 1
            d = rng.integers(0, 256, 32)
            descs[nid] = d
            lines.append(f"{p} 1 " + " ".join(map(str, d)) + " 0.5")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return descs, lvl1


def test_load_cut_at_depth1(tmp_path):
    p = tmp_path / "voc.txt"
    descs, lvl1 = _write_vocab(str(p), k=3)
    voc = vocabulary.load_dbow2_text(str(p), depth=1)
    assert voc.words.shape == (3, 8)
    # each word's packed descriptor must round-trip the level-1 bytes
    for w, nid in enumerate(lvl1):
        got = np.asarray(voc.words[w])
        raw = descs[nid].astype(np.uint32).reshape(8, 4)
        expect = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16) \
            | (raw[:, 3] << 24)
        np.testing.assert_array_equal(got, expect)
    # idf accumulated the 3 leaves' weights (0.5 each) under every word
    np.testing.assert_allclose(np.asarray(voc.idf), 1.5)


def test_loaded_vocab_usable_for_assignment(tmp_path):
    p = tmp_path / "voc.txt"
    _write_vocab(str(p), k=4)
    voc = vocabulary.load_dbow2_text(str(p), depth=1)
    # assigning the word centroids themselves must return their own ids
    ids = vocabulary.assign_words(
        voc, voc.words, jnp.ones(voc.words.shape[0], bool))
    np.testing.assert_array_equal(np.asarray(ids),
                                  np.arange(voc.words.shape[0]))
