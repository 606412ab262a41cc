"""Place-recognition recall on a LONG rendered loop sequence.

The reference validates loop detection through KeyFrameDatabase queries
over DBoW2 vectors (src/KeyFrameDatabase.cc:76-197 +
TemplatedVocabulary.h:1127-1193). This test checks the property that
actually matters at map scale and that a too-small vocabulary loses: on
a sequence much longer than the vocabulary's training window, the TRUE
revisit must outrank every non-revisit keyframe, and non-revisits must
stay below the reference's min_score gate.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from myslam_tpu.features.extractor import ORBExtractor
from myslam_tpu.io import synthetic
from myslam_tpu.matching import vocabulary

T_LOOP = 300          # frames for a full orbit — "300-frame loop"
DB_STRIDE = 10        # database keyframe every 10 frames -> 30 entries
W, H = 512, 384


@pytest.fixture(scope="module")
def sequence_bow():
    """Extract ORB + BoW for a 300-frame orbit's database keyframes and
    for revisit queries (frames T_LOOP + q see the wall section frame q
    saw)."""
    scene = synthetic.Rendered3DScene(width=W, height=H, t_loop=T_LOOP,
                                      n_points=12000)
    ex = ORBExtractor(H, W, n_features=1200)

    db_frames = list(range(0, T_LOOP, DB_STRIDE))
    feats = {}
    for f in db_frames:
        feats[f] = ex(jnp.asarray(scene.frame(f), jnp.float32))
    # queries: genuine revisits of database frames 0 and 100
    queries = {0: T_LOOP, 100: T_LOOP + 100}
    for true_f, qf in queries.items():
        feats[qf] = ex(jnp.asarray(scene.frame(qf), jnp.float32))

    # vocabulary trained from a SUBSET of the database pass (every 5th
    # database keyframe) — the realistic regime: the vocab never saw the
    # query frames
    train = jnp.concatenate([feats[f].desc for f in db_frames[::5]])
    train_ok = jnp.concatenate([feats[f].valid for f in db_frames[::5]])
    vocab = vocabulary.train_vocabulary(train, train_ok, n_words=1024,
                                        iters=6)

    def bow(f):
        ids = vocabulary.assign_words(vocab, feats[f].desc, feats[f].valid)
        return vocabulary.bow_vector(vocab, ids, feats[f].valid)

    vecs = {f: bow(f) for f in feats}
    return db_frames, queries, vecs


class TestLongSequenceRecall:
    def test_revisit_ranks_top3(self, sequence_bow):
        db_frames, queries, vecs = sequence_bow
        for true_f, qf in queries.items():
            scores = np.array(
                [float(vocabulary.l1_score(vecs[qf], vecs[f]))
                 for f in db_frames])
            order = np.argsort(-scores)
            top3 = [db_frames[i] for i in order[:3]]
            # the true revisit (or its immediate orbit neighbor — half a
            # stride of drift) must be in the top 3 candidates
            hits = [f for f in top3
                    if abs(f - true_f) <= DB_STRIDE
                    or abs(f - true_f) >= T_LOOP - DB_STRIDE]
            assert hits, (true_f, top3, scores[order[:5]])

    def test_non_revisits_below_min_score(self, sequence_bow):
        """Non-revisit keyframes must score clearly below the true match —
        the margin the reference's minScore gate relies on
        (LoopClosing::DetectLoop, src/LoopClosing.cc:124-141)."""
        db_frames, queries, vecs = sequence_bow
        for true_f, qf in queries.items():
            best_true, best_far = 0.0, 0.0
            for f in db_frames:
                s = float(vocabulary.l1_score(vecs[qf], vecs[f]))
                near = (abs(f - true_f) <= 2 * DB_STRIDE
                        or abs(f - true_f) >= T_LOOP - 2 * DB_STRIDE)
                if near:
                    best_true = max(best_true, s)
                else:
                    best_far = max(best_far, s)
            # true revisit separates from the best impostor
            assert best_true > best_far + 0.05, (true_f, best_true,
                                                 best_far)
