"""Sharded loop-candidate search on the virtual 8-device mesh
(parallel/loop_search.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from myslam_tpu.matching.vocabulary import KeyFrameDatabase
from myslam_tpu.parallel import loop_search


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_query_matches_dense():
    rng = np.random.default_rng(0)
    K, W = 48, 256
    bow = rng.uniform(0, 1, (K, W)).astype(np.float32)
    bow /= bow.sum(1, keepdims=True)
    valid = np.ones(K, bool)
    valid[40:] = False
    db = KeyFrameDatabase(bow=jnp.asarray(bow), has=jnp.asarray(bow > 0),
                          valid=jnp.asarray(valid))

    mesh = Mesh(np.array(jax.devices()[:8]), ("kf",))
    sdb = loop_search.shard_database(db, mesh)
    query = loop_search.make_sharded_query(mesh, top_k=5)

    q = bow[7] * 0.6 + bow[23] * 0.4
    excl = np.zeros(K, bool)
    excl[7] = True  # covisible exclusion
    scores, ids = query(sdb, jnp.asarray(q), jnp.asarray(excl))
    scores, ids = np.asarray(scores), np.asarray(ids)

    # dense reference
    sim = np.minimum(bow, q[None]).sum(1)
    sim[~valid] = -1
    sim[excl] = -1
    order = np.argsort(sim)[::-1][:5]
    assert set(ids.tolist()) == set(order.tolist())
    np.testing.assert_allclose(np.sort(scores), np.sort(sim[order]),
                               rtol=1e-5)
    assert 7 not in ids
