"""core/blockq — block-bitmap first-set queries (shared by the ASK
receiver's update search and the OFDM preamble walk)."""

import numpy as np
import jax.numpy as jnp

from trackmaker_tpu.core import blockq


def _naive_first(mask, cursor):
    idx = np.nonzero(mask[cursor:])[0]
    return (cursor + idx[0], True) if len(idx) else (None, False)


def test_first_set_from_matches_naive():
    rng = np.random.default_rng(0)
    mask = rng.random(3000) < 0.01
    tables = blockq.block_tables(jnp.asarray(mask))
    for cursor in [0, 1, 511, 512, 513, 1024, 2999, 3000, 4000, -5]:
        first, has = blockq.first_set_from(tables, cursor)
        want, whas = _naive_first(mask, int(np.clip(cursor, 0, 3000)))
        assert bool(has) == whas, cursor
        if whas:
            assert int(first) == want, (cursor, int(first), want)


def test_first_set_from_empty_and_dense():
    t = 1200
    empty = blockq.block_tables(jnp.zeros(t, bool))
    _, has = blockq.first_set_from(empty, 0)
    assert not bool(has)
    full = blockq.block_tables(jnp.ones(t, bool))
    for cursor in (0, 700, t - 1):
        first, has = blockq.first_set_from(full, cursor)
        assert bool(has) and int(first) == cursor


def test_block_tables_batched_shape():
    mask = jnp.zeros((4, 1030), bool)
    blocks, any_ = blockq.block_tables(mask)
    assert blocks.shape == (4, 3, 512) and any_.shape == (4, 3)
