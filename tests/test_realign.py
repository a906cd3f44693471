"""core/realign.py — the gather-free dynamic-window realign must be an
EXACT pick (f32-bit-identical to fancy indexing) across row-boundary,
zero, and out-of-range shifts; out-of-range rows come back as zeros."""

import numpy as np

import jax.numpy as jnp

from trackmaker_tpu.core.realign import shift_realign


def test_shift_realign_exact_picks():
    rng = np.random.default_rng(3)
    src = rng.normal(0, 1, (7, 256)).astype(np.float32)
    s = np.asarray([0, 1, 7, 8, 9, 127, 128], np.int32)
    got = np.asarray(shift_realign(jnp.asarray(src), jnp.asarray(s), 64))
    for c in range(7):
        sl = src[c, s[c]: s[c] + 64]
        want = np.zeros(64, np.float32)
        want[: len(sl)] = sl
        assert np.array_equal(got[c], want), s[c]


def test_shift_realign_out_of_range_is_zero():
    rng = np.random.default_rng(4)
    src = rng.normal(0, 1, (4, 64)).astype(np.float32)
    # negative and far-past-the-end shifts (the BIGI sentinel cursors)
    s = np.asarray([-1, -1000, 64, 2**30], np.int32)
    got = np.asarray(shift_realign(jnp.asarray(src), jnp.asarray(s), 32))
    assert np.array_equal(got[1], np.zeros(32, np.float32))
    assert np.array_equal(got[2], np.zeros(32, np.float32))
    assert np.array_equal(got[3], np.zeros(32, np.float32))
    # s = -1: row part a = -1 -> all-zero one-hot regardless of lane part
    assert np.array_equal(got[0], np.zeros(32, np.float32))


def test_shift_realign_tail_zero_fill():
    """Shifts whose window runs past the source end zero-fill exactly
    like the padded sources the receivers build."""
    src = np.arange(1, 65, dtype=np.float32)[None, :]
    got = np.asarray(shift_realign(jnp.asarray(src),
                                   jnp.asarray([40], np.int32), 32))
    want = np.zeros(32, np.float32)
    want[:24] = src[0, 40:]
    assert np.array_equal(got[0], want)
