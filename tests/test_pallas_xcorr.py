"""Pallas fused xcorr kernel vs. the XLA reference path (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from trackmaker_tpu.core.config import PhyConfig
from trackmaker_tpu.phy.line_coding import preamble_waveform
from trackmaker_tpu.sync.correlate import normalized_xcorr
from trackmaker_tpu.sync.pallas_xcorr import pallas_normalized_xcorr
from trackmaker_tpu.dsp.osc import chirp_np


@pytest.mark.parametrize("t", [2048, 5000, 100_000])
def test_kernel_matches_xla_manchester(t):
    cfg = PhyConfig()
    pre = preamble_waveform(cfg)
    rng = np.random.default_rng(0)
    x = rng.normal(0, 0.5, t).astype(np.float32)
    want = np.asarray(normalized_xcorr(jnp.asarray(x), jnp.asarray(pre)))
    got = np.asarray(pallas_normalized_xcorr(
        jnp.asarray(x), pre, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_kernel_matches_xla_long_pattern():
    """Chirp preamble (L=440) exercises the multi-tile band."""
    pre = chirp_np(440)
    rng = np.random.default_rng(1)
    x = rng.normal(0, 0.5, 20_000).astype(np.float32)
    want = np.asarray(normalized_xcorr(jnp.asarray(x), jnp.asarray(pre)))
    got = np.asarray(pallas_normalized_xcorr(
        jnp.asarray(x), pre, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_kernel_detects_preamble_peak():
    cfg = PhyConfig()
    pre = preamble_waveform(cfg)
    x = np.zeros(8192, np.float32)
    x[1000:1000 + len(pre)] = pre
    corr = np.asarray(pallas_normalized_xcorr(
        jnp.asarray(x), pre, interpret=True))
    assert np.argmax(corr) == 1000
    assert corr[1000] > 0.999
    # low-energy clamp: silence regions are exactly 0
    assert corr[:100].max() == 0.0


def test_batched_hits_match_vmapped():
    """The batch-folded (bc, lag-tile) 2-D-grid hits kernel must be
    row-for-row identical to the vmapped 1-capture kernel — positions,
    counts, and bitcast correlation values — including at batch sizes
    that need capture padding (b % bc != 0)."""
    from trackmaker_tpu.sync.pallas_xcorr import (
        pallas_xcorr_hits, pallas_xcorr_hits_batched)
    import jax

    cfg = PhyConfig()
    pre = preamble_waveform(cfg)
    rng = np.random.default_rng(2)
    t, b = 40_000, 5
    x = rng.normal(0, 0.3, (b, t)).astype(np.float32)
    for row in range(b):                    # plant real preambles
        for p in (1000 + 531 * row, 17000 + 113 * row, t - len(pre) - 7):
            x[row, p:p + len(pre)] += pre
    xj = jnp.asarray(x)
    _, want = jax.vmap(lambda s: pallas_xcorr_hits(
        s, pre, cfg.correlation_threshold, blk=8192,
        interpret=True, emit_corr=False))(xj)
    got = pallas_xcorr_hits_batched(
        xj, pre, cfg.correlation_threshold, blk=8192, bc=4,
        interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(want))
