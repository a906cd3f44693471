"""Preamble-trained MMSE equalizer (dsp/equalizer.py) — beyond-parity
multipath front-end for the line-coded PHY.

The headline claim: a 2-path channel (echo amplitude 0.5, 7-sample
delay) that drops the stock decoder to 0 frames is fully recovered by
the equalizer.  The stock-decoder envelope (what survives WITHOUT an
equalizer) is pinned in test_multipath_phy.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from trackmaker_tpu.core.config import FOUR_B_FIVE_B, MANCHESTER, PhyConfig
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.dsp.channel import multipath
from trackmaker_tpu.dsp.equalizer import (
    decode_capture_eq, equalize_capture, estimate_channel)
from trackmaker_tpu.oracle.phy import OracleEncoder
from trackmaker_tpu.phy.decoder import decode_capture


def _capture(cfg, taps, sigma=0.01, n=8, seed=0):
    enc = OracleEncoder(cfg)
    rng = np.random.default_rng(seed)
    frames = [Frame.new_data(i, 1, 2, bytes([i + 1]) * 40)
              for i in range(n)]
    parts = []
    for f in frames:
        parts.append(enc.encode_frame(f))
        parts.append(np.zeros(400, np.float32))
    wave = np.concatenate(parts + [np.zeros(600, np.float32)])
    echoed = np.asarray(multipath(jnp.asarray(wave), jnp.asarray(taps)))
    echoed = (echoed + rng.normal(0, sigma, len(echoed))).astype(
        np.float32)
    return echoed, sorted(f.data for f in frames)


def _payloads(res):
    return sorted(
        bytes(fb[7:7 + int(ln)])
        for fb, ln, ok in zip(np.asarray(res.frame_bytes),
                              np.asarray(res.length),
                              np.asarray(res.valid)) if ok)


@pytest.mark.parametrize("lc", [MANCHESTER, FOUR_B_FIVE_B])
def test_strong_echo_recovered(lc):
    """Echo 0.5 @ 7 samples: stock decoder gets nothing, equalized
    decode returns every frame."""
    cfg = PhyConfig(line_coding=lc)
    taps = np.zeros(8, np.float32)
    taps[0] = 1.0
    taps[7] = 0.5
    echoed, want = _capture(cfg, taps)
    n = len(want)
    stock = _payloads(decode_capture(cfg, jnp.asarray(echoed), 2,
                                     max_frames=n + 4))
    assert len(stock) < n        # the channel genuinely breaks stock
    eq = _payloads(decode_capture_eq(cfg, echoed, 2, max_frames=n + 4))
    assert eq == want


def test_acausal_echo_recovered():
    """The DELAYED path is the stronger one, so the anchor locks onto
    it and the direct path becomes an acausal tap — the K0 margin must
    bracket it (delay 11 < K0 = 16)."""
    cfg = PhyConfig()
    taps = np.zeros(12, np.float32)
    taps[0] = 0.6
    taps[11] = 1.0
    echoed, want = _capture(cfg, taps, sigma=0.005)
    eq = _payloads(decode_capture_eq(cfg, echoed, 2,
                                     max_frames=len(want) + 4))
    assert eq == want


def test_clean_channel_is_decision_neutral():
    """On a clean capture the equalizer trains on the (identity)
    channel and the decode must stay decision-for-decision equal."""
    cfg = PhyConfig()
    taps = np.zeros(1, np.float32)
    taps[0] = 1.0
    echoed, want = _capture(cfg, taps, sigma=0.02, seed=3)
    a = decode_capture(cfg, jnp.asarray(echoed), 2, max_frames=12)
    b = decode_capture_eq(cfg, echoed, 2, max_frames=12)
    assert _payloads(a) == _payloads(b) == want
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))


def test_noise_only_passes_through():
    """No preamble above quality 0.5 -> gate holds, output == input."""
    cfg = PhyConfig()
    rng = np.random.default_rng(7)
    noise = rng.normal(0, 0.1, 40_000).astype(np.float32)
    out, info = equalize_capture(cfg, jnp.asarray(noise))
    assert not bool(info["applied"])
    np.testing.assert_array_equal(np.asarray(out), noise)


def test_channel_estimate_matches_truth():
    """LS taps recover the simulated impulse response (within noise)."""
    cfg = PhyConfig()
    taps = np.zeros(10, np.float32)
    taps[0] = 1.0
    taps[4] = -0.4
    taps[9] = 0.3
    echoed, _ = _capture(cfg, taps, sigma=0.005)
    from trackmaker_tpu import sync as sync_mod
    from trackmaker_tpu.phy import line_coding
    pre = np.asarray(line_coding.preamble_waveform(cfg))
    corr = sync_mod.auto_xcorr(jnp.asarray(echoed), pre)
    anchor = jnp.argmax(corr).astype(jnp.int32)
    h, lam = estimate_channel(cfg, jnp.asarray(echoed), anchor)
    h = np.asarray(h)
    from trackmaker_tpu.dsp.equalizer import K0
    est = h[K0:K0 + 10]
    assert np.max(np.abs(est - taps)) < 0.06
    assert float(lam) < 0.05
