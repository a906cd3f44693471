"""Echo/multipath robustness of the line-coded PHY decoder.

The acoustic channel adds early reflections (desk, walls).  The
line-coded PHY has no equalizer — parity with the reference — but the
half-bit/level averaging gives it inherent tolerance to short, weak
echoes; these tests document that envelope (OFDM's CP-based tolerance
is covered in test_ofdm.py)."""

import numpy as np

import jax.numpy as jnp

from trackmaker_tpu.core.config import FOUR_B_FIVE_B, MANCHESTER, PhyConfig
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.dsp.channel import multipath
from trackmaker_tpu.oracle.phy import OracleEncoder
from trackmaker_tpu.phy.decoder import decode_capture

import pytest


def _run(cfg, taps, sigma=0.02, n=4, seed=0):
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
    res = decode_capture(cfg, jnp.asarray(echoed), 2, max_frames=n + 4)
    got = sorted(
        bytes(fb[7:7 + int(ln)])
        for fb, ln, ok in zip(np.asarray(res.frame_bytes),
                              np.asarray(res.length),
                              np.asarray(res.valid)) if ok)
    return got, sorted(f.data for f in frames)


@pytest.mark.parametrize("lc", [MANCHESTER, FOUR_B_FIVE_B])
def test_weak_short_echo_decodes_clean(lc):
    """-12 dB echo at ~0.6 ms (a nearby desk reflection)."""
    cfg = PhyConfig(line_coding=lc)
    taps = np.zeros(30, np.float32)
    taps[0] = 1.0
    taps[29] = 0.25
    got, want = _run(cfg, taps)
    assert got == want


def test_moderate_echo_pair_decodes():
    """Two reflections (-12 dB and -18 dB) at different delays."""
    cfg = PhyConfig()
    taps = np.zeros(60, np.float32)
    taps[0] = 1.0
    taps[17] = 0.25
    taps[59] = 0.125
    got, want = _run(cfg, taps)
    assert got == want


def test_strong_echo_degrades_not_corrupts():
    """A -4.4 dB echo breaks frames — but CRC keeps every emitted
    payload exact (no silent corruption, the reference's guarantee)."""
    cfg = PhyConfig()
    taps = np.zeros(40, np.float32)
    taps[0] = 1.0
    taps[39] = 0.6
    got, want = _run(cfg, taps)
    assert all(g in want for g in got)    # only true payloads come out
