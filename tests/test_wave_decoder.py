"""Parallel wave decoder vs the exact sequential path."""

import numpy as np
import jax.numpy as jnp
import pytest

from trackmaker_tpu.core.config import PhyConfig
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.oracle.phy import OracleEncoder
from trackmaker_tpu.phy.decoder import (
    _decode_capture_wave, decode_capture, decode_capture_auto)


def _capture(n_frames=12, seed=0, gap=300, noise=0.0, payload=64):
    cfg = PhyConfig()
    rng = np.random.default_rng(seed)
    frames = [Frame.new_data(i, 1, 2,
                             rng.integers(0, 256, payload,
                                          dtype=np.uint8).tobytes())
              for i in range(n_frames)]
    wave = OracleEncoder(cfg).encode_frames(frames, gap_samples=gap)
    if noise:
        wave = wave + rng.normal(0, noise, len(wave)).astype(np.float32)
    return cfg, frames, wave


def _assert_equal(a, b):
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


def test_wave_matches_sequential_clean():
    cfg, frames, wave = _capture()
    res, ok = _decode_capture_wave(cfg, jnp.asarray(wave), 2,
                                   max_frames=16)
    assert bool(ok)
    full = decode_capture(cfg, jnp.asarray(wave), 2, max_frames=16)
    _assert_equal(res, full)
    assert int(res.count) == 12


def test_wave_matches_sequential_noisy():
    cfg, frames, wave = _capture(noise=0.06, seed=3)
    res, ok = _decode_capture_wave(cfg, jnp.asarray(wave), 2,
                                   max_frames=16)
    full = decode_capture(cfg, jnp.asarray(wave), 2, max_frames=16)
    if bool(ok):
        _assert_equal(res, full)
    # auto wrapper must equal exact regardless
    auto = decode_capture_auto(cfg, wave, 2, max_frames=16)
    _assert_equal(auto, full)


def test_wave_flags_nonconformant_evil_payload():
    """Preamble byte pattern inside a payload creates a hit-run inside
    the frame body; the consumed region swallows part of it, leaving a
    mid-run candidate -> the wave pass must flag and the auto wrapper
    must still return the exact result."""
    cfg = PhyConfig()
    evil = b"\x33\x33\x5a" * 20
    frames = [Frame.new_data(0, 1, 2, evil),
              Frame.new_data(1, 1, 2, b"innocent")]
    wave = OracleEncoder(cfg).encode_frames(frames, gap_samples=240)
    full = decode_capture(cfg, jnp.asarray(wave), 2, max_frames=8)
    auto = decode_capture_auto(cfg, wave, 2, max_frames=8)
    _assert_equal(auto, full)
    assert [f.data for f in auto.to_frames()] == [evil, b"innocent"]


def test_auto_batched_mixed_conformance():
    cfg, frames, clean = _capture(n_frames=6, seed=1)
    evil = b"\x33\x33\x5a" * 30
    eframes = [Frame.new_data(0, 1, 2, evil)]
    ewave = OracleEncoder(cfg).encode_frames(eframes)
    tmax = max(len(clean), len(ewave))
    batch = np.stack([np.pad(clean, (0, tmax - len(clean))),
                      np.pad(ewave, (0, tmax - len(ewave)))])
    auto = decode_capture_auto(cfg, batch, 2, max_frames=8)
    import jax
    exact = jax.vmap(lambda s: decode_capture(cfg, s, 2, max_frames=8))(
        jnp.asarray(batch))
    _assert_equal(auto, exact)
    assert np.asarray(auto.count).tolist() == [6, 1]


def test_auto_4b5b_falls_back_to_exact():
    cfg = PhyConfig(line_coding="4b5b")
    frames = [Frame.new_data(i, 1, 2, b"x" * 24) for i in range(3)]
    wave = OracleEncoder(cfg).encode_frames(frames)
    auto = decode_capture_auto(cfg, wave, 2, max_frames=8)
    assert [f.data for f in auto.to_frames()] == [f.data for f in frames]
