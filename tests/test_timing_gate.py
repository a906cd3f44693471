"""Per-frame early-late timing gate (dsp/timing.py): recover frames
whose in-frame clock drift defeats the plain decoder — including
multiple transmitters with DIFFERENT skews in one capture, which the
whole-capture resample search cannot fix with a single ratio."""

import numpy as np

import jax.numpy as jnp

from trackmaker_tpu.core.config import PhyConfig
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.dsp.channel import clock_offset
from trackmaker_tpu.dsp.timing import (
    decode_with_clock_search,
    decode_with_timing_gate,
    estimate_frame_ppm,
)
from trackmaker_tpu.oracle.phy import OracleEncoder
from trackmaker_tpu.phy.decoder import decode_capture


def _skewed_frame(cfg, enc, frame, ppm, rng, sigma=0.02):
    w = np.asarray(enc.encode_frame(frame), np.float32)
    if ppm:
        w = np.asarray(clock_offset(jnp.asarray(w), ppm))
    return (w + rng.normal(0, sigma, len(w))).astype(np.float32)


def _payloads(res):
    v = np.asarray(res.valid)
    return sorted(
        bytes(fb[7:7 + int(ln)])
        for fb, ln, ok in zip(np.asarray(res.frame_bytes),
                              np.asarray(res.length), v) if ok)


def test_estimate_frame_ppm_sign_and_magnitude():
    cfg = PhyConfig()
    enc = OracleEncoder(cfg)
    frame = Frame.new_data(0, 1, 2, bytes(range(100)))
    w = np.asarray(enc.encode_frame(frame), np.float32)
    body = w[cfg.preamble_len:]
    n_levels = len(body) // cfg.samples_per_level
    for true_ppm in (-400.0, 0.0, 400.0):
        skewed = np.asarray(clock_offset(jnp.asarray(w), true_ppm))
        est, wsum = estimate_frame_ppm(
            cfg, jnp.asarray(skewed[cfg.preamble_len:]), n_levels)
        est = float(est)
        # the estimate must (a) carry the sign that UNDOES the skew via
        # clock_offset(win, est) and (b) be within ~35% magnitude
        fixed = np.asarray(clock_offset(jnp.asarray(skewed), est))
        res = decode_capture(cfg, jnp.asarray(
            np.concatenate([fixed, np.zeros(200, np.float32)])), 2,
            max_frames=2)
        assert _payloads(res) == [frame.data], (true_ppm, est)
        if true_ppm:
            assert abs(est + true_ppm) < 0.35 * abs(true_ppm) + 40, \
                (true_ppm, est)


def test_gate_recovers_skewed_frame_plain_decode_misses():
    cfg = PhyConfig()
    enc = OracleEncoder(cfg)
    rng = np.random.default_rng(0)
    good = Frame.new_data(0, 1, 2, b"on-clock frame")
    bad = Frame.new_data(1, 1, 2, bytes(range(120)))
    wave = np.concatenate([
        np.zeros(500, np.float32),
        _skewed_frame(cfg, enc, good, 0.0, rng),
        np.zeros(700, np.float32),
        _skewed_frame(cfg, enc, bad, 400.0, rng),
        np.zeros(1200, np.float32)])
    exact, rec = decode_with_timing_gate(cfg, wave, 2)
    assert _payloads(exact) == [good.data]      # plain decode misses bad
    assert _payloads(rec) == [bad.data]         # the gate recovers it
    s = np.asarray(rec.start)[np.asarray(rec.valid)]
    assert abs(int(s[0]) - 500 - len(enc.encode_frame(good)) - 700) < 20


def test_gate_mixed_skews_beat_global_search():
    """Two transmitters, +400 and -400 ppm, in one capture: a single
    global resample ratio cannot satisfy both; per-frame gating can."""
    cfg = PhyConfig()
    enc = OracleEncoder(cfg)
    rng = np.random.default_rng(1)
    fa = Frame.new_data(0, 1, 2, bytes([0xAA]) * 100)
    fb = Frame.new_data(1, 1, 2, bytes([0xBB]) * 100)
    wave = np.concatenate([
        np.zeros(400, np.float32),
        _skewed_frame(cfg, enc, fa, 400.0, rng),
        np.zeros(900, np.float32),
        _skewed_frame(cfg, enc, fb, -400.0, rng),
        np.zeros(1200, np.float32)])

    glob, _ppm = decode_with_clock_search(
        cfg, wave, 2, ppm_grid=(-400.0, 0.0, 400.0), max_frames=8)
    assert len(_payloads(glob)) <= 1            # one ratio, one winner

    exact, rec = decode_with_timing_gate(cfg, wave, 2)
    got = _payloads(exact) + _payloads(rec)
    assert sorted(got) == sorted([fa.data, fb.data])


def test_gate_clean_capture_no_false_recoveries():
    cfg = PhyConfig()
    enc = OracleEncoder(cfg)
    rng = np.random.default_rng(2)
    frames = [Frame.new_data(i, 1, 2, bytes([i]) * 30) for i in range(4)]
    parts = []
    for f in frames:
        parts.append(_skewed_frame(cfg, enc, f, 0.0, rng))
        parts.append(np.zeros(400, np.float32))
    wave = np.concatenate(parts + [np.zeros(2000, np.float32)])
    exact, rec = decode_with_timing_gate(cfg, wave, 2)
    assert _payloads(exact) == sorted(f.data for f in frames)
    assert int(np.asarray(rec.valid).sum()) == 0


def test_gate_recovers_4b5b_skewed_frame():
    """The level-grating estimator is coding-agnostic: NRZI guarantees
    transitions often enough for the phase fit."""
    from trackmaker_tpu.core.config import FOUR_B_FIVE_B

    cfg = PhyConfig(line_coding=FOUR_B_FIVE_B)
    enc = OracleEncoder(cfg)
    rng = np.random.default_rng(3)
    bad = Frame.new_data(1, 1, 2, bytes(range(110)))
    # NOTE: 4B5B's adaptive level-average tracking tolerates ~+-500 ppm
    # natively (prev_level_avg carry, line_coding.rs:182-198) — the
    # gate extends the range, it doesn't create it
    wave = np.concatenate([
        np.zeros(600, np.float32),
        _skewed_frame(cfg, enc, bad, -600.0, rng),
        np.zeros(1500, np.float32)])
    exact, rec = decode_with_timing_gate(cfg, wave, 2)
    assert _payloads(exact) == []
    assert _payloads(rec) == [bad.data]
