"""ASK/chirp modem tests (BASELINE config 1, examples/ask.rs path)."""

import numpy as np
import jax.numpy as jnp
import pytest

from trackmaker_tpu.dsp.osc import chirp_np
from trackmaker_tpu.oracle import ask as oask
from trackmaker_tpu.phy import ask

TEXT = open("assets/think-different.txt", "rb").read()


def test_chirp_preamble_shape_and_symmetry():
    pre = chirp_np(440, 2000.0, 10000.0, 48000)
    assert pre.shape == (440,)
    assert pre[0] == 0.0
    assert np.abs(pre).max() <= 1.0 + 1e-6


def test_build_frames_matches_oracle():
    got = ask.build_frames(TEXT)
    want = oask.build_frames(TEXT)
    assert np.array_equal(got, want)


def test_modulate_matches_oracle():
    frames = ask.build_frames(TEXT, num_frames=5)
    gaps = np.asarray([[3, 7], [0, 0], [50, 99], [1, 2], [20, 30]])
    got = ask.build_track(ask.AskConfig(), frames[:5], gaps=gaps)
    want = oask.modulate(frames[:5], gaps=gaps)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("num_frames", [5, 20])
def test_demodulate_matches_oracle(num_frames):
    frames = ask.build_frames(TEXT, num_frames=num_frames)
    rng = np.random.default_rng(7)
    gaps = rng.integers(0, 100, size=(num_frames, 2))
    track = oask.modulate(frames, gaps=gaps)
    want = oask.demodulate(track)

    got = ask.demodulate(ask.AskConfig(), jnp.asarray(track),
                         max_frames=num_frames + 4)
    valid = np.asarray(got.valid)
    ids = np.asarray(got.frame_id)[valid]
    bits = np.asarray(got.bits)[valid]

    assert ids.tolist() == [fid for fid, _ in want]
    for row, (_, wbits) in zip(bits, want):
        assert np.array_equal(row, wbits)


def test_full_loopback_text_roundtrip():
    """The reference's test mode check (ask.rs:526-858): 100 frames of
    think-different.txt, random gaps, decode back; prefix must match."""
    frames = ask.build_frames(TEXT, num_frames=100)
    track = ask.build_track(ask.AskConfig(), frames, seed=1)
    got = ask.demodulate(ask.AskConfig(), jnp.asarray(track), max_frames=110)
    assert int(got.count) == 100
    text = ask.assemble_text(got)
    # 100 frames x 92 bits = 9200 bits -> 1150 bytes, text wraps
    assert text[: len(TEXT)] == TEXT
    assert len(text) == 1150


def test_demodulate_noise_robustness():
    frames = ask.build_frames(TEXT, num_frames=10)
    track = ask.build_track(ask.AskConfig(), frames, seed=3)
    rng = np.random.default_rng(0)
    noisy = track + rng.normal(0, 0.02, len(track)).astype(np.float32)
    want = oask.demodulate(noisy)
    got = ask.demodulate(ask.AskConfig(), jnp.asarray(noisy), max_frames=16)
    valid = np.asarray(got.valid)
    assert np.asarray(got.frame_id)[valid].tolist() == [f for f, _ in want]


@pytest.mark.parametrize("kw", [
    {},                                       # default: no edge truncation
    {"bit_lo": 2},                            # smooth window clips at start
    {"bit_hi": 42, "smooth_half": 7},         # clips at end + row spill
])
def test_demod_weight_matrix_matches_explicit_smooth(kw):
    """The fused demod weight matrix (ask._demod_weights_np) must equal
    the explicit pipeline it folds: 11-tap edge-truncated box smooth
    (ask.rs:418-432) then per-bit integration over smooth[bit_lo..bit_hi)
    (ask.rs:433-443) — including the edge-count truncation cases."""
    cfg = ask.AskConfig(**kw)
    rng = np.random.default_rng(11)
    prod = rng.normal(0, 1, cfg.frame_samples)

    # explicit float64 reference
    n, h = cfg.frame_samples, cfg.smooth_half
    smooth = np.empty(n)
    for j in range(n):
        j0, j1 = max(0, j - h), min(n, j + h + 1)
        smooth[j] = prod[j0:j1].sum() / (j1 - j0)
    want = np.empty(cfg.coded_bits)
    for i in range(cfg.coded_bits):
        lo = cfg.bit_lo + i * cfg.samples_per_bit
        want[i] = smooth[lo: lo + cfg.bit_hi - cfg.bit_lo].sum()

    got = prod.astype(np.float32) @ ask._demod_weights_np(cfg)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
