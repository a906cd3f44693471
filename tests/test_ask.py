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
