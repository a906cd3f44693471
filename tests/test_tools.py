"""Viz dashboards + bin/txt converter tests."""

import numpy as np

from trackmaker_tpu.bench.viz import plot_dashboard, spectrogram
from trackmaker_tpu.utils.bintxt import bits_to_text, text_to_bits


def test_bintxt_roundtrip():
    s = "Hello, Aether!"
    bits = text_to_bits(s)
    assert set(bits) <= {"0", "1"}
    assert bits_to_text(bits) == s.encode()


def test_spectrogram_shapes():
    x = np.sin(2 * np.pi * 1000 * np.arange(48000) / 48000).astype(
        np.float32)
    f, t, sdb = spectrogram(x, 48000)
    assert sdb.shape == (len(f), len(t))
    # 1 kHz tone should dominate near the 1 kHz bin
    peak_bin = np.argmax(sdb.mean(axis=1))
    assert abs(f[peak_bin] - 1000) < 100


def test_plot_dashboard_writes_png(tmp_path):
    x = np.random.default_rng(0).normal(0, 0.2, 10_000).astype(np.float32)
    out = plot_dashboard((x, 48000), tmp_path / "dash.png")
    assert out.exists() and out.stat().st_size > 10_000
