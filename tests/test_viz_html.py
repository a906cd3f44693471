"""Interactive HTML dashboard (bench/viz_html.py): self-contained file,
correct embedded data, CLI wiring.  Parity: reference tools/sample.py
plotly dashboards (waveform/FFT/spectrogram/stats/3-D)."""

import base64
import json
import re

import numpy as np
import pytest

from trackmaker_tpu.bench import viz_html


def _payload(doc: str) -> dict:
    m = re.search(r"const D = (\{.*?\});\n", doc, re.S)
    assert m, "embedded payload not found"
    return json.loads(m.group(1))


def _f32(b64: str) -> np.ndarray:
    return np.frombuffer(base64.b64decode(b64), np.float32)


@pytest.fixture(scope="module")
def capture():
    sr = 48_000
    t = np.arange(sr)  # 1 s
    x = (0.5 * np.sin(2 * np.pi * 1000 * t / sr)
         + 0.1 * np.sin(2 * np.pi * 7000 * t / sr)).astype(np.float32)
    return x, sr


def test_dashboard_selfcontained(tmp_path, capture):
    out = viz_html.render_dashboard(capture, tmp_path / "dash.html",
                                    title="unit")
    doc = out.read_text()
    # no network dependency: no external scripts/links/imports
    assert "http://" not in doc and "https://" not in doc
    assert "<script src" not in doc
    d = _payload(doc)
    x, sr = capture
    assert d["sr"] == sr and d["n"] == len(x)
    # short capture embeds verbatim (stride 1)
    assert d["waveStride"] == 1
    np.testing.assert_array_equal(_f32(d["wave"]), x)
    # spectrum peaks where the tones are
    spec = _f32(d["spec"])
    freqs = np.arange(len(spec)) * d["hzPer"]
    top = freqs[np.argsort(spec)[-8:]]
    assert np.any(np.abs(top - 1000) < 2 * d["hzPer"])
    assert np.any(np.abs(top - 7000) < 2 * d["hzPer"])
    # spectrogram grid dims consistent
    sg = np.frombuffer(base64.b64decode(d["sgram"]), np.uint8)
    assert sg.size == d["sgF"] * d["sgT"]
    surf = _f32(d["surf"])
    assert surf.size == d["surfF"] * d["surfT"]
    assert d["stats"][0] == ["samples", str(len(x))]


def test_envelope_preserves_peaks(capture):
    x, _ = capture
    y = np.tile(x, 40)                       # 1.92M samples -> decimated
    y[777_777] = 9.0                         # an isolated spike
    env, stride = viz_html._envelope(y, viz_html._MAX_WAVE)
    assert len(env) <= viz_html._MAX_WAVE
    assert stride > 1
    assert env.max() == pytest.approx(9.0)   # spike survives decimation


def test_debug_trace_line_corr(tmp_path):
    """The correlation-debug trace marks the true preamble position."""
    from trackmaker_tpu.core.config import PhyConfig
    from trackmaker_tpu.core.framing import Frame
    from trackmaker_tpu.phy.encoder import PhyEncoder

    cfg = PhyConfig()
    enc = PhyEncoder(cfg).encode_frames(
        [Frame.new_data(1, 1, 2, b"hello dashboard")], gap_samples=500)
    wave = np.concatenate([np.zeros(500, np.float32), np.asarray(enc)])
    dbg = viz_html.correlation_debug(wave, 48_000, mode="line")
    (name, corr), = dbg.items()
    assert "corr" in name
    assert int(np.argmax(corr)) == 500       # gap before the preamble
    out = viz_html.render_dashboard((wave, 48_000), tmp_path / "d.html",
                                    debug=dbg)
    d = _payload(out.read_text())
    assert d["debug"][0]["name"] == name
    assert d["debug"][0]["n"] == len(corr)


def test_cli_viz_html(tmp_path, capture):
    from trackmaker_tpu.cli.main import main
    x, sr = capture
    from trackmaker_tpu.io.wav import write_wav
    wav = tmp_path / "c.wav"
    write_wav(wav, x, sr)
    out = tmp_path / "dash.html"
    with pytest.raises(SystemExit) as ei:
        main(["viz", str(wav), "--html", str(out)])
    assert ei.value.code == 0 and out.exists()
    assert "3-D time" in out.read_text()
