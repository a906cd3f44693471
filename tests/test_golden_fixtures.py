"""Golden waveform fixtures: freeze today's encoder output so future
changes that would alter on-air waveforms (and break interop with
already-recorded captures) fail loudly.  Fixtures are generated once
into assets/fixtures/ and committed."""

import pathlib

import numpy as np
import jax.numpy as jnp
import pytest

from trackmaker_tpu.core.config import PhyConfig
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.io import read_wav, write_wav
from trackmaker_tpu.phy.decoder import decode_capture
from trackmaker_tpu.phy.encoder import PhyEncoder

FIXDIR = pathlib.Path(__file__).resolve().parents[1] / "assets" / "fixtures"

PAYLOADS = [b"golden fixture frame zero!", b"\x00\x01\x02" * 20, b"Z" * 128]


def _frames():
    return [Frame.new_data(i, 1, 2, p) for i, p in enumerate(PAYLOADS)]


def _fixture_path(coding: str) -> pathlib.Path:
    return FIXDIR / f"golden_{coding}.wav"


@pytest.mark.parametrize("coding", ["manchester", "4b5b"])
def test_encoder_output_matches_golden_wav(coding):
    cfg = PhyConfig(line_coding=coding)
    wave = PhyEncoder(cfg).encode_frames(_frames(), gap_samples=120)
    path = _fixture_path(coding)
    if not path.exists():  # first run: create and commit
        write_wav(path, wave)
        pytest.skip(f"created golden fixture {path}")
    golden, sr = read_wav(path)
    assert sr == cfg.sample_rate
    # 16-bit quantization tolerance
    np.testing.assert_allclose(golden[0], wave, atol=1e-4)


@pytest.mark.parametrize("coding", ["manchester", "4b5b"])
def test_decoder_reads_golden_wav(coding):
    path = _fixture_path(coding)
    if not path.exists():
        pytest.skip("fixture not generated yet")
    cfg = PhyConfig(line_coding=coding)
    capture, _sr = read_wav(path)
    res = decode_capture(cfg, jnp.asarray(capture[0]), 2, max_frames=8)
    got = res.to_frames()
    assert [f.data for f in got] == PAYLOADS


def test_promiscuous_mode_accepts_foreign_dst():
    cfg = PhyConfig()
    frames = [Frame.new_data(0, 1, 9, b"not for addr 2")]
    wave = PhyEncoder(cfg).encode_frames(frames)
    normal = decode_capture(cfg, jnp.asarray(wave), 2, max_frames=4)
    assert int(normal.count) == 0
    promisc = decode_capture(cfg, jnp.asarray(wave), -1, max_frames=4)
    got = promisc.to_frames()
    assert len(got) == 1 and got[0].dst == 9
