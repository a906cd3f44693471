"""Golden waveform fixtures for the modem family (ASK, OFDM v1/v2,
PSK, FSK): freeze today's modulator output so changes that would alter
on-air waveforms — breaking interop with already-recorded captures —
fail loudly.  Same scheme as tests/test_golden_fixtures.py for the
line-coded PHY; fixtures generate once into assets/fixtures/ and are
committed (ROADMAP 'Testing': waveform definitions declared stable in
round 2)."""

import pathlib

import numpy as np
import jax.numpy as jnp
import pytest

from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.io import read_wav, write_wav

FIXDIR = pathlib.Path(__file__).resolve().parents[1] / "assets" / "fixtures"


def _check_or_create(name: str, wave: np.ndarray, sample_rate: int = 48000):
    path = FIXDIR / f"golden_{name}.wav"
    if not path.exists():
        write_wav(path, wave)
        pytest.skip(f"created golden fixture {path}")
    golden, sr = read_wav(path)
    assert sr == sample_rate
    np.testing.assert_allclose(golden[0], wave, atol=1e-4)
    return golden[0]


def test_ask_waveform_golden_and_decodes():
    from trackmaker_tpu.phy import ask

    cfg = ask.AskConfig()
    frames = ask.build_frames(b"golden ask fixture", cfg, num_frames=6)
    wave = ask.build_track(cfg, frames, seed=11)
    got = _check_or_create("ask", np.asarray(wave, np.float32))
    res = ask.demodulate(cfg, jnp.asarray(got), max_frames=8)
    ok = np.asarray(res.valid)
    assert int(ok.sum()) == 6
    assert np.array_equal(np.asarray(res.bits)[ok], frames[:, 8:])


def test_ofdm_v1_waveform_golden_and_decodes():
    from trackmaker_tpu.phy.ofdm import OfdmModem

    payloads = [bytes([i]) * 24 for i in range(4)]
    frames = [Frame.new_data(i, 1, 2, p) for i, p in enumerate(payloads)]
    modem = OfdmModem()
    wave = modem.encode_frames(frames, gap_samples=300)
    got = _check_or_create("ofdm_v1", np.asarray(wave, np.float32))
    out = modem.decode(got, 7 + 24, max_frames=6)
    assert [f.data for f in out] == payloads


def test_ofdm_v2_waveform_golden_and_decodes():
    from trackmaker_tpu.phy.ofdm_v2 import OfdmStreamPhyV2

    payloads = [b"ofdm v2 golden zero....", b"\x10\x20\x30" * 8]
    frames = [Frame.new_data(i, 1, 2, p) for i, p in enumerate(payloads)]
    phy = OfdmStreamPhyV2(local_addr=2)
    wave = phy.encode_frames(frames, gap_samples=300)
    got = _check_or_create("ofdm_v2", np.asarray(wave, np.float32))
    out = phy.process_samples(
        np.concatenate([got, np.zeros(1500, np.float32)]))
    assert [f.data for f in out] == payloads


def test_psk_waveform_golden_and_decodes():
    from trackmaker_tpu.phy import psk

    cfg = psk.PskConfig()
    payloads = [b"psk golden frame", b"\xaa\x55" * 8]
    frames = [Frame.new_data(i, 1, 2, p) for i, p in enumerate(payloads)]
    modem = psk.PskModem(cfg)
    wave = modem.encode_frames(frames, gap_samples=300)
    got = _check_or_create("psk", np.asarray(wave, np.float32))
    out = modem.decode(got, 7 + 16, max_frames=4)
    assert [f.data for f in out] == payloads


def test_fsk_waveform_golden_and_decodes():
    from trackmaker_tpu.phy import fsk

    cfg = fsk.FskConfig()
    payloads = [b"fsk golden frame", b"\x0f\xf0" * 8]
    frames = [Frame.new_data(i, 1, 2, p) for i, p in enumerate(payloads)]
    modem = fsk.FskModem(cfg)
    wave = modem.encode_frames(frames, gap_samples=300)
    got = _check_or_create("fsk", np.asarray(wave, np.float32))
    out = modem.decode(got, 7 + 16, max_frames=4)
    assert [f.data for f in out] == payloads
