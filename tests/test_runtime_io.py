"""Native runtime (C++) and IO tests."""

import pathlib

import numpy as np
import pytest

from trackmaker_tpu import runtime
from trackmaker_tpu.core import bitops
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.io import (AudioData, dump_to_json, dump_to_wav,
                               load_json, read_wav, write_wav, load_audio)

SAMPLE_FLAC = pathlib.Path("/root/reference/assets/sample.flac")


def test_native_crc8_matches_python():
    rng = np.random.default_rng(0)
    for n in [0, 1, 17, 256]:
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert runtime.crc8(data) == bitops.crc8_host(data)


def test_native_channel_busy():
    assert runtime.channel_busy(np.zeros(10, np.float32)) is None
    assert runtime.channel_busy(np.zeros(64, np.float32)) is False
    x = np.zeros(64, np.float32)
    x[5] = 0.7
    assert runtime.channel_busy(x) is True


def test_native_frame_codec_matches_python():
    f = Frame.new_data(9, 1, 2, b"native framing")
    raw = runtime.frame_serialize(f.frame_type, f.sequence, f.src, f.dst,
                                  f.data)
    assert raw == f.to_bytes()
    parsed = runtime.frame_parse(raw)
    assert parsed == (f.frame_type, f.sequence, f.src, f.dst, f.data)
    bad = bytearray(raw)
    bad[-1] ^= 1
    assert runtime.frame_parse(bytes(bad)) is None


def test_ring_buffer_spsc():
    ring = runtime.RingBuffer(1024)
    data = np.arange(300, dtype=np.float32)
    assert ring.push(data) == 300
    assert len(ring) == 300
    out = ring.pop(100)
    assert np.array_equal(out, data[:100])
    assert len(ring) == 200
    out = ring.pop(500)
    assert np.array_equal(out, data[100:])


def test_ring_buffer_full():
    ring = runtime.RingBuffer(128)  # rounds to 128
    wrote = ring.push(np.ones(200, np.float32))
    assert wrote == 128
    assert len(ring) == 128


def test_active_regions():
    x = np.zeros(10_000, np.float32)
    x[2000:2100] = 0.5
    x[7000:7050] = -0.8
    regions = runtime.active_regions(x, threshold=0.1, hang=256, halo=64)
    assert regions.shape == (2, 2)
    assert regions[0][0] <= 2000 <= regions[0][1]
    assert regions[1][0] <= 7000 <= regions[1][1]


@pytest.mark.skipif(not SAMPLE_FLAC.exists(),
                    reason="reference sample.flac not mounted")
def test_flac_decoder_md5_oracle():
    """STREAMINFO carries the MD5 of the unencoded PCM: a self-contained
    bit-exactness oracle for the from-scratch decoder."""
    data = SAMPLE_FLAC.read_bytes()
    info = runtime.flac_info(data)
    assert info["sample_rate"] == 48_000 and info["channels"] == 2
    assert runtime.flac_md5_check(data)


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    x = np.clip(rng.normal(0, 0.3, 4800), -1, 1).astype(np.float32)
    p = tmp_path / "t.wav"
    write_wav(p, x, 48_000)
    y, sr = read_wav(p)
    assert sr == 48_000
    assert y.shape == (1, 4800)
    np.testing.assert_allclose(y[0], x, atol=1e-4)


def test_dump_json_roundtrip(tmp_path):
    a = AudioData(48_000, np.asarray([0.1, -0.2, 0.3], np.float32))
    p = tmp_path / "a.json"
    dump_to_json(p, a)
    b = load_json(p)
    assert b.sample_rate == 48_000
    np.testing.assert_allclose(b.audio_data, a.audio_data)
    dump_to_wav(tmp_path / "a.wav", a)


@pytest.mark.skipif(not SAMPLE_FLAC.exists(),
                    reason="reference sample.flac not mounted")
def test_load_audio_flac_mono():
    x, sr = load_audio(SAMPLE_FLAC)
    assert sr == 48_000
    assert x.ndim == 1 and len(x) == 720_000
    assert np.abs(x).max() <= 1.0
