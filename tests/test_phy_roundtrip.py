"""End-to-end PHY round trip + differential tests vs. the NumPy oracle.

This is the reference's canonical regression check ("test_transmission",
src/main.rs:480-589): bytes -> frames -> waveform -> decode -> bytes must be
exact, plus our decoder must match the oracle transliteration of the Rust
decoder decision-for-decision.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from trackmaker_tpu.core.config import PhyConfig
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.oracle.phy import OracleDecoder, OracleEncoder
from trackmaker_tpu.phy.decoder import decode_capture
from trackmaker_tpu.phy.encoder import PhyEncoder

CODINGS = ["manchester", "4b5b"]


def make_frames(payloads, src=1, dst=2):
    return [Frame.new_data(i, src, dst, p) for i, p in enumerate(payloads)]


@pytest.mark.parametrize("coding", CODINGS)
def test_encoder_matches_oracle(coding):
    cfg = PhyConfig(line_coding=coding)
    frames = make_frames([b"hello world", b"x" * 128, b"a"])
    got = PhyEncoder(cfg).encode_frames(frames)
    want = OracleEncoder(cfg).encode_frames(frames)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("coding", CODINGS)
def test_loopback_roundtrip(coding):
    cfg = PhyConfig(line_coding=coding)
    text = (b"The quick brown fox jumps over the lazy dog. " * 12)
    chunks = [text[i:i + 64] for i in range(0, len(text), 64)]
    frames = make_frames(chunks)
    wave = PhyEncoder(cfg).encode_frames(frames)
    res = decode_capture(cfg, jnp.asarray(wave), 2, max_frames=16)
    decoded = res.to_frames()
    assert len(decoded) == len(frames)
    assert b"".join(f.data for f in decoded) == text
    assert [f.sequence for f in decoded] == list(range(len(frames)))


@pytest.mark.parametrize("coding", CODINGS)
def test_decoder_matches_oracle_with_noise(coding):
    cfg = PhyConfig(line_coding=coding)
    rng = np.random.default_rng(42)
    payloads = [rng.integers(0, 256, rng.integers(1, 129),
                             dtype=np.uint8).tobytes() for _ in range(8)]
    frames = make_frames(payloads)
    wave = OracleEncoder(cfg).encode_frames(frames, gap_samples=200)
    wave = np.concatenate([np.zeros(777, np.float32), wave,
                           np.zeros(333, np.float32)])
    noisy = wave + rng.normal(0, 0.05, len(wave)).astype(np.float32)

    oracle = OracleDecoder(cfg, local_addr=2)
    want = oracle.process_samples(noisy)

    res = decode_capture(cfg, jnp.asarray(noisy), 2, max_frames=16)
    got = res.to_frames()

    assert [f.data for f in got] == [f.data for f in want]
    assert [f.sequence for f in got] == [f.sequence for f in want]


@pytest.mark.parametrize("coding", CODINGS)
def test_decoder_dst_filter(coding):
    cfg = PhyConfig(line_coding=coding)
    frames = [Frame.new_data(0, 1, 2, b"for-node-2"),
              Frame.new_data(1, 1, 3, b"for-node-3"),
              Frame.new_data(2, 1, 2, b"also-node-2")]
    wave = PhyEncoder(cfg).encode_frames(frames)
    res = decode_capture(cfg, jnp.asarray(wave), 2, max_frames=8)
    got = res.to_frames()
    assert [f.data for f in got] == [b"for-node-2", b"also-node-2"]


def test_decoder_rejects_corrupted_payload():
    cfg = PhyConfig()
    frames = make_frames([b"AAAA" * 8, b"BBBB" * 8])
    enc = PhyEncoder(cfg)
    wave = enc.encode_frames(frames)
    # flip samples in the middle of frame 0's payload hard enough to
    # flip a bit: frame 0 region starts after preamble
    start = enc.preamble_len + cfg.header_samples + 100
    wave = wave.copy()
    wave[start:start + cfg.samples_per_level * 2] *= -1.0
    res = decode_capture(cfg, jnp.asarray(wave), 2, max_frames=8)
    got = res.to_frames()
    # frame 0 dropped by CRC, frame 1 still decoded
    assert [f.sequence for f in got] == [1]
    assert got[0].data == b"BBBB" * 8


def test_decoder_streaming_facade_chunked():
    from trackmaker_tpu.phy.decoder import PhyDecoder
    cfg = PhyConfig()
    frames = make_frames([b"stream-me-%d" % i for i in range(4)])
    wave = PhyEncoder(cfg).encode_frames(frames, gap_samples=500)
    dec = PhyDecoder(cfg, local_addr=2)
    got = []
    for i in range(0, len(wave), 2048):
        got.extend(dec.process_samples(wave[i:i + 2048]))
    assert [f.data for f in got] == [f.data for f in frames]


def test_batched_vmap_decode():
    import jax
    cfg = PhyConfig()
    enc = PhyEncoder(cfg)
    batch = []
    for b in range(4):
        frames = make_frames([bytes([65 + b]) * 32, bytes([97 + b]) * 16])
        batch.append(enc.encode_frames(frames, gap_samples=120))
    tmax = max(len(w) for w in batch)
    stacked = np.stack([np.pad(w, (0, tmax - len(w))) for w in batch])
    fn = jax.vmap(lambda s: decode_capture(cfg, s, 2, max_frames=4))
    res = fn(jnp.asarray(stacked))
    assert np.asarray(res.count).tolist() == [2, 2, 2, 2]
    fb = np.asarray(res.frame_bytes)
    for b in range(4):
        assert fb[b, 0, 7:7 + 32].tobytes() == bytes([65 + b]) * 32
        assert fb[b, 1, 7:7 + 16].tobytes() == bytes([97 + b]) * 16
