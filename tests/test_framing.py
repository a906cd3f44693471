"""Frame codec tests (host + batched JAX paths)."""

import numpy as np
import jax.numpy as jnp

from trackmaker_tpu.core import bitops, framing
from trackmaker_tpu.core.config import FRAME_TYPE_ACK, FRAME_TYPE_DATA


def test_host_frame_roundtrip():
    f = framing.Frame.new_data(7, 1, 2, b"\x12\x34\x56")
    raw = f.to_bytes()
    assert raw[:2] == bytes([0, 3])
    assert raw[3] == FRAME_TYPE_DATA
    g = framing.Frame.from_bytes(raw)
    assert g is not None
    assert (g.frame_type, g.sequence, g.src, g.dst, g.data) == (
        FRAME_TYPE_DATA, 7, 1, 2, b"\x12\x34\x56")


def test_host_frame_crc_rejects_corruption():
    raw = bytearray(framing.Frame.new_data(1, 1, 2, b"payload").to_bytes())
    raw[-1] ^= 0xFF
    assert framing.Frame.from_bytes(bytes(raw)) is None


def test_host_frame_bad_type_rejected():
    raw = bytearray(framing.Frame.new_ack(1, 1, 2).to_bytes())
    raw[3] = 0x7F
    assert framing.Frame.from_bytes(bytes(raw)) is None


def test_batched_build_matches_host():
    payloads = [b"hello", b"", b"x" * 32]
    types = [FRAME_TYPE_DATA, FRAME_TYPE_ACK, FRAME_TYPE_DATA]
    max_len = 32
    pad = np.zeros((3, max_len), dtype=np.uint8)
    for i, p in enumerate(payloads):
        pad[i, : len(p)] = np.frombuffer(p, dtype=np.uint8)
    out = framing.build_frame_bytes(
        jnp.asarray(pad),
        jnp.asarray([len(p) for p in payloads]),
        jnp.asarray(types),
        jnp.asarray([3, 4, 5]),
        jnp.asarray([1, 2, 3]),
        jnp.asarray([9, 8, 7]),
    )
    out = np.asarray(out)
    for i, p in enumerate(payloads):
        want = framing.Frame(types[i], 3 + i, 1 + i, 9 - i, p).to_bytes()
        assert out[i, : len(want)].tobytes() == want


def test_batched_verify_crc():
    pad = np.zeros((2, 16), dtype=np.uint8)
    pad[0, :5] = np.frombuffer(b"hello", dtype=np.uint8)
    frames = framing.build_frame_bytes(
        jnp.asarray(pad), jnp.asarray([5, 0]),
        jnp.asarray([FRAME_TYPE_DATA, FRAME_TYPE_ACK]),
        jnp.asarray([0, 1]), jnp.asarray([1, 1]), jnp.asarray([2, 2]))
    hdr = framing.verify_frames(frames)
    assert np.asarray(hdr["crc_ok"]).all()
    assert np.asarray(hdr["length"]).tolist() == [5, 0]
    # corrupt a payload byte -> crc fails for that row only
    corrupted = np.asarray(frames).copy()
    corrupted[0, 7] ^= 0x01
    hdr2 = framing.verify_frames(jnp.asarray(corrupted))
    assert np.asarray(hdr2["crc_ok"]).tolist() == [False, True]
