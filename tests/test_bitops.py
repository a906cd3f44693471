"""Core bit ops + CRC8 tests (mirrors reference src/phy/crc.rs:77-109)."""

import numpy as np
import jax.numpy as jnp

from trackmaker_tpu.core import bitops


def crc8_scalar(data: bytes) -> int:
    """Direct transliteration of the reference bitwise CRC (oracle)."""
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def test_crc8_host_matches_bitwise_reference():
    rng = np.random.default_rng(0)
    for n in [0, 1, 5, 13, 128, 300]:
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert bitops.crc8_host(data) == crc8_scalar(data)


def test_crc8_hello_world_roundtrip():
    data = b"Hello, World!"
    crc = bitops.crc8_host(data)
    assert crc == crc8_scalar(data)
    assert bitops.crc8_host(b"hello, World!") != crc


def test_crc8_jax_matches_host_batched():
    rng = np.random.default_rng(1)
    batch = rng.integers(0, 256, (16, 64), dtype=np.uint8)
    lengths = rng.integers(0, 65, 16)
    got = np.asarray(bitops.crc8(jnp.asarray(batch), jnp.asarray(lengths)))
    want = [bitops.crc8_host(batch[i, : lengths[i]].tobytes()) for i in range(16)]
    assert got.tolist() == want


def test_bit_conversion_msb_first():
    bits = np.asarray(bitops.unpack_bits(jnp.asarray([0b10110011], dtype=jnp.uint8)))
    assert bits.tolist() == [1, 0, 1, 1, 0, 0, 1, 1]
    byte = np.asarray(bitops.pack_bits(jnp.asarray(bits)))
    assert byte.tolist() == [0b10110011]


def test_bytes_bits_roundtrip():
    data = np.asarray([0xAB, 0xCD, 0xEF], dtype=np.uint8)
    bits = bitops.unpack_bits(jnp.asarray(data))
    assert bits.shape == (24,)
    back = np.asarray(bitops.pack_bits(bits))
    assert back.tolist() == data.tolist()
    # host versions agree with jax versions
    assert bitops.bytes_to_bits_host(data).tolist() == np.asarray(bits).tolist()
    assert bitops.bits_to_bytes_host(np.asarray(bits)).tolist() == data.tolist()
