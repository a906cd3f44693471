"""BPSK/QPSK single-carrier modem with pilot-aided coherent demodulation.

The reference vendored fldigi's PSK modem as study material
(``assets/psk.cxx`` — never built); this is the native realization:
chirp-preamble sync (shared correlator), a known BPSK pilot word for
carrier phase/amplitude estimation, then coherent matched-filter
demodulation — everything batched: the per-symbol integrate-and-dump is
one reshape + matmul against the carrier quadratures.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from trackmaker_tpu.core import bitops
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.dsp.osc import chirp_cached


@dataclasses.dataclass(frozen=True)
class PskConfig:
    sample_rate: int = 48_000
    carrier_hz: float = 8_000.0
    samples_per_symbol: int = 24    # 2 kbaud
    bits_per_symbol: int = 1        # 1=BPSK, 2=QPSK
    pilot_symbols: int = 16         # known alternating pilot word
    preamble_len: int = 440
    chirp_lo_hz: float = 2_000.0
    chirp_hi_hz: float = 10_000.0
    guard_samples: int = 32
    sync_threshold: float = 0.5
    amplitude: float = 1.0

    @property
    def baud(self) -> float:
        return self.sample_rate / self.samples_per_symbol


def _pilot_bits(cfg: PskConfig) -> np.ndarray:
    return (np.arange(cfg.pilot_symbols * cfg.bits_per_symbol) % 2
            ).astype(np.uint8)


def _symbols_from_bits(cfg: PskConfig, bits: jax.Array) -> jax.Array:
    """bits -> complex constellation points."""
    if cfg.bits_per_symbol == 1:
        return (1.0 - 2.0 * bits.astype(jnp.float32)) + 0j  # 0->+1, 1->-1
    pairs = bits.reshape(*bits.shape[:-1], -1, 2).astype(jnp.float32)
    re = 1.0 - 2.0 * pairs[..., 0]
    im = 1.0 - 2.0 * pairs[..., 1]
    return (re + 1j * im) / np.sqrt(2.0)


def _bits_from_symbols(cfg: PskConfig, sym: jax.Array) -> jax.Array:
    if cfg.bits_per_symbol == 1:
        return (sym.real < 0).astype(jnp.uint8)
    b0 = (sym.real < 0).astype(jnp.uint8)
    b1 = (sym.imag < 0).astype(jnp.uint8)
    return jnp.stack([b0, b1], axis=-1).reshape(*sym.shape[:-1], -1)


def _quadratures(cfg: PskConfig, n_symbols: int) -> tuple[np.ndarray, ...]:
    n = n_symbols * cfg.samples_per_symbol
    t = np.arange(n, dtype=np.float64) / cfg.sample_rate
    c = np.cos(2 * np.pi * cfg.carrier_hz * t).astype(np.float32)
    s = np.sin(2 * np.pi * cfg.carrier_hz * t).astype(np.float32)
    return c, s


@functools.partial(jax.jit, static_argnums=(0, 2))
def modulate_bits(cfg: PskConfig, bits: jax.Array, n_bits: int) -> jax.Array:
    """uint8[B, n_bits] -> f32[B, frame_samples]; pilot ‖ data."""
    b = bits.shape[0]
    pilot = jnp.broadcast_to(
        jnp.asarray(_pilot_bits(cfg)), (b, _pilot_bits(cfg).shape[0]))
    all_bits = jnp.concatenate([pilot, bits.astype(jnp.uint8)], axis=-1)
    sym = _symbols_from_bits(cfg, all_bits)          # (B, S)
    n_sym = sym.shape[-1]
    cq, sq = _quadratures(cfg, n_sym)
    up = jnp.repeat(sym, cfg.samples_per_symbol, axis=-1)
    body = cfg.amplitude * (up.real * cq - up.imag * sq)
    pre = jnp.asarray(chirp_cached(
        cfg.preamble_len, cfg.chirp_lo_hz, cfg.chirp_hi_hz, cfg.sample_rate))
    pre = jnp.broadcast_to(pre, (b, cfg.preamble_len))
    guard = jnp.zeros((b, cfg.guard_samples), jnp.float32)
    return jnp.concatenate([pre, guard, body], axis=-1).astype(jnp.float32)


@functools.partial(jax.jit, static_argnums=(0, 2))
def demodulate_at(cfg: PskConfig, rx: jax.Array, n_bits: int,
                  starts: jax.Array) -> jax.Array:
    """Coherent demod at preamble starts -> uint8[B, n_bits].

    Per symbol: I/Q integrate-and-dump, then derotate by the complex
    channel estimate from the pilot word."""
    bps = cfg.bits_per_symbol
    n_data_sym = -(-n_bits // bps)
    n_sym = cfg.pilot_symbols + n_data_sym
    total = n_sym * cfg.samples_per_symbol
    off = cfg.preamble_len + cfg.guard_samples
    pad = jnp.concatenate(
        [rx.astype(jnp.float32), jnp.zeros(total + off + 8, jnp.float32)])
    cq, sq = _quadratures(cfg, n_sym)
    spb = cfg.samples_per_symbol

    pilot_sym = _symbols_from_bits(
        cfg, jnp.asarray(_pilot_bits(cfg)))       # (P,)

    def one(start):
        seg = jax.lax.dynamic_slice(pad, (start + off,), (total,))
        i_arm = (seg * cq).reshape(n_sym, spb).sum(axis=-1)
        q_arm = (-seg * sq).reshape(n_sym, spb).sum(axis=-1)
        z = i_arm + 1j * q_arm                    # (S,) received symbols
        h = jnp.mean(z[: cfg.pilot_symbols] * jnp.conj(pilot_sym))
        h = jnp.where(jnp.abs(h) < 1e-12, 1.0 + 0j, h)
        eq = z[cfg.pilot_symbols:] * jnp.conj(h)
        bits = _bits_from_symbols(cfg, eq)
        return bits[:n_bits]

    return jax.vmap(one)(jnp.asarray(starts, jnp.int32))


class PskModem:
    """Frame facade matching OfdmModem/FskModem."""

    def __init__(self, cfg: PskConfig = PskConfig()):
        self.cfg = cfg

    def encode_frames(self, frames: list[Frame],
                      gap_samples: int = 256) -> np.ndarray:
        assert frames
        lens = {len(f.to_bytes()) for f in frames}
        assert len(lens) == 1, "group equal-length frames"
        bits = np.stack(
            [bitops.bytes_to_bits_host(f.to_bytes()) for f in frames])
        waves = np.asarray(modulate_bits(
            self.cfg, jnp.asarray(bits), bits.shape[-1]))
        parts = []
        for i, w in enumerate(waves):
            parts.append(w)
            if i < len(waves) - 1:
                parts.append(np.zeros(gap_samples, np.float32))
        return np.concatenate(parts)

    def decode(self, rx: np.ndarray, frame_bytes_len: int,
               max_frames: int = 64) -> list[Frame]:
        from trackmaker_tpu.phy.ofdm import OfdmConfig, find_preambles
        sync_cfg = OfdmConfig(
            preamble_len=self.cfg.preamble_len,
            chirp_lo_hz=self.cfg.chirp_lo_hz,
            chirp_hi_hz=self.cfg.chirp_hi_hz,
            sync_threshold=self.cfg.sync_threshold)
        starts = np.asarray(find_preambles(
            sync_cfg, jnp.asarray(rx), max_frames))
        starts = starts[starts >= 0]
        if len(starts) == 0:
            return []
        bits = np.asarray(demodulate_at(
            self.cfg, jnp.asarray(rx), frame_bytes_len * 8,
            jnp.asarray(starts)))
        out = []
        for row in bits:
            f = Frame.from_bits(row)
            if f is not None:
                out.append(f)
        return out
