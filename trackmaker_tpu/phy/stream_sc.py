"""Streaming MAC duck types for the single-carrier modems (FSK, PSK).

Completes the framework's modem story: EVERY waveform family —
line-coded (Manchester/4B5B, plain or Viterbi-coded), OFDM (v1/v2/
adaptive), and now FSK and PSK — exposes the same four-method stream
interface (``encode_frames`` / ``process_samples`` / ``reset`` /
``frame_samples``), so CSMA / Stop-and-Wait / Go-Back-N /
Selective-Repeat and the whole NET stack run over any of them
unchanged (the duck type established by
:class:`trackmaker_tpu.phy.ofdm.OfdmStreamPhy`).

Decode structure (same shape as OfdmStreamPhy.process_samples,
ofdm.py:295-341): buffer-and-bucket, chirp-correlate for preamble
starts, speculatively demodulate a max-size frame at each start, then
keep exactly ``(7+len)*8`` header-declared bits — pad-and-mask, one
pass, no data-dependent shapes under jit.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from trackmaker_tpu.core.framing import PHY_HEADER_BYTES, Frame

_MAX_BUF_S = 10  # seconds of quiet buffer before trimming


class _SingleCarrierStreamPhy:
    """Shared streaming skeleton over a (modulate, demodulate_at) pair."""

    def __init__(self, cfg, max_frame_bytes: int = 263,
                 local_addr: int | None = None):
        self.cfg = cfg
        self.max_frame_bytes = max_frame_bytes
        self.local_addr = local_addr
        self.preamble_len = cfg.preamble_len
        self._buf = np.zeros(0, np.float32)

    # -- subclass hooks ----------------------------------------------------

    def _modulate(self, bits: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def _demodulate_at(self, pj, n_bits: int, start: int) -> np.ndarray:
        raise NotImplementedError

    def _samples_for_bits(self, n_bits: int) -> int:
        """Body samples for n_bits (excluding preamble+guard)."""
        raise NotImplementedError

    # -- encoder side ------------------------------------------------------

    def frame_samples(self, n_payload: int) -> int:
        n_bits = (PHY_HEADER_BYTES + n_payload) * 8
        return (self.cfg.preamble_len + self.cfg.guard_samples
                + self._samples_for_bits(n_bits))

    def encode_frame(self, frame: Frame) -> np.ndarray:
        from trackmaker_tpu.core import bitops
        bits = bitops.bytes_to_bits_host(frame.to_bytes())
        return self._modulate(bits)

    def encode_frames(self, frames: list[Frame],
                      gap_samples: int = 256) -> np.ndarray:
        parts = []
        for i, f in enumerate(frames):
            parts.append(self.encode_frame(f))
            if i < len(frames) - 1:
                parts.append(np.zeros(gap_samples, np.float32))
        return np.concatenate(parts) if parts else np.zeros(0, np.float32)

    # -- streaming decoder side --------------------------------------------

    def reset(self) -> None:
        self._buf = np.zeros(0, np.float32)

    def _find_starts(self, pj) -> np.ndarray:
        from trackmaker_tpu.phy.ofdm import OfdmConfig, find_preambles
        sync_cfg = OfdmConfig(
            preamble_len=self.cfg.preamble_len,
            chirp_lo_hz=self.cfg.chirp_lo_hz,
            chirp_hi_hz=self.cfg.chirp_hi_hz,
            sync_threshold=self.cfg.sync_threshold)
        starts = np.asarray(find_preambles(sync_cfg, pj, 16))
        return starts[starts >= 0]

    def process_samples(self, samples: np.ndarray) -> list[Frame]:
        self._buf = np.concatenate(
            [self._buf, np.asarray(samples, np.float32)])
        cfg = self.cfg
        if len(self._buf) < cfg.preamble_len + 1:
            return []
        out: list[Frame] = []
        consumed = 0
        bucket = 4096
        while bucket < len(self._buf):
            bucket *= 2
        padded = np.zeros(bucket, np.float32)
        padded[: len(self._buf)] = self._buf
        pj = jnp.asarray(padded)
        max_bits = self.max_frame_bytes * 8
        body_off = cfg.preamble_len + cfg.guard_samples
        for s in self._find_starts(pj):
            s = int(s)
            if s < consumed:
                continue
            if s + body_off + self._samples_for_bits(56) > len(self._buf):
                break  # header still arriving
            bits = self._demodulate_at(pj, max_bits, s)
            hdr = np.packbits(bits[:56])
            data_len = (int(hdr[0]) << 8) | int(hdr[1])
            if data_len > self.max_frame_bytes - PHY_HEADER_BYTES:
                consumed = s + cfg.preamble_len
                continue
            total_bits = (PHY_HEADER_BYTES + data_len) * 8
            frame_end = s + body_off + self._samples_for_bits(total_bits)
            if frame_end > len(self._buf):
                break  # wait for the rest of this frame
            f = Frame.from_bits(bits[:total_bits])
            consumed = frame_end
            if f is None:
                continue
            if self.local_addr is not None and f.dst != self.local_addr:
                continue
            out.append(f)
        if consumed:
            keep = max(consumed - (cfg.preamble_len - 1), 0)
            self._buf = self._buf[keep:]
        elif len(self._buf) > _MAX_BUF_S * cfg.sample_rate:
            self._buf = self._buf[-cfg.preamble_len:]
        return out


class FskStreamPhy(_SingleCarrierStreamPhy):
    """Noncoherent binary-FSK MAC stream PHY (phy/fsk.py waveform)."""

    def __init__(self, cfg=None, max_frame_bytes: int = 263,
                 local_addr: int | None = None):
        from trackmaker_tpu.phy.fsk import FskConfig
        super().__init__(cfg or FskConfig(), max_frame_bytes, local_addr)

    def _modulate(self, bits):
        from trackmaker_tpu.phy.fsk import modulate_bits
        return np.asarray(modulate_bits(self.cfg, jnp.asarray(bits[None])))[0]

    def _demodulate_at(self, pj, n_bits, start):
        from trackmaker_tpu.phy.fsk import demodulate_at
        return np.asarray(demodulate_at(
            self.cfg, pj, n_bits, jnp.asarray([start])))[0]

    def _samples_for_bits(self, n_bits):
        return n_bits * self.cfg.samples_per_bit


class PskStreamPhy(_SingleCarrierStreamPhy):
    """Pilot-aided coherent BPSK/QPSK MAC stream PHY (phy/psk.py)."""

    def __init__(self, cfg=None, max_frame_bytes: int = 263,
                 local_addr: int | None = None):
        from trackmaker_tpu.phy.psk import PskConfig
        super().__init__(cfg or PskConfig(), max_frame_bytes, local_addr)

    def _modulate(self, bits):
        from trackmaker_tpu.phy.psk import modulate_bits
        return np.asarray(modulate_bits(
            self.cfg, jnp.asarray(bits[None]), bits.shape[-1]))[0]

    def _demodulate_at(self, pj, n_bits, start):
        from trackmaker_tpu.phy.psk import demodulate_at
        return np.asarray(demodulate_at(
            self.cfg, pj, n_bits, jnp.asarray([start])))[0]

    def _samples_for_bits(self, n_bits):
        bps = self.cfg.bits_per_symbol
        n_sym = self.cfg.pilot_symbols + -(-n_bits // bps)
        return n_sym * self.cfg.samples_per_symbol
