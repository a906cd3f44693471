"""Viterbi-coded Manchester PHY — FEC under the CRC for the line-coded
waveform.

Motivation anchor: the reference measured 5-15% frame loss on real
acoustic links and recovered purely by ARQ retransmission
(docs/proj/report.md:532); every lost frame costs a full timeout +
airtime.  A rate-1/2 K=7 convolutional code under the CRC converts most
of those losses into clean decodes: the Manchester half-bit mean
difference is a natural soft value, and soft-decision Viterbi buys the
usual ~5 dB, moving the frame-loss cliff left (see
``tests/test_coded_phy.py``) and cutting retransmissions at equal SNR
(``bench/sweep.py`` contended runs).

Wire format per frame (vs ``src/phy/frame.rs`` framing, which this
wraps): preamble ‖ Manchester(interleaved conv(header 56b) = 124 coded
bits) ‖ Manchester(interleaved conv(payload 8L) = 16L+12 coded bits).
Header and payload are independently flushed blocks so the length
Viterbi-decodes from a fixed-size prefix.  The frame header/CRC layout
is unchanged — the CRC still gates delivery after decoding.

TPU shape: soft demod is one dynamic-slice + reshape + mean (fixed
shapes, static max sizes), batched over candidate starts; Viterbi is
the vectorized add-compare-select scan in core/convcode.py.  The
streaming facade mirrors OfdmStreamPhyV2 so the MAC stack runs
unchanged over it (duck type: encode_frames / process_samples / reset /
frame_samples).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from trackmaker_tpu.core import bitops
from trackmaker_tpu.core.config import MANCHESTER, PhyConfig
from trackmaker_tpu.core.convcode import (
    block_interleaver,
    conv_encode,
    viterbi_decode,
)
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.phy import line_coding


@functools.partial(jax.jit, static_argnums=(0, 2))
def _soft_bits(spl: int, padded: jax.Array, n_bits: int,
               start: jax.Array) -> jax.Array:
    """Soft Manchester values for n_bits bits starting at sample
    `start`: mean(second half) - mean(first half) (positive = bit 1,
    matching line_coding.manchester_decode's comparison)."""
    seg = jax.lax.dynamic_slice(padded, (start,), (n_bits * 2 * spl,))
    halves = jnp.mean(seg.reshape(n_bits, 2, spl), axis=-1)
    return halves[:, 1] - halves[:, 0]


class CodedManchesterPhy:
    """Streaming coded-Manchester PHY (MAC duck type)."""

    HDR_BITS = 56
    HDR_CODED = 2 * (56 + 6)          # 124

    def __init__(self, cfg: PhyConfig = PhyConfig(),
                 max_frame_bytes: int = 263,
                 local_addr: int | None = None):
        assert cfg.line_coding == MANCHESTER, \
            "coded mode is defined on the Manchester waveform"
        self.cfg = cfg
        self.local_addr = local_addr
        self.max_frame_bytes = max_frame_bytes
        self.pre = line_coding.preamble_waveform(cfg)
        self.preamble_len = len(self.pre)
        self.max_coded = self._coded_bits(max_frame_bytes - 7)
        self._buf = np.zeros(0, np.float32)

    @staticmethod
    def _coded_bits(n_payload_bytes: int) -> int:
        return (CodedManchesterPhy.HDR_CODED
                + 2 * (8 * n_payload_bytes + 6))

    def frame_samples(self, n_payload: int) -> int:
        return (self.preamble_len
                + self._coded_bits(n_payload)
                * 2 * self.cfg.samples_per_level)

    # -- encoder side --------------------------------------------------

    def encode_frame(self, frame: Frame) -> np.ndarray:
        fb = frame.to_bytes()
        hdr = bitops.bytes_to_bits_host(fb[:7])
        pay = bitops.bytes_to_bits_host(fb[7:]) if len(fb) > 7 \
            else np.zeros(0, np.uint8)
        ch = np.asarray(conv_encode(jnp.asarray(hdr)))
        cp = np.asarray(conv_encode(jnp.asarray(pay)))
        coded = np.concatenate([ch[block_interleaver(len(ch))],
                                cp[block_interleaver(len(cp))]])
        body = np.asarray(line_coding.manchester_encode(
            jnp.asarray(coded), self.cfg.samples_per_level))
        return np.concatenate([self.pre, body])

    def encode_frames(self, frames: list[Frame],
                      gap_samples: int = 256) -> np.ndarray:
        parts = []
        for i, f in enumerate(frames):
            parts.append(self.encode_frame(f))
            if i < len(frames) - 1:
                parts.append(np.zeros(gap_samples, np.float32))
        return np.concatenate(parts) if parts else np.zeros(0, np.float32)

    # -- streaming decoder side ----------------------------------------

    def reset(self) -> None:
        self._buf = np.zeros(0, np.float32)

    def _deint(self, soft: np.ndarray) -> np.ndarray:
        out = np.empty_like(soft)
        out[block_interleaver(len(soft))] = soft
        return out

    def process_samples(self, samples: np.ndarray) -> list[Frame]:
        from trackmaker_tpu.sync import correlate
        self._buf = np.concatenate(
            [self._buf, np.asarray(samples, np.float32)])
        cfg = self.cfg
        spl = cfg.samples_per_level
        if len(self._buf) < self.preamble_len + 1:
            return []
        out: list[Frame] = []
        bucket = 4096
        need = len(self._buf) + self.max_coded * 2 * spl + 8
        while bucket < need:
            bucket *= 2
        padded = np.zeros(bucket, np.float32)
        padded[: len(self._buf)] = self._buf
        pj = jnp.asarray(padded)
        corr = np.asarray(correlate.normalized_xcorr(
            pj, jnp.asarray(self.pre)))
        hits = np.nonzero(
            corr[: max(len(self._buf) - self.preamble_len + 1, 0)]
            >= cfg.correlation_threshold)[0]
        consumed = 0
        k = 0
        # the 0x33 pattern bytes are 4-bit-periodic, so a partially
        # overlapped window can cross a lowered threshold a full
        # pattern period before true alignment — refine over the whole
        # preamble span (the next frame is >= frame_samples away)
        refine = self.preamble_len
        while k < len(hits):
            i = int(hits[k])
            if i < consumed:
                k += 1
                continue
            s = i + int(np.argmax(corr[i: i + refine]))
            hdr_end = s + self.preamble_len + self.HDR_CODED * 2 * spl
            if hdr_end > len(self._buf):
                break  # header still arriving
            body = s + self.preamble_len
            soft_h = self._deint(np.asarray(_soft_bits(
                spl, pj, self.HDR_CODED, jnp.int32(body))))
            hdr_bits = np.asarray(viterbi_decode(
                jnp.asarray(soft_h), self.HDR_BITS, soft=True))
            hdr = np.packbits(hdr_bits)
            data_len = (int(hdr[0]) << 8) | int(hdr[1])
            if data_len > self.max_frame_bytes - 7:
                consumed = s + self.preamble_len
                k += 1
                continue
            total_coded = self._coded_bits(data_len)
            frame_end = s + self.preamble_len + total_coded * 2 * spl
            if frame_end > len(self._buf):
                break  # wait for the rest of this frame
            soft_all = np.asarray(_soft_bits(
                spl, pj, self.max_coded, jnp.int32(body)))
            pay_soft = self._deint(soft_all[self.HDR_CODED: total_coded])
            if data_len:
                pay_bits = np.asarray(viterbi_decode(
                    jnp.asarray(pay_soft), 8 * data_len, soft=True))
            else:
                pay_bits = np.zeros(0, np.uint8)
            f = Frame.from_bits(np.concatenate([hdr_bits, pay_bits]))
            consumed = frame_end
            k += 1
            if f is None:
                continue
            if self.local_addr is not None and f.dst != self.local_addr:
                continue
            out.append(f)
        if consumed:
            keep = max(consumed - (self.preamble_len - 1), 0)
            self._buf = self._buf[keep:]
        elif len(self._buf) > 10 * 48_000:
            self._buf = self._buf[-self.preamble_len:]
        return out
