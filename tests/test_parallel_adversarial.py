"""Adversarial seam tests: blocked/sharded decode must equal sequential
`decode_capture` even when frames straddle block boundaries with
payloads that embed preamble bytes (so consumption, not just detection,
crosses the seam).

The attack (VERDICT round 1, weakness 2): payload = [0x33, 0x5A] ++
valid embedded frame bytes.  The line-coded body then contains an exact
preamble waveform followed by a CRC-valid frame.  Sequentially the outer
frame consumes past it, so the embedded frame is never attempted; a
blocked decoder whose next shard scans its own region from the start
would decode the embedded frame as real.  The consumed-until fixpoint in
parallel/stream.py reconciles this.
"""

import numpy as np
import pytest

import jax

from trackmaker_tpu.core import bitops
from trackmaker_tpu.core.config import FOUR_B_FIVE_B, MANCHESTER, PhyConfig
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.oracle.phy import OracleEncoder
from trackmaker_tpu.parallel.mesh import make_mesh
from trackmaker_tpu.parallel.stream import (
    decode_blocked_sharded,
    decode_blocked_single_chip,
    halo_size,
)
from trackmaker_tpu.phy.decoder import decode_capture


def _raw(data: bytes, seq=0, src=1, dst=2, ftype=1) -> bytes:
    n = len(data)
    return bytes([n >> 8, n & 0xFF, bitops.crc8_host(data), ftype,
                  seq, src, dst]) + data


def _evil_frame(cfg, seq: int, embedded_payload: bytes) -> Frame:
    """A frame whose payload embeds a full, CRC-valid frame preceded by
    the preamble byte pattern — line-coded, the body contains an exact
    preamble waveform followed by a decodable frame."""
    embedded = _raw(embedded_payload, seq=99)
    return Frame.new_data(seq, 1, 2, bytes([0x33, 0x5A]) + embedded)


def _decoded_set(res):
    return sorted(
        (int(st), int(sq), bytes(fb[: 7 + int(ln)]))
        for v, st, sq, ln, fb in zip(
            np.asarray(res.valid), np.asarray(res.start),
            np.asarray(res.sequence), np.asarray(res.length),
            np.asarray(res.frame_bytes))
        if v)


def _build_capture(cfg, positions_and_frames, total):
    enc = OracleEncoder(cfg)
    wave = np.zeros(total, np.float32)
    for pos, frame in positions_and_frames:
        w = enc.encode_frame(frame)
        wave[pos: pos + len(w)] = w
    return wave


@pytest.mark.parametrize("lc", [MANCHESTER, FOUR_B_FIVE_B])
def test_single_chip_blocked_equals_sequential_evil_seam(lc):
    cfg = PhyConfig(line_coding=lc)
    n_blocks = 6
    total = 6 * 16000
    block = total // n_blocks
    # the outer evil frame starts just before the seam at `block`; its
    # embedded preamble-like hit lands inside block 1's own region
    evil = _evil_frame(cfg, 1, b"EVIL-EMBEDDED")
    scenarios = [
        (block - 200, evil),                              # straddles seam 0|1
        (2 * block - 40, Frame.new_data(2, 1, 2, b"plain-straddler")),
        (3 * block + 500, _evil_frame(cfg, 3, b"MID-BLOCK")),  # no seam
        (4 * block - 150, Frame.new_data(4, 1, 9, b"not-for-us")),
        (5 * block + 100, Frame.new_data(5, 1, 2, b"tail")),
    ]
    wave = _build_capture(cfg, scenarios, total)
    seq = decode_capture(cfg, wave, 2, max_frames=32)
    blk = decode_blocked_single_chip(cfg, wave, 2, n_blocks=n_blocks,
                                     max_frames_per_block=8)
    assert _decoded_set(blk) == _decoded_set(seq)
    # sanity: the embedded frame (seq 99) must NOT appear
    assert all(sq != 99 for _, sq, _ in _decoded_set(blk))
    # and the outer evil frame itself decodes
    assert any(sq == 1 for _, sq, _ in _decoded_set(blk))


def test_single_chip_blocked_chain_of_straddlers():
    """Back-to-back frames so consumption chains across several seams:
    the fixpoint must propagate more than one block to the right."""
    cfg = PhyConfig()
    enc = OracleEncoder(cfg)
    f = _evil_frame(cfg, 7, b"CHAIN")
    w = enc.encode_frame(f)
    n_blocks = 8
    # block barely larger than the halo so one frame spans whole blocks
    block = halo_size(cfg) + 200
    total = n_blocks * block
    wave = np.zeros(total, np.float32)
    pos = block - 60  # start just before seam 0|1
    k = 0
    while pos + len(w) < total - block and k < 6:
        wave[pos: pos + len(w)] = w
        pos += len(w)  # zero-gap chain, each crossing a new seam
        k += 1
    seq = decode_capture(cfg, wave, 2, max_frames=32)
    blk = decode_blocked_single_chip(cfg, wave, 2, n_blocks=n_blocks,
                                     max_frames_per_block=8)
    assert _decoded_set(blk) == _decoded_set(seq)
    assert len(_decoded_set(seq)) == k  # all outer frames decoded


@pytest.mark.parametrize("use_spec", [False, True])
def test_sharded_equals_sequential_evil_seam(use_spec):
    cfg = PhyConfig()
    mesh = make_mesh(dp=2, sp=4)
    n_shards = 8
    total = n_shards * 16000
    block = total // n_shards
    evil = _evil_frame(cfg, 1, b"SHARD-EVIL")
    scenarios = [
        (block - 200, evil),
        (3 * block - 40, Frame.new_data(2, 1, 2, b"plain")),
        (5 * block + 11, _evil_frame(cfg, 3, b"INNER")),
        (7 * block - 300, Frame.new_data(4, 1, 2, b"last-seam")),
    ]
    wave = _build_capture(cfg, scenarios, total)
    seq = decode_capture(cfg, wave, 2, max_frames=32)
    shd = decode_blocked_sharded(cfg, wave, 2, mesh,
                                 max_frames_per_block=8,
                                 use_spec=use_spec)
    assert _decoded_set(shd) == _decoded_set(seq)
    assert all(sq != 99 for _, sq, _ in _decoded_set(shd))


def test_sharded_spec_chain_of_straddlers():
    """The spec sharded path under the multi-seam chain attack: the
    walk-only fixpoint must propagate consumption through several
    shards (each iteration only advances one ring hop)."""
    cfg = PhyConfig()
    enc = OracleEncoder(cfg)
    f = _evil_frame(cfg, 7, b"CHAIN")
    w = enc.encode_frame(f)
    n_shards = 8
    block = halo_size(cfg) + 200
    total = n_shards * block
    wave = np.zeros(total, np.float32)
    pos = block - 60
    k = 0
    while pos + len(w) < total - block and k < 6:
        wave[pos: pos + len(w)] = w
        pos += len(w)
        k += 1
    mesh = make_mesh(dp=1, sp=8)
    seq = decode_capture(cfg, wave, 2, max_frames=32)
    shd = decode_blocked_sharded(cfg, wave, 2, mesh,
                                 max_frames_per_block=8, use_spec=True)
    assert _decoded_set(shd) == _decoded_set(seq)
    assert len(_decoded_set(seq)) == k


def test_blocked_block_smaller_than_halo_still_exact():
    """Blocks smaller than the halo: an evil frame spans multiple whole
    blocks, so the consumed-until endpoint must propagate through
    intermediate shards over several fixpoint iterations."""
    cfg = PhyConfig()
    enc = OracleEncoder(cfg)
    evil = _evil_frame(cfg, 1, b"WIDE")
    w = enc.encode_frame(evil)
    n_blocks = 10
    block = halo_size(cfg) // 3  # frame spans ~3 blocks
    total = n_blocks * block
    wave = np.zeros(total, np.float32)
    wave[block - 60: block - 60 + len(w)] = w
    tail = enc.encode_frame(Frame.new_data(2, 1, 2, b"tail"))
    wave[total - len(tail) - 10: total - 10] = tail
    seq = decode_capture(cfg, wave, 2, max_frames=16)
    blk = decode_blocked_single_chip(cfg, wave, 2, n_blocks=n_blocks,
                                     max_frames_per_block=8)
    assert _decoded_set(blk) == _decoded_set(seq)
    assert {sq for _, sq, _ in _decoded_set(seq)} == {1, 2}


def test_blocked_clean_capture_unchanged():
    """Regression: the fixpoint must not disturb clean captures (no
    seam-straddling consumption)."""
    cfg = PhyConfig()
    enc = OracleEncoder(cfg)
    rng = np.random.default_rng(5)
    parts = []
    want = []
    for i in range(10):
        parts.append(rng.normal(0, 0.02, 2000 + 321 * i)
                     .astype(np.float32))
        fr = Frame.new_data(i, 1, 2, bytes([i]) * (4 + i))
        want.append(fr)
        parts.append(enc.encode_frame(fr))
    parts.append(np.zeros(30000, np.float32))
    wave = np.concatenate(parts)
    seq = decode_capture(cfg, wave, 2, max_frames=32)
    blk = decode_blocked_single_chip(cfg, wave, 2, n_blocks=4,
                                     max_frames_per_block=16)
    assert _decoded_set(blk) == _decoded_set(seq)
    assert len(_decoded_set(seq)) == len(want)
