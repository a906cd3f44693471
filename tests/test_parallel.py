"""Mesh-sharded decode tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trackmaker_tpu.core.config import PhyConfig
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.parallel import (
    batch_sharded_decode, decode_blocked_sharded, make_mesh)
from trackmaker_tpu.parallel.stream import decode_blocked_single_chip
from trackmaker_tpu.phy.decoder import decode_capture
from trackmaker_tpu.phy.encoder import PhyEncoder


def _make_capture(cfg, n_frames, seed=0, gap=300):
    rng = np.random.default_rng(seed)
    frames = [Frame.new_data(i & 0xFF, 1, 2,
                             rng.integers(0, 256, 64,
                                          dtype=np.uint8).tobytes())
              for i in range(n_frames)]
    wave = PhyEncoder(cfg).encode_frames(frames, gap_samples=gap)
    return frames, wave


def test_requires_8_devices():
    assert len(jax.devices()) >= 8


def test_batch_sharded_decode_dp():
    cfg = PhyConfig()
    frames, wave = _make_capture(cfg, 4)
    batch = np.stack([wave] * 8)
    mesh = make_mesh(8, dp=8, sp=1)
    res = batch_sharded_decode(cfg, batch, 2, mesh, max_frames=8)
    assert np.asarray(res.count).tolist() == [4] * 8
    fb = np.asarray(res.frame_bytes)
    for b in range(8):
        for k, f in enumerate(frames):
            assert fb[b, k, 7:7 + 64].tobytes() == f.data


def test_blocked_sharded_matches_full_decode():
    cfg = PhyConfig()
    frames, wave = _make_capture(cfg, 24, gap=500)
    mesh = make_mesh(8, dp=2, sp=4)
    res = decode_blocked_sharded(cfg, wave, 2, mesh,
                                 max_frames_per_block=16)
    full = decode_capture(cfg, jnp.asarray(wave), 2, max_frames=32)

    valid = np.asarray(res.valid)
    starts = np.asarray(res.start)[valid]
    order = np.argsort(starts)
    got_seq = np.asarray(res.sequence)[valid][order].tolist()
    want_seq = np.asarray(full.sequence)[np.asarray(full.valid)].tolist()
    assert got_seq == want_seq
    got_bytes = np.asarray(res.frame_bytes)[valid][order]
    want_bytes = np.asarray(full.frame_bytes)[np.asarray(full.valid)]
    assert np.array_equal(got_bytes, want_bytes)
    # starts agree with the unsharded decode
    assert np.array_equal(np.sort(starts),
                          np.asarray(full.start)[np.asarray(full.valid)])


def test_blocked_single_chip_matches_full_decode():
    cfg = PhyConfig()
    frames, wave = _make_capture(cfg, 12, seed=3, gap=400)
    res = decode_blocked_single_chip(cfg, wave, 2, n_blocks=4,
                                     max_frames_per_block=8)
    valid = np.asarray(res.valid)
    starts = np.asarray(res.start)[valid]
    order = np.argsort(starts)
    seqs = np.asarray(res.sequence)[valid][order].tolist()
    assert seqs == [f.sequence for f in frames]


def test_blocked_sharded_frame_straddling_boundary():
    """Place a frame exactly across a block boundary: the halo exchange
    must recover it on the owning shard."""
    cfg = PhyConfig()
    enc = PhyEncoder(cfg)
    f = Frame.new_data(7, 1, 2, b"straddler" * 8)
    fw = enc.encode_frames([f])
    mesh = make_mesh(8, dp=1, sp=8)
    t = 80_000  # block = 10000
    for pos in [9_000, 9_950, 19_990, 39_500]:
        wave = np.zeros(t, np.float32)
        wave[pos:pos + len(fw)] = fw
        res = decode_blocked_sharded(cfg, wave, 2, mesh,
                                     max_frames_per_block=4)
        valid = np.asarray(res.valid)
        assert valid.sum() == 1, pos
        assert np.asarray(res.start)[valid][0] == pos
        fb = np.asarray(res.frame_bytes)[valid][0]
        assert fb[7:7 + len(f.data)].tobytes() == f.data
