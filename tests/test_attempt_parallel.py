"""Candidate-parallel attempt phase vs the sequential Pallas attempt
kernels: decision equality.

The parallel path (pallas_decode._par_attempt_manchester / _4b5b)
replaces the per-candidate fori_loop + DMA kernels with dense stencils,
whole-row gathers and an exact lane realign — candidates become the
batch axis (the round-4 floor characterization showed the kernels are
sequencer-bound at 0.80 us/candidate, docs/BENCHMARKS.md).  These tests
pin that both formulations make identical decisions — including frames
clipped by the capture end (zero-padded stencil tail vs the kernels'
zero-padded x384 slabs), evil payloads embedding the preamble, zero-gap
back-to-back frames, candidate-table fill slots, and the flat-blocked
long-capture mode whose positions are global."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from trackmaker_tpu.core.config import (FOUR_B_FIVE_B, MANCHESTER,
                                        PhyConfig)
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.oracle.phy import OracleEncoder
from trackmaker_tpu.phy import pallas_decode as pd


def _run(cfg, x, par, **kw):
    old = pd.ATTEMPT_PAR
    pd.ATTEMPT_PAR = par
    try:
        out = pd.decode_capture_spec(cfg, x, 2, interpret=True,
                                     with_cursor=True, **kw)
    finally:
        pd.ATTEMPT_PAR = old
    return jax.tree_util.tree_map(np.asarray, out)


def _assert_equal(a, b):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    for i, (x, y) in enumerate(zip(la, lb)):
        assert np.array_equal(x, y), f"leaf {i}:\n{x}\n{y}"


def _mkcaps(cfg, rng, n_caps, t, evil=False, gap_hi=700):
    enc = OracleEncoder(cfg)
    pre_bytes = bytes([0x33] * (cfg.preamble_bytes - 1) + [0x5A]) \
        if hasattr(cfg, "preamble_bytes") else b"\x33\x5a"
    caps = []
    for _ in range(n_caps):
        x = np.zeros(t, np.float32)
        pos = int(rng.integers(0, 1500))
        for k in range(5):
            if evil and k % 2 == 0:
                data = pre_bytes * (1 + int(rng.integers(0, 8)))
            else:
                data = bytes(rng.integers(
                    0, 256, int(rng.integers(0, 64)), dtype=np.uint8))
            wav = np.asarray(enc.encode_frame(
                Frame.new_data(sequence=k, src=1, dst=2, data=data)),
                np.float32)
            if pos + len(wav) > t:
                x[pos:] += wav[: t - pos]
                break
            x[pos: pos + len(wav)] += wav
            pos += len(wav) + int(rng.integers(0, gap_hi))
        x += rng.normal(0, 0.05, t).astype(np.float32)
        caps.append(x)
    return jnp.asarray(np.stack(caps))


@pytest.mark.parametrize("coding", [MANCHESTER, FOUR_B_FIVE_B])
def test_parallel_matches_kernel_random(coding):
    cfg = PhyConfig(line_coding=coding)
    xb = _mkcaps(cfg, np.random.default_rng(7), 3, 50_000)
    _assert_equal(_run(cfg, xb, True, max_frames=8, n_cand=64),
                  _run(cfg, xb, False, max_frames=8, n_cand=64))


@pytest.mark.parametrize("coding", [MANCHESTER, FOUR_B_FIVE_B])
def test_parallel_evil_zero_gap(coding):
    """Payloads embedding the preamble pattern + zero inter-frame gap:
    every hit (not just true frames) becomes a candidate, so the
    candidate table is dense and mid-run cursor landings matter."""
    cfg = PhyConfig(line_coding=coding)
    xb = _mkcaps(cfg, np.random.default_rng(13), 2, 60_000,
                 evil=True, gap_hi=1)
    _assert_equal(_run(cfg, xb, True, max_frames=8, n_cand=64),
                  _run(cfg, xb, False, max_frames=8, n_cand=64))


@pytest.mark.parametrize("coding", [MANCHESTER, FOUR_B_FIVE_B])
def test_parallel_capture_end_boundary(coding):
    """Frames clipped by valid_len / the buffer end: the parallel
    stencil's zero tail must reproduce the kernels' zero-padded slab
    decisions at every cut point."""
    cfg = PhyConfig(line_coding=coding)
    enc = OracleEncoder(cfg)
    wav = np.asarray(enc.encode_frame(
        Frame.new_data(sequence=1, src=1, dst=2, data=b"edge-case!")),
        np.float32)
    t = 9_000
    lead = t - len(wav) + 60        # frame body runs past the buffer
    for cut_back in [0, 1, 61, 100, 400, len(wav) // 2]:
        x = np.zeros(t, np.float32)
        n = min(len(wav), t - lead)
        x[lead: lead + n] = wav[:n]
        vlen = min(t, lead + len(wav)) - cut_back
        xb = jnp.asarray(x)[None]
        _assert_equal(
            _run(cfg, xb, True, max_frames=4, n_cand=32, valid_len=vlen),
            _run(cfg, xb, False, max_frames=4, n_cand=32, valid_len=vlen))


def test_parallel_flat_blocked():
    """Flat long-capture mode: one shared stencil row plane, global
    candidate positions, per-block walk cursors."""
    cfg = PhyConfig(line_coding=MANCHESTER)
    enc = OracleEncoder(cfg)
    rng = np.random.default_rng(5)
    block, n_blocks = 16_384, 4
    t = block * n_blocks
    x = np.zeros(t, np.float32)
    pos = 700
    k = 0
    while pos < t - 6000:
        data = bytes(rng.integers(0, 256, int(rng.integers(1, 40)),
                                  dtype=np.uint8))
        wav = np.asarray(enc.encode_frame(
            Frame.new_data(sequence=k, src=1, dst=2, data=data)),
            np.float32)
        x[pos: pos + len(wav)] += wav
        pos += len(wav) + int(rng.integers(100, 4000))
        k += 1
    x += rng.normal(0, 0.04, t).astype(np.float32)
    vl = jnp.full((n_blocks,), t, jnp.int32)
    outs = {}
    for par in (True, False):
        old = pd.ATTEMPT_PAR
        pd.ATTEMPT_PAR = par
        try:
            a = pd._spec_phase_a(cfg, jnp.asarray(x), jnp.int32(2), 64,
                                 vl, interpret=True,
                                 flat_blocks=(n_blocks, block))
        finally:
            pd.ATTEMPT_PAR = old
        outs[par] = jax.tree_util.tree_map(np.asarray, a)
    # fill slots (cand == _BIGI) hold garbage in BOTH paths — the
    # kernels leave uninitialized VMEM, the parallel path clipped-row
    # reads; the walk never attempts them (pos < _BIGI guard), so
    # compare only valid slots
    valid = outs[True].cand < 2 ** 30
    assert np.array_equal(valid, outs[False].cand < 2 ** 30)
    assert np.array_equal(outs[True].overflow, outs[False].overflow)
    for name in outs[True]._fields:
        if name in ("cand", "overflow"):
            continue
        a_, b_ = getattr(outs[True], name), getattr(outs[False], name)
        m = valid[:, None, :] if name == "fields" \
            else valid.reshape(valid.shape + (1,) * (a_.ndim - 2))
        assert np.array_equal(np.where(m, a_, 0), np.where(m, b_, 0)), name
    # the capture really produced frames (non-vacuous)
    keep = outs[True].fields[:, 3, :] * valid
    assert int((keep > 0).sum()) >= 3


def test_realign128_exact():
    """out[n, k] == flat[n, k + ql[n]] bit-exactly for every ql in
    [0, 128) (pure selects — no arithmetic may touch the values)."""
    rng = np.random.default_rng(2)
    out_len = 256
    flat = rng.normal(size=(128, out_len + 128)).astype(np.float32)
    ql = np.arange(128, dtype=np.int32)
    got = np.asarray(pd._realign128(jnp.asarray(flat), jnp.asarray(ql),
                                    out_len))
    for n in range(128):
        ref = flat[n, ql[n]: ql[n] + out_len]
        assert np.array_equal(got[n], ref), n


def test_stencil_rows_layout():
    """rows[p*rp + r, l] == S[decim*(128*r + l) + p], zero tail."""
    rng = np.random.default_rng(6)
    t = 5000
    x = rng.normal(size=t).astype(np.float32)
    coeffs = (1, 1, 1, -1, -1, -1)
    decim = 6
    rows = np.asarray(pd._stencil_rows(jnp.asarray(x), coeffs, decim, 3))
    rp = rows.shape[0] // decim
    xp = np.concatenate([x, np.zeros(decim * 128 * rp + 8, np.float32)])
    s = sum(c * xp[j: j + decim * 128 * rp]
            for j, c in enumerate(coeffs))
    for p in range(decim):
        for r in range(rp):
            for l in (0, 1, 63, 127):
                ti = decim * (128 * r + l) + p
                want = s[ti] if ti < len(s) else 0.0
                assert rows[p * rp + r, l] == np.float32(want), (p, r, l)
