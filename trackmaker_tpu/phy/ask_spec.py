"""Speculative batched ASK receiver: dense fire-candidates + successor
table + SMEM walk.

The exact scan receiver (phy/ask.py:demodulate) replays the reference's
record-chain state machine (examples/ask.rs:693-796) one frame slot per
`lax.scan` step; each step costs ~100 tiny dispatch-bound ops, which
caps it at ~550x real time.  This module restructures it the same way
phy/pallas_decode.py restructured the frame decoder:

1. *Dense candidates*: position r can be a fired peak iff ``upd_ok[r]``
   and no strictly-better update exists in ``(r, r+guard+1]``.  This
   exactly characterizes the record-chain fire rule: a record r is
   displaced only by an update with sync strictly above it arriving
   before the fire check at r+guard+1 (ask.rs:711-722 — the `elif`
   orders update before fire, so the displacement window is guard+1
   wide).  Computed densely with a two-pass sliding-window max and
   extracted via the same block-peel used by the frame decoder.

2. *Successor table* (phase B): for every candidate c — treated as "a
   frame just decoded with peak c" — replay the exact per-step logic
   (warmup-corrected FIFO restart at cursor c + frame + 1, first-update
   query, bounded record chain) vmapped over ALL candidates at once,
   yielding (has, fired, complete, next_peak).  `next_peak` is mapped
   back to a candidate index: in the dense region a fired peak is
   always a dense candidate (its displacement window is past the
   440-sample warmup region, so the dense rule applies verbatim); a
   peak inside the warmup region is not in the table and conformance-
   flags the capture for exact re-decode.

3. *Walk* (SMEM Pallas kernel): the sequential frame loop becomes
   pointer-chasing over the successor table — one scalar kernel launch
   instead of max_frames dispatch-bound scan steps.  Slot k of the walk
   corresponds exactly to scan step k, so results are equal
   slot-for-slot.

The demod post-pass (multiply/smooth/integrate per fired window) is
shared with the scan receiver and already vmapped.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trackmaker_tpu.phy import ask
from trackmaker_tpu.phy.ask import AskConfig, AskDecoded

_BIGI = np.int32(2**30)

def spec_supported() -> bool:
    """The spec path needs real Pallas (or interpret mode, used by
    tests); dispatch it on TPU only."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _fire_kernel(sa_ref, oa_ref, sb_ref, ob_ref, out_ref, *, w: int,
                 tr: int):
    """Fused sliding-window-max fire rule for one tile of TR 128-lane
    rows (+ the next tile for the 2-row halo): per-block lane cummaxes
    (7 doubling shift-max stages each way, all in VMEM), block maxima,
    and the t1/t2/t3 window assembly of the 2-D form below — one HBM
    read + one bitmap write replace the XLA form's ~700 MB of cummax /
    flip / concat traffic (~1.2 ms of the ASK receiver's 6.3 ms).
    Max-only arithmetic: decisions are bit-identical to the XLA form
    (tests/test_ask_spec.py pins it)."""
    ninf = jnp.float32(-jnp.inf)
    ma = jnp.where(oa_ref[...] > 0, sa_ref[...], ninf)
    mb = jnp.where(ob_ref[...] > 0, sb_ref[...], ninf)
    x2 = jnp.concatenate([ma, mb], axis=0)          # (2TR, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (2 * tr, 128), 1)
    pre = x2
    suf = x2
    for sh in (1, 2, 4, 8, 16, 32, 64):
        pre = jnp.maximum(pre, jnp.where(lane < sh, ninf,
                                         pltpu.roll(pre, sh, 1)))
        suf = jnp.maximum(suf, jnp.where(lane >= 128 - sh, ninf,
                                         pltpu.roll(suf, 128 - sh, 1)))
    bm = jnp.max(x2, axis=1, keepdims=True)         # (2TR, 1)

    lane1 = lane[:tr]
    split = 256 - w                                  # 55 for w=201
    t1 = jnp.where(lane1 < 127, pltpu.roll(suf[:tr], 127, 1),
                   suf[1:tr + 1, 0:1])
    t2 = jnp.where(lane1 < split,
                   pltpu.roll(pre[1:tr + 1], 256 - w, 1),
                   pltpu.roll(pre[2:tr + 2], split, 1))
    t3 = jnp.where((lane1 >= split) & (lane1 < 127), bm[1:tr + 1],
                   ninf)
    fwd = jnp.maximum(jnp.maximum(t1, t2), t3)
    hit = (ma >= fwd) & (oa_ref[...] > 0)
    out_ref[...] = hit.astype(jnp.float32)


def _fire_kernel_call(cfg: AskConfig, sync: jax.Array,
                      upd_ok: jax.Array, interpret: bool):
    """Pallas dispatch of :func:`_fire_kernel` (128 < w <= 256)."""
    t = sync.shape[-1]
    w = cfg.peak_guard + 1
    tr = 256
    nq = -(-(t + 1) // 128)          # rows covering positions [0, t]
    tiles = -(-nq // tr)
    nb = (tiles + 1) * tr            # + one halo tile for the B input
    ninf = np.float32(-np.inf)
    sp = jnp.pad(sync, (0, nb * 128 - t), constant_values=ninf
                 ).reshape(nb, 128)
    op = jnp.pad(upd_ok.astype(jnp.float32), (0, nb * 128 - t)
                 ).reshape(nb, 128)
    out = pl.pallas_call(
        functools.partial(_fire_kernel, w=w, tr=tr),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((tr, 128), lambda i: (i, 0)),
            pl.BlockSpec((tr, 128), lambda i: (i, 0)),
            pl.BlockSpec((tr, 128), lambda i: (i + 1, 0)),
            pl.BlockSpec((tr, 128), lambda i: (i + 1, 0)),
        ],
        out_specs=pl.BlockSpec((tr, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((tiles * tr, 128), jnp.float32),
        interpret=interpret,
    )(sp, op, sp, op)
    return (out.reshape(-1)[:t] > 0)


def dense_fire_candidates(cfg: AskConfig, sync: jax.Array,
                          upd_ok: jax.Array, interpret: bool = False,
                          use_kernel: bool | None = None):
    """bool[T] mask of positions that fire if they become the chain
    record: upd_ok[r] with no strictly-greater masked sync in
    (r, r+guard+1] (window arithmetic per the module docstring).

    Sliding max on 128-aligned blocks: the van Herk form with
    block == window (201 lanes) relayouts on every cummax step —
    measured 2.26 ms of the receiver's 10 ms.  With B=128 blocks the
    window [i, i+w-1] spans 2..3 blocks (w in (B, 2B+1]), so
    max = suf[i] ∨ (middle block maxima) ∨ pre[i+w-1], where pre/suf
    are lane-aligned per-block cummaxes and every other term is a
    STATIC shift (slice) — max is exact, so decisions are unchanged."""
    t = sync.shape[-1]
    w = cfg.peak_guard + 1                      # 201
    bsz = 128
    if (use_kernel if use_kernel is not None else True) \
            and bsz < w <= 2 * bsz:
        return _fire_kernel_call(cfg, sync, upd_ok, interpret)
    masked = jnp.where(upd_ok, sync, -jnp.inf)
    if w <= bsz:                                 # exotic config: van Herk
        nb = -(-(t + w) // w) + 1
        mp = jnp.pad(masked, (0, nb * w - t), constant_values=-jnp.inf)
        blocks = mp.reshape(nb, w)
        pre = jax.lax.cummax(blocks, axis=1).reshape(-1)
        suf = jnp.flip(jax.lax.cummax(jnp.flip(blocks, 1), axis=1),
                       1).reshape(-1)
        swin = jnp.maximum(suf[:t + 1], pre[w - 1: t + w])
        fwd_max = swin[1: t + 1]
        return upd_ok & (masked[:t] >= fwd_max)
    if w > 2 * bsz:                              # exotic config: 1-D form
        nb = (t + w) // bsz + 2
        mp = jnp.pad(masked, (0, nb * bsz - t), constant_values=-jnp.inf)
        blocks = mp.reshape(nb, bsz)
        pre = jax.lax.cummax(blocks, axis=1).reshape(-1)
        suf = jnp.flip(jax.lax.cummax(jnp.flip(blocks, 1), axis=1),
                       1).reshape(-1)
        bm = jnp.max(blocks, axis=1)
        rep_bm = jnp.repeat(bm, bsz)
        n = t + 1
        off = jnp.arange(n, dtype=jnp.int32) % bsz
        swin = jnp.maximum(suf[:n], pre[w - 1: w - 1 + n])
        n_mid = (w - 2) // bsz
        for mi in range(n_mid):
            mid = rep_bm[(mi + 1) * bsz: (mi + 1) * bsz + n]
            swin = jnp.maximum(
                swin,
                jnp.where(off >= (mi + 2) * bsz - w + 1, mid, -jnp.inf))
        fwd_max = swin[1: t + 1]
        return upd_ok & (masked[:t] >= fwd_max)
    # fully 2-D form, no misaligned 1-D slices (each one relayouts the
    # whole array): for position i = q*B + r the window is (i, i+w],
    # and with B < w <= 2B every term is a static row/lane split:
    #   suffix of i+1's block:  r<B-1 -> suf2[q, r+1];  r=B-1 -> suf2[q+1, 0]
    #   prefix at i+w:          r<2B-w -> pre2[q+1, r+w-B]; else pre2[q+2, r+w-2B]
    #   middle block max:       bm[q+1], exactly when r in [2B-w, B-1)
    nb = (t + w) // bsz + 4
    mp = jnp.pad(masked, (0, nb * bsz - t), constant_values=-jnp.inf)
    blocks = mp.reshape(nb, bsz)
    pre2 = jax.lax.cummax(blocks, axis=1)
    suf2 = jnp.flip(jax.lax.cummax(jnp.flip(blocks, 1), axis=1), 1)
    bm = jnp.max(blocks, axis=1)
    nq = nb - 2                                   # rows covering [0, t)
    split = 2 * bsz - w                           # 55 for w=201
    t1 = jnp.concatenate([suf2[:nq, 1:], suf2[1:nq + 1, :1]], axis=1)
    t2 = jnp.concatenate([pre2[1:nq + 1, w - bsz:],
                          pre2[2:nq + 2, :w - bsz]], axis=1)
    lane = jnp.arange(bsz, dtype=jnp.int32)[None, :]
    t3 = jnp.where((lane >= split) & (lane < bsz - 1),
                   bm[1:nq + 1][:, None], -jnp.inf)
    fwd2 = jnp.maximum(jnp.maximum(t1, t2), t3)
    hit2 = blocks[:nq] >= fwd2
    return upd_ok & hit2.reshape(-1)[:t]


_R = 512  # fetch-row width for aligned window gathers


# out[c, k] = src[c, k + s[c]] exactly, with only a small one-hot
# materialized (8-way static-shift select + one-hot row matmul —
# core/realign.py; out-of-range shifts incl. the sentinel cursors
# yield zeros, exactly where the consumers mask)
from trackmaker_tpu.core.realign import shift_realign as _shift_realign  # noqa: E402


_NEGB = np.int32(-(2 ** 30))


def _chain_kernel(vals_ref, base_ref, out_ref, *, guard: int,
                  win: int):
    """Record-chain fire resolution for one capture's candidate rows:
    exclusive running max (doubling roll/max stages), update mask,
    last-update-index cummax, fire rule, first-fire reduction, and the
    peak pick — all on VMEM registers; one (RP, WIN) read and one
    (RP, 128) write.  See _phase_b for the semantics derivation."""
    ninf = jnp.float32(-jnp.inf)
    vals = vals_ref[...]                            # (RP, WIN)
    rp = vals.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rp, win), 1)
    idx = base_ref[...][:, 0:1] + lane
    # exclusive running max of vals
    m = jnp.where(lane == 0, ninf, pltpu.roll(vals, 1, 1))
    sh = 1
    while sh < win:
        m = jnp.maximum(m, jnp.where(lane < sh, ninf,
                                     pltpu.roll(m, sh, 1)))
        sh *= 2
    upd = vals > m                 # strict improvement == chain update
    ridx = jnp.where(upd, idx, _NEGB)
    rec = ridx
    sh = 1
    while sh < win:
        rec = jnp.maximum(rec, jnp.where(lane < sh, _NEGB,
                                         pltpu.roll(rec, sh, 1)))
        sh *= 2
    rec_excl = jnp.where(lane == 0, _NEGB, pltpu.roll(rec, 1, 1))
    fire = (~upd) & (idx > rec_excl + guard) & (m > ninf)
    j1 = jnp.min(jnp.where(fire, lane, win), axis=1, keepdims=True)
    fired = j1 < win                                # (RP, 1)
    peak_f = jnp.sum(jnp.where(lane == j1, rec_excl, 0), axis=1,
                     keepdims=True)
    rec_last = jnp.max(ridx, axis=1, keepdims=True)
    peak = jnp.where(fired, peak_f, rec_last)
    l128 = jax.lax.broadcasted_iota(jnp.int32, (rp, 128), 1)
    out_ref[...] = jnp.where(l128 == 0, fired.astype(jnp.int32),
                             jnp.where(l128 == 1, peak, 0))


def _chain_kernel_call(vals: jax.Array, base_w: jax.Array, win: int,
                       guard: int, interpret: bool):
    """(fired[C], peak[C]) via :func:`_chain_kernel` (rows padded to a
    sublane multiple; pad rows are all -inf -> fired False, unused)."""
    c1 = vals.shape[0]
    rp = -(-c1 // 8) * 8
    vp = jnp.pad(vals, ((0, rp - c1), (0, 0)),
                 constant_values=-jnp.inf)
    bp = jnp.pad(base_w, (0, rp - c1))
    bcol = jnp.broadcast_to(bp[:, None], (rp, 128))
    out = pl.pallas_call(
        functools.partial(_chain_kernel, guard=guard, win=win),
        out_shape=jax.ShapeDtypeStruct((rp, 128), jnp.int32),
        interpret=interpret,
    )(vp, bcol)
    return out[:c1, 0] > 0, out[:c1, 1]


def _phase_b(cfg: AskConfig, rx, power, sync, upd_ok, cand_full,
             chain_window: int, interpret: bool = False,
             use_kernel: bool | None = None):
    """Per-candidate successor fields for one capture.

    cand_full: i32[C+1], ascending; slot 0 is the virtual stream-start
    candidate at -(frame_samples+1) so its cursor is exactly 0 (the
    reference's initial zeroed-FIFO state).  Returns i32[5, C+1] rows
    has/fired/complete/next_peak/succ_idx.

    TPU shape (round-3 restructure): the previous per-candidate
    ``dynamic_slice`` formulation lowered under vmap to per-element
    gathers — ~10 of 14 ms of the whole receiver for ~5.6M gathered
    elements.  Row-gathers of 512-lane rows are ~free (measured
    +0.15 ms for all four windows), so every window is fetched on
    512-aligned rows via ``jnp.take``; the chain runs on the wider
    [row_start, row_start + CW + 512) window with the pre-``i0``
    prefix masked off (masked entries have ok=False → -inf, so they
    cannot create records or fires — decisions are unchanged, and the
    ≥CW effective window can only *resolve* chains the old fixed-CW
    window conformance-flagged; any fire inside a prefix window fires
    identically in the scan receiver's 4096 window).  Only the
    440-wide warmup band is realigned exactly, via one-hot f32
    row-selection matmuls (each output has exactly one 1.0 multiplier
    — exact at HIGHEST precision; same trick as the attempt kernel's
    rowsel)."""
    t = rx.shape[-1]
    l_pre = cfg.preamble_len
    c1 = cand_full.shape[0]
    upd_tables = ask.upd_block_tables(upd_ok)
    win = chain_window + _R
    assert win % _R == 0, "chain_window must be a multiple of 512"
    rows_n = win // _R

    # rx_pad is only returned for the (env-gated) per-slot demod path
    rx_pad = jnp.concatenate(
        [rx, jnp.zeros(cfg.frame_samples + chain_window + 8, jnp.float32)])

    def as_rows(a, fill, need_rows):
        nr = (t - 1) // _R + need_rows + 2
        pad = nr * _R - t
        return jnp.pad(a, (0, pad), constant_values=fill).reshape(nr, _R), nr

    s_rows, nr_s = as_rows(sync, -jnp.inf, rows_n)
    u_rows, _ = as_rows(upd_ok, False, rows_n)
    r_rows, nr_r = as_rows(rx, 0.0, 2)
    p_rows, _ = as_rows(power, 0.0, 2)
    w_band = jnp.asarray(ask._warmup_band_np(cfg))

    cursor = jnp.minimum(cand_full + cfg.frame_samples + 1, _BIGI)

    # --- warmup correlations (exact FIFO-restart partials) ----------
    # slab/power at [cursor, cursor+440) from two aligned rows, then a
    # one-hot realign matmul; a padded/BIGI cursor yields an all-zero
    # one-hot -> zero slab -> ok_w all-False (abs threshold), exactly
    # like the old out-of-range dynamic_slice reads of the zero pad.
    rb = jnp.clip(cursor // _R, 0, nr_r - 2)
    two = jnp.arange(2, dtype=jnp.int32)
    rw = jnp.take(r_rows, rb[:, None] + two, axis=0).reshape(c1, 2 * _R)
    pw2 = jnp.take(p_rows, rb[:, None] + two, axis=0).reshape(c1, 2 * _R)
    o1 = cursor - rb * _R
    pad8 = (-l_pre) % 8
    slab = _shift_realign(rw, o1, l_pre + pad8)[:, :l_pre]
    pw_p = _shift_realign(pw2, o1, l_pre + pad8)[:, :l_pre]
    sync_w = jnp.matmul(slab, w_band,
                        precision=jax.lax.Precision.HIGHEST) \
        / cfg.sync_divisor                               # [C, l_pre]
    parng = jnp.arange(l_pre, dtype=jnp.int32)[None, :]
    pos_valid = cursor[:, None] + parng < t
    ok_w = ((sync_w > cfg.sync_power_factor * pw_p)
            & (sync_w > cfg.sync_abs_threshold) & pos_valid)

    first_warm = jnp.min(
        jnp.where(ok_w, cursor[:, None] + parng, _BIGI), axis=-1)
    first_dense, has_dense = jax.vmap(
        lambda c: ask.first_upd_from(upd_tables, c))(cursor + l_pre)
    first = jnp.minimum(first_warm,
                        jnp.where(has_dense, first_dense, _BIGI))
    has = first < _BIGI
    i0 = jnp.clip(first, 0, t - 1)

    # --- aligned chain windows with masked prefix --------------------
    wb = jnp.clip(i0 // _R, 0, nr_s - rows_n)
    rrng = jnp.arange(rows_n, dtype=jnp.int32)
    sp_w = jnp.take(s_rows, wb[:, None] + rrng, axis=0).reshape(c1, win)
    ok_wn = jnp.take(u_rows, wb[:, None] + rrng, axis=0).reshape(c1, win)
    base_w = wb * _R
    idx = base_w[:, None] + jnp.arange(win, dtype=jnp.int32)[None, :]

    # warmup substitution: the warm band starts at window offset
    # cursor - base_w <= 511 (base_w >= i0-511 >= cursor-511), so only
    # the first l_pre + 512 window columns can ever be warm.  The
    # realign sw_sub[j] = sync_w[j - sh] runs through _shift_realign
    # on a 512-offset source (s = 512 - sh >= 1 whenever the band
    # touches the window; out-of-range shifts -> zeros, and in_warm is
    # False exactly there)
    wsub = l_pre + _R
    l2 = 3008                   # covers j + s for every in-use shift
    zpad = jnp.zeros((c1, _R), jnp.float32)
    src_s = jnp.concatenate(
        [zpad, sync_w, jnp.zeros((c1, l2 - _R - l_pre), jnp.float32)],
        axis=-1)
    src_o = jnp.concatenate(
        [zpad, ok_w.astype(jnp.float32),
         jnp.zeros((c1, l2 - _R - l_pre), jnp.float32)], axis=-1)
    s2 = _R - (cursor - base_w)
    sw_sub = _shift_realign(src_s, s2, wsub)
    okw_sub = _shift_realign(src_o, s2, wsub) > 0.5
    in_warm = ((idx[:, :wsub] >= cursor[:, None])
               & (idx[:, :wsub] < cursor[:, None] + l_pre))
    sp_full = jnp.concatenate(
        [jnp.where(in_warm, sw_sub, sp_w[:, :wsub]), sp_w[:, wsub:]],
        axis=-1)
    ok_full = jnp.concatenate(
        [jnp.where(in_warm, okw_sub, ok_wn[:, :wsub]), ok_wn[:, wsub:]],
        axis=-1)

    ok_m = ok_full & (idx >= i0[:, None])
    vals = jnp.where(ok_m, sp_full, -jnp.inf)

    if use_kernel if use_kernel is not None else True:
        # fused chain kernel (r5): the pair scan's running (max,
        # record) decomposes into an exclusive value-cummax + a
        # last-update-index cummax — the running argmax with
        # earliest-tie rule IS the last strict improvement, so both
        # are plain cummaxes that run as in-VMEM doubling stages
        # (~21 roll/max sweeps on registers) instead of ~40 HBM-wide
        # associative_scan passes.  Decision equality pinned by
        # tests/test_ask_spec.py::test_chain_kernel_vs_scan.
        fired, peak = _chain_kernel_call(vals, base_w, win,
                                         cfg.peak_guard, interpret)
    else:
        def combine(a, b):
            av, ai = a
            bv, bi = b
            take_b = bv > av    # strict: earlier index wins ties
            return jnp.where(take_b, bv, av), jnp.where(take_b, bi, ai)

        m_incl, rec_incl = jax.lax.associative_scan(
            combine, (vals, idx), axis=-1)
        m_excl = jnp.concatenate(
            [jnp.full((c1, 1), -jnp.inf), m_incl[:, :-1]], axis=-1)
        rec_excl = jnp.concatenate([idx[:, :1], rec_incl[:, :-1]],
                                   axis=-1)
        rec_last = rec_incl[:, -1]
        upd_now = ok_m & (sp_full > m_excl)
        fire = ((~upd_now) & (idx > rec_excl + cfg.peak_guard)
                & (m_excl > -jnp.inf))
        # first-fire pick without per-row element gathers: one-hot on
        # the first True of `fire` (all-False rows -> zero one-hot ->
        # fired False, peak falls back to the final record)
        wrng = jnp.arange(win, dtype=jnp.int32)[None, :]
        j1 = jnp.min(jnp.where(fire, wrng, win), axis=-1, keepdims=True)
        oh = (wrng == j1)
        fired = jnp.any(fire, axis=-1)
        peak = jnp.where(fired,
                         jnp.sum(jnp.where(oh, rec_excl, 0), axis=-1),
                         rec_last)
    complete = (peak + cfg.frame_samples) < t

    # next_peak -> candidate index (the successor); -1 when the fired
    # peak is not a dense candidate (warmup-region fire) — conformance
    succ = jnp.searchsorted(cand_full, peak).astype(jnp.int32)
    c1 = cand_full.shape[0]
    found = (succ < c1) & (cand_full[jnp.clip(succ, 0, c1 - 1)] == peak)
    succ = jnp.where(found, succ, -1)
    # has & ~fired can mean EITHER stream-end-without-fire (scan: done)
    # OR a chain truncated by the bounded window (the 4096-window scan
    # might still fire) — conformance-flag it so visited occurrences
    # fall back to the exact receiver instead of silently stopping
    nc = has & ~fired
    return jnp.stack([has.astype(jnp.int32), fired.astype(jnp.int32),
                      complete.astype(jnp.int32), peak, succ,
                      nc.astype(jnp.int32)]), rx_pad


def _ask_walk_kernel(fields_ref, out_ref, *, max_frames: int):
    """Pointer-chase over the successor table, one capture per grid
    step.  fields rows: 0=has, 1=fired, 2=complete, 3=next_peak,
    4=succ_idx, 5=nonconf.  out rows: 0=peak per slot,
    1=fire_ok&complete per slot, 2 lane 0 = bad (walk visited a
    candidate the table cannot represent exactly)."""
    def body(k, carry):
        i, done, bad = carry
        has = fields_ref[0, 0, i]
        fired = fields_ref[0, 1, i]
        complete = fields_ref[0, 2, i]
        peak = fields_ref[0, 3, i]
        succ = fields_ref[0, 4, i]
        nc = fields_ref[0, 5, i]
        active = done == 0
        ok_fire = active & (has > 0) & (fired > 0)
        emit = ok_fire & (complete > 0)
        out_ref[0, 0, k] = peak
        out_ref[0, 1, k] = emit.astype(jnp.int32)
        miss = (emit & (succ < 0)) | (active & (nc > 0))
        ndone = jnp.where(
            active & ((has == 0) | (fired == 0)
                      | (ok_fire & (complete == 0)) | miss),
            1, done)
        advance = emit & (succ >= 0)
        return (jnp.where(advance, succ, i), ndone,
                jnp.where(miss, 1, bad))

    _i, _done, bad = jax.lax.fori_loop(
        0, max_frames, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
    out_ref[0, 2, 0] = bad


def _walk(fields, max_frames: int, interpret: bool):
    b, _, c1 = fields.shape
    out = pl.pallas_call(
        functools.partial(_ask_walk_kernel, max_frames=max_frames),
        out_shape=jax.ShapeDtypeStruct((b, 3, max(max_frames, 4)),
                                       jnp.int32),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 6, c1), lambda bb: (bb, 0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 3, max(max_frames, 4)),
                               lambda bb: (bb, 0, 0),
                               memory_space=pltpu.SMEM),
        interpret=interpret,
    )(fields)
    peaks = out[:, 0, :max_frames]
    fire_ok = out[:, 1, :max_frames].astype(bool)
    bad = out[:, 2, 0] > 0
    return peaks, fire_ok, bad


def demodulate_spec(
    cfg: AskConfig,
    rx: jax.Array,                 # f32[B, T]
    max_frames: int = 128,
    n_cand: int = 96,
    chain_window: int = 512,     # must be a multiple of _R; 512 stays
    #                              conformant with decisions equal to
    #                              1024 on every probed track (r5), and
    #                              the chain arrays are phase_b's bulk
    interpret: bool = False,
):
    """Batched speculative ASK demod.  Returns ``(AskDecoded[B, K],
    ok[B])``; rows with ``ok=False`` (candidate-table overflow, a
    warmup-region fire the successor table cannot represent, or a chain
    unresolved inside `chain_window`) must be re-decoded with the exact
    scan receiver — :func:`trackmaker_tpu.phy.ask.demodulate_fast` does
    this automatically.  On conformant rows results equal the scan
    receiver slot-for-slot (a chain that fires inside the smaller
    window fires identically in the scan's 4096 window: the window
    values are a prefix).

    ``TM_ASK_DENSE=0`` (read at trace time — set before process start)
    falls back from the dense demod post-pass to the per-slot window
    demod; escape hatch / A-B switch for on-chip profiling."""
    from trackmaker_tpu.phy.pallas_decode import _extract_candidates
    rx = jnp.asarray(rx, jnp.float32)
    assert rx.ndim == 2
    b, t = rx.shape

    def analyze(row):
        power, sync, upd_ok = ask.dense_arrays(cfg, row)
        hits = dense_fire_candidates(cfg, sync, upd_ok,
                                     interpret=interpret)
        cand, _nv, overflow = _extract_candidates(
            hits, n_cand, rpb=8)
        virt = jnp.full((1,), -(cfg.frame_samples + 1), jnp.int32)
        cand_full = jnp.concatenate([virt, cand])
        fields, rx_pad = _phase_b(cfg, row, power, sync, upd_ok,
                                  cand_full, chain_window,
                                  interpret=interpret)
        return fields, rx_pad, overflow

    fields, rx_pads, overflow = jax.vmap(analyze)(rx)
    peaks, fire_ok, bad = _walk(fields, max_frames, interpret)

    import os
    if (ask._demod_dense_tables_np(cfg) is not None
            and os.environ.get("TM_ASK_DENSE", "1") != "0"):
        # dense demod: two 30-tap sliding dots per capture + a strided
        # pick per slot, replacing the doubly-vmapped 4752-sample window
        # gather + [4752, 108] matmul (ask.py:demod_dense)
        _k, s_per, c_per = ask._demod_dense_tables_np(cfg)
        s_per = jnp.asarray(s_per)
        c_per = jnp.asarray(c_per)
        ds, dc = jax.vmap(lambda row: ask.demod_dense(cfg, row))(rx)
        res = jax.vmap(lambda d1, d2, pk, ok: ask.demod_slots_dense(
            cfg, d1, d2, s_per, c_per, pk, ok))(ds, dc, peaks, fire_ok)
    else:
        car, wts = ask.demod_tables(cfg)
        res = jax.vmap(lambda rp, pk, ok: jax.vmap(
            lambda p, o: ask.demod_slot(cfg, rp, car, wts, p, o)
        )(pk, ok))(rx_pads, peaks, fire_ok)
    return AskDecoded(**res), ~(overflow | bad)


demodulate_spec_jit = jax.jit(
    demodulate_spec,
    static_argnames=("cfg", "max_frames", "n_cand", "chain_window",
                     "interpret"))
