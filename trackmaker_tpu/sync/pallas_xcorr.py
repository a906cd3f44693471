"""Fused normalized cross-correlation as a Pallas TPU kernel.

This is the TPU equivalent of the reference's one hand-optimized kernel —
the AVX sliding dot product in ``src/phy/decoder.rs:381-417`` plus its
incremental window-energy recurrence (decoder.rs:224-233).  Design:

* Output lags are tiled ``BLK`` per grid step, ``nb = BLK/128`` sublane
  rows of 128 lags each.
* The window dot products for a 128-lag row are one row of a small
  matmul: ``X (nb, SEG) @ P (SEG, 128)`` where row ``b`` of X is the
  contiguous slab ``x[128b : 128b+SEG]`` and ``P[s, r] = p[s - r]`` is the
  banded (Toeplitz) pattern matrix.  This maps the whole sliding
  correlation onto the MXU instead of the VPU shift-and-add.
* The sliding window *energy* uses the same X with a banded 0/1 matrix —
  a second matmul on X² — and the normalization + low-energy clamp is a
  fused epilogue, so x is read from HBM exactly once (the XLA fallback in
  ``sync.correlate`` reads it at least twice).
* Block overlap (windows crossing the tile edge) is handled by passing a
  second, shifted view of x — Pallas double-buffers both streams; no
  manual DMA needed.

FLOPs: 2·T·SEG vs the ideal 2·T·L (SEG = L rounded up to 128 + 128);
for the PHY preambles (L = 60..96, SEG = 256) the MXU shrugs.
"""

from __future__ import annotations

import functools
import os as _os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Lag-tile grid steps are independent (each writes its own hit rows),
# so declare the grid dim PARALLEL — lets Mosaic overlap steps instead
# of strict sequencing.  Env-gated for on-chip A/B.
_XC_PARALLEL = _os.environ.get("TM_XC_PAR", "1") == "1"


def _xc_params(ndim: int = 1):
    if not _XC_PARALLEL:
        return None
    return pltpu.CompilerParams(
        dimension_semantics=(pltpu.PARALLEL,) * ndim)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _thin_x1_spec(nb: int, nch: int, bc: int | None = None):
    """Block spec for the shifted x1 stream: the kernels only read the
    nch rows spilling past the tile edge, so stream just those — a
    full next-block stream doubles the kernel's HBM traffic (measured
    on the flagship xcorr stage, r4).  Falls back to the full block
    when nb isn't a multiple of the (8-padded) thin height — Mosaic
    requires sublane block dims divisible by 8, and the index map must
    land on block-shape multiples.  `bc` switches to the batched
    (capture-folded) 3-D form."""
    nthin = _round_up(nch, 8)
    if nb % nthin == 0:
        k = nb // nthin
        if bc is not None:
            return pl.BlockSpec((bc, nthin, 128),
                                lambda ib, i: (ib, (i + 1) * k, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((nthin, 128), lambda i: ((i + 1) * k, 0),
                            memory_space=pltpu.VMEM)
    if bc is not None:
        return pl.BlockSpec((bc, nb, 128),
                            lambda ib, i: (ib, i + 1, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((nb, 128), lambda i: (i + 1, 0),
                        memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=32)
def _banded_mats(pattern_key, seg: int) -> tuple[np.ndarray, np.ndarray]:
    p = np.asarray(pattern_key, dtype=np.float32)
    l = len(p)
    s = np.arange(seg)[:, None]
    r = np.arange(128)[None, :]
    j = s - r
    ok = (j >= 0) & (j < l)
    pmat = np.where(ok, p[np.clip(j, 0, l - 1)], 0.0).astype(np.float32)
    emat = ok.astype(np.float32)
    return pmat, emat


def _xcorr_kernel(x0_ref, x1_ref, pmat_ref, emat_ref, out_ref,
                  *, blk: int, seg: int, inv_pe: float,
                  eps: float, normalize: bool, scale: float,
                  use_bf16: bool):
    nb = blk // 128
    nch = seg // 128
    # Row b of X is the slab x[128b : 128b+seg]; rather than nb
    # slice+stack ops (which dominate the kernel at large blk), split
    # the contraction over the seg axis: X @ P = sum_k R[k:k+nb] @
    # P[128k:128k+128] where R is the row-major (rows, 128) view of x —
    # delivered directly by the block specs as a sublane concat (an
    # in-kernel (1, blk+seg) -> (rows, 128) reshape is a full
    # cross-lane relayout per grid step and dominated the kernel).
    # x1 is a THIN block: just the nch spill rows past the tile edge
    # (a full next-block stream doubled the kernel's HBM traffic, r4;
    # _thin_x1 falls back to a full block when nb % nch != 0).
    r = jnp.concatenate([x0_ref[:, :], x1_ref[:nch, :]], axis=0)
    sq = r * r if normalize else None
    dot = jnp.zeros((nb, 128), jnp.float32)
    energy = jnp.zeros((nb, 128), jnp.float32)
    for k in range(nch):
        rk = r[k:k + nb]
        if use_bf16:
            # pattern entries (±1/0 scaled) are bf16-exact; x loses ~8
            # bits of mantissa — fine for detection, not for
            # oracle-exactness at the threshold boundary. Opt-in.
            dot = dot + jnp.dot(
                rk.astype(jnp.bfloat16),
                pmat_ref[128 * k:128 * (k + 1), :].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
            if normalize:
                energy = energy + jnp.dot(
                    sq[k:k + nb].astype(jnp.bfloat16),
                    emat_ref[128 * k:128 * (k + 1), :].astype(
                        jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        else:
            dot = dot + jnp.dot(
                rk, pmat_ref[128 * k:128 * (k + 1), :],
                preferred_element_type=jnp.float32)
            if normalize:
                energy = energy + jnp.dot(
                    sq[k:k + nb], emat_ref[128 * k:128 * (k + 1), :],
                    preferred_element_type=jnp.float32)
    if normalize:
        denom = jax.lax.rsqrt(jnp.maximum(energy, 1e-30)) * inv_pe
        corr = jnp.where(energy < eps, 0.0, dot * denom)
    else:
        corr = dot * scale
    out_ref[:, :] = corr                                  # (nb, 128)


_BIGI = np.int32(2**30)


def _xcorr_hits_kernel(x0_ref, x1_ref, pmat_ref, emat_ref, *out_refs,
                       blk: int, seg: int, inv_pe: float,
                       eps: float, threshold: float, n_lags: int,
                       rpb: int, use_bf16: bool, emit_corr: bool):
    """Row-major formulation: inputs arrive as (rows, 128) blocks, so
    building the shifted-view operand is a sublane CONCAT instead of
    the (1, blk+seg) -> (rows, 128) reshape — that reshape is a full
    cross-lane relayout of the block per grid step and dominated the
    kernel (measured ~10 us/step vs ~0.2 us of MXU work)."""
    nb = blk // 128
    nch = seg // 128
    r = jnp.concatenate([x0_ref[:, :], x1_ref[:nch, :]], axis=0)
    sq = r * r
    dot = jnp.zeros((nb, 128), jnp.float32)
    energy = jnp.zeros((nb, 128), jnp.float32)
    for k in range(nch):
        rk = r[k:k + nb]
        if use_bf16:
            dot = dot + jnp.dot(
                rk.astype(jnp.bfloat16),
                pmat_ref[128 * k:128 * (k + 1), :].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
            energy = energy + jnp.dot(
                sq[k:k + nb].astype(jnp.bfloat16),
                emat_ref[128 * k:128 * (k + 1), :].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
        else:
            dot = dot + jnp.dot(
                rk, pmat_ref[128 * k:128 * (k + 1), :],
                preferred_element_type=jnp.float32)
            energy = energy + jnp.dot(
                sq[k:k + nb], emat_ref[128 * k:128 * (k + 1), :],
                preferred_element_type=jnp.float32)
    denom = jax.lax.rsqrt(jnp.maximum(energy, 1e-30)) * inv_pe
    corr = jnp.where(energy < eps, 0.0, dot * denom)
    if emit_corr:
        out_ref, hits_ref = out_refs
        out_ref[:, :] = corr                              # (nb, 128)
    else:
        (hits_ref,) = out_refs

    # ---- fused hit extraction: up to `rpb` ascending hit positions
    # per 128-lag row + the row's true hit count + the correlation
    # VALUE at each hit (bitcast f32->i32; per-frame corr reporting
    # needs only these, so the dense corr array never has to be
    # written to HBM — set emit_corr=False).
    base = pl.program_id(0) * blk
    lane = jax.lax.broadcasted_iota(jnp.int32, (nb, 128), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (nb, 128), 0)
    pos = base + rowi * 128 + lane
    hit = (corr >= threshold) & (pos < n_lags)
    idxm = jnp.where(hit, lane, _BIGI)
    row_base = base + jax.lax.broadcasted_iota(
        jnp.int32, (nb, 1), 0) * 128
    for k in range(rpb):
        m = jnp.min(idxm, axis=1, keepdims=True)          # (nb, 1)
        hits_ref[:, k:k + 1] = jnp.where(m < _BIGI, row_base + m, _BIGI)
        v = jnp.sum(jnp.where(lane == m, corr, 0.0), axis=1,
                    keepdims=True)
        hits_ref[:, rpb + 1 + k:rpb + 2 + k] = \
            jax.lax.bitcast_convert_type(v, jnp.int32)
        idxm = jnp.where(lane > m, idxm, _BIGI)
    hits_ref[:, rpb:rpb + 1] = jnp.sum(
        hit.astype(jnp.int32), axis=1, keepdims=True)
    for k in range(2 * rpb + 1, 16):
        hits_ref[:, k:k + 1] = jnp.zeros((nb, 1), jnp.int32)


def pallas_xcorr_hits(
    samples: jax.Array,          # f32[T]
    pattern: np.ndarray,         # f32[L] (host constant)
    threshold: float,
    eps: float = 1e-6,
    blk: int = 8192,
    rpb: int = 4,
    interpret: bool = False,
    use_bf16: bool = False,
    emit_corr: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Normalized xcorr + fused threshold-hit extraction.

    Returns ``(corr[T-L+1], rows[ceil(T'/128), 16])`` where row r's
    columns 0..rpb-1 are the ascending absolute lag positions with
    ``corr >= threshold`` inside lag block [128r, 128r+128) (padded
    with 2^30), column rpb is the row's TRUE hit count (callers flag
    overflow when it exceeds rpb), and columns rpb+1..2*rpb are the
    f32 correlation values at those hits, bitcast to i32.  With
    ``emit_corr=False`` the dense correlation is never written to HBM
    (per-frame reporting only needs the per-hit values) and the first
    return is None.  This replaces the dense ``corr >= thr`` bitmap +
    block-peel extraction that re-read the full correlation from HBM
    (VERDICT round-2 item 4; see
    phy/pallas_decode.py:_compact_hit_rows for the host-side
    compaction).  Reference kernel anchor: src/phy/decoder.rs:381-417.
    """
    assert rpb <= 4
    pattern = np.asarray(pattern, np.float32)
    l = len(pattern)
    t = samples.shape[-1]
    seg = 128 + _round_up(max(l - 1, 1), 128)
    pmat, emat = _banded_mats(tuple(pattern.tolist()), seg)
    pe = float(np.sqrt(np.sum(pattern.astype(np.float64) ** 2)))

    t_pad = _round_up(max(t, blk), blk)
    grid = t_pad // blk
    nb = blk // 128
    nch = seg // 128
    # row-major view: (rows, 128); the tail pad covers the last
    # block's shifted x1 stream
    x_rows = jnp.pad(samples.astype(jnp.float32),
                     (0, t_pad + blk - t)).reshape(-1, 128)

    out_shape = [jax.ShapeDtypeStruct((t_pad // 128, 16), jnp.int32)]
    out_specs = [pl.BlockSpec((nb, 16), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    if emit_corr:
        out_shape.insert(0, jax.ShapeDtypeStruct((t_pad // 128, 128),
                                                 jnp.float32))
        out_specs.insert(0, pl.BlockSpec((nb, 128), lambda i: (i, 0),
                                         memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        functools.partial(_xcorr_hits_kernel, blk=blk, seg=seg,
                          inv_pe=1.0 / pe, eps=eps,
                          threshold=threshold, n_lags=t - l + 1,
                          rpb=rpb, use_bf16=use_bf16,
                          emit_corr=emit_corr),
        out_shape=out_shape,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((nb, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            _thin_x1_spec(nb, nch),
            pl.BlockSpec((seg, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((seg, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        cost_estimate=pl.CostEstimate(
            flops=4 * t_pad * seg, transcendentals=0,
            bytes_accessed=4 * (t_pad + 2 * seg * 128)),
        compiler_params=None if interpret else _xc_params(),
        interpret=interpret,
    )(x_rows, x_rows, jnp.asarray(pmat), jnp.asarray(emat))
    if emit_corr:
        corr, rows = outs
        return corr.reshape(-1)[: t - l + 1], rows
    return None, outs[0]


def _xcorr_hits_refine_kernel(vlen_ref, x0_ref, x1_ref, pmat_ref,
                              emat_ref, smat_ref, semat_ref, hits_ref,
                              *, blk: int, seg: int, seg_s: int,
                              inv_pe: float, sync_e: float, eps: float,
                              threshold: float, n_lags: int, rpb: int,
                              use_bf16: bool, sync_off: int, n_pos: int,
                              sync_len: int, fall_off: int):
    """:func:`_xcorr_hits_kernel` + a fused per-hit SYNC-WORD refine.

    The speculative attempt kernels used to spend 3 matmul issues + an
    argmax chain PER CANDIDATE refining the sync-word position
    (decoder.rs:158-217) — and their floor is op-issue cost, not FLOPs
    (0.80 us/candidate, half of it sequencer).  Here the sample tile is
    already VMEM-resident, so the sync-pattern correlation is two more
    banded matmuls on data the MXU is otherwise not using, and each
    extracted hit's refine is a masked argmax over its
    ``[pos+sync_off, pos+sync_off+n_pos)`` window — the refined frame
    start rides the hit row (lanes ``2*rpb+1..3*rpb``) into candidate
    compaction, and the attempt kernels start straight at body decode.

    Decision parity with the in-attempt refine: same normalized-corr
    formula (f32 ``sqrt`` division, NOT the dense path's ``rsqrt``
    approximation), same ``> -1.0`` all-invalid fallback to
    ``pos + fall_off``, same ascending-position tie-break, same
    ``pos_k <= vlen - sync_len`` validity rule (``vlen`` is a
    per-capture scalar-prefetch operand).  Sync matmuls stay f32 even
    under ``use_bf16`` — the refine argmax feeds decode decisions.
    """
    nb = blk // 128
    nch = seg // 128
    nchs = seg_s // 128
    vlen = vlen_ref[pl.program_id(0)]
    r = jnp.concatenate([x0_ref[0], x1_ref[0, :nch]], axis=0)
    sq = r * r
    dot = jnp.zeros((nb, 128), jnp.float32)
    energy = jnp.zeros((nb, 128), jnp.float32)
    for k in range(nch):
        rk = r[k:k + nb]
        if use_bf16:
            dot = dot + jnp.dot(
                rk.astype(jnp.bfloat16),
                pmat_ref[128 * k:128 * (k + 1), :].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
            energy = energy + jnp.dot(
                sq[k:k + nb].astype(jnp.bfloat16),
                emat_ref[128 * k:128 * (k + 1), :].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
        else:
            dot = dot + jnp.dot(
                rk, pmat_ref[128 * k:128 * (k + 1), :],
                preferred_element_type=jnp.float32)
            energy = energy + jnp.dot(
                sq[k:k + nb], emat_ref[128 * k:128 * (k + 1), :],
                preferred_element_type=jnp.float32)
    denom = jax.lax.rsqrt(jnp.maximum(energy, 1e-30)) * inv_pe
    corr = jnp.where(energy < eps, 0.0, dot * denom)

    # dense sync-word corr with ONE extra row so refine windows of
    # hits in the tile's last 128-lag row stay in-tile
    sdot = jnp.zeros((nb + 1, 128), jnp.float32)
    sen = jnp.zeros((nb + 1, 128), jnp.float32)
    for k in range(nchs):
        sdot = sdot + jnp.dot(
            r[k:k + nb + 1], smat_ref[128 * k:128 * (k + 1), :],
            preferred_element_type=jnp.float32)
        sen = sen + jnp.dot(
            sq[k:k + nb + 1], semat_ref[128 * k:128 * (k + 1), :],
            preferred_element_type=jnp.float32)
    base = pl.program_id(1) * blk
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (nb + 1, 128), 1)
    rowi1 = jax.lax.broadcasted_iota(jnp.int32, (nb + 1, 128), 0)
    lagp = base + rowi1 * 128 + lane1
    scc = jnp.where(sen > 1e-6, sdot / (jnp.sqrt(sen) * sync_e), 0.0)
    scc = jnp.where(lagp <= vlen - sync_len, scc, -jnp.inf)
    sa = scc[0:nb]
    sb = scc[1:nb + 1]

    lane = jax.lax.broadcasted_iota(jnp.int32, (nb, 128), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (nb, 128), 0)
    pos = base + rowi * 128 + lane
    hit = (corr >= threshold) & (pos < n_lags)
    idxm = jnp.where(hit, lane, _BIGI)
    row_base = base + jax.lax.broadcasted_iota(
        jnp.int32, (nb, 1), 0) * 128
    for k in range(rpb):
        m = jnp.min(idxm, axis=1, keepdims=True)          # (nb, 1)
        hits_ref[0, :, k:k + 1] = jnp.where(
            m < _BIGI, row_base + m, _BIGI)
        v = jnp.sum(jnp.where(lane == m, corr, 0.0), axis=1,
                    keepdims=True)
        hits_ref[0, :, rpb + 1 + k:rpb + 2 + k] = \
            jax.lax.bitcast_convert_type(v, jnp.int32)
        # per-hit sync refine over the row pair (window lanes reach
        # 127 + sync_off + n_pos - 1 < 256); ties resolve to the
        # lowest position, row a before row b
        lo = m + sync_off
        hi = lo + n_pos
        wa = jnp.where((lane >= lo) & (lane < hi), sa, -jnp.inf)
        wb = jnp.where((lane + 128 >= lo) & (lane + 128 < hi),
                       sb, -jnp.inf)
        ma_ = jnp.max(wa, axis=1, keepdims=True)
        mb_ = jnp.max(wb, axis=1, keepdims=True)
        ba = jnp.argmax(wa, axis=1)[:, None].astype(jnp.int32)
        bb = jnp.argmax(wb, axis=1)[:, None].astype(jnp.int32) + 128
        bm = jnp.maximum(ma_, mb_)
        bl = jnp.where(ma_ >= mb_, ba, bb)
        # store fs as a DELTA from the hit position (in [sync_off +
        # sync_len, fall_off + n_pos)): small enough that candidate
        # compaction picks it with one exact f32 einsum instead of the
        # 16-bit-halves pair an absolute i32 position needs
        hits_ref[0, :, 2 * rpb + 1 + k:2 * rpb + 2 + k] = jnp.where(
            bm > -1.0, bl - m + sync_len, fall_off)
        idxm = jnp.where(lane > m, idxm, _BIGI)
    hits_ref[0, :, rpb:rpb + 1] = jnp.sum(
        hit.astype(jnp.int32), axis=1, keepdims=True)
    for k in range(3 * rpb + 1, 16):
        hits_ref[0, :, k:k + 1] = jnp.zeros((nb, 1), jnp.int32)


def pallas_xcorr_hits_refine(
    samples: jax.Array,          # f32[B, T]
    vlens: jax.Array,            # i32[B] valid lengths (refine rule)
    pattern: np.ndarray,         # f32[L] preamble (host constant)
    sync_pattern: np.ndarray,    # f32[W] sync word (host constant)
    threshold: float,
    *,
    sync_off: int,               # refine window start rel. to the hit
    n_pos: int,                  # refine window width (2*margin + 1)
    sync_len: int,               # sync-word length W
    fall_off: int,               # all-invalid fs fallback (preamble_len)
    eps: float = 1e-6,
    blk: int = 32768,
    rpb: int = 4,
    interpret: bool = False,
    use_bf16: bool = False,
) -> jax.Array:
    """Batched hit extraction + fused per-hit sync refine.

    Returns ``rows[B, ceil(T'/128), 16]`` — the
    :func:`pallas_xcorr_hits` row contract plus lanes
    ``2*rpb+1..3*rpb`` carrying each hit's refined frame start as a
    small DELTA from the hit position (refined fs = pos + delta; i32
    end-to-end, so flat long captures past 2^24 samples never round
    through f32).  Explicit (capture, lag-tile) grid rather than vmap
    so ``vlens`` rides scalar prefetch."""
    assert rpb <= 4
    pattern = np.asarray(pattern, np.float32)
    spat = np.asarray(sync_pattern, np.float32)
    l = len(pattern)
    b, t = samples.shape
    seg = 128 + _round_up(max(l - 1, 1), 128)
    seg_s = 128 + _round_up(max(len(spat) - 1, 1), 128)
    assert seg_s <= seg, "sync word longer than preamble pattern"
    assert 127 + sync_off + n_pos <= 256, "refine window exceeds row pair"
    pmat, emat = _banded_mats(tuple(pattern.tolist()), seg)
    smat, semat = _banded_mats(tuple(spat.tolist()), seg_s)
    pe = float(np.sqrt(np.sum(pattern.astype(np.float64) ** 2)))
    se = float(np.sqrt(np.sum(spat.astype(np.float64) ** 2)))

    t_pad = _round_up(max(t, blk), blk)
    grid = (b, t_pad // blk)
    nb = blk // 128
    nch = seg // 128
    x_rows = jnp.pad(samples.astype(jnp.float32),
                     ((0, 0), (0, t_pad + blk - t))).reshape(b, -1, 128)

    nthin = _round_up(nch, 8)
    if nb % nthin == 0:
        kk = nb // nthin
        x1_spec = pl.BlockSpec((1, nthin, 128),
                               lambda ib, i, *_: (ib, (i + 1) * kk, 0),
                               memory_space=pltpu.VMEM)
    else:
        x1_spec = pl.BlockSpec((1, nb, 128),
                               lambda ib, i, *_: (ib, i + 1, 0),
                               memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, nb, 128), lambda ib, i, *_: (ib, i, 0),
                         memory_space=pltpu.VMEM),
            x1_spec,
            pl.BlockSpec((seg, 128), lambda ib, i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((seg, 128), lambda ib, i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((seg_s, 128), lambda ib, i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((seg_s, 128), lambda ib, i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nb, 16), lambda ib, i, *_: (ib, i, 0),
                               memory_space=pltpu.VMEM),
    )
    rows = pl.pallas_call(
        functools.partial(_xcorr_hits_refine_kernel, blk=blk, seg=seg,
                          seg_s=seg_s, inv_pe=1.0 / pe, sync_e=se,
                          eps=eps, threshold=threshold,
                          n_lags=t - l + 1, rpb=rpb, use_bf16=use_bf16,
                          sync_off=sync_off, n_pos=n_pos,
                          sync_len=sync_len, fall_off=fall_off),
        out_shape=jax.ShapeDtypeStruct((b, t_pad // 128, 16), jnp.int32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * t_pad * (seg + seg_s), transcendentals=0,
            bytes_accessed=4 * (b * t_pad + 2 * (seg + seg_s) * 128)),
        compiler_params=None if interpret else _xc_params(ndim=2),
        interpret=interpret,
    )(jnp.asarray(vlens, jnp.int32), x_rows, x_rows,
      jnp.asarray(pmat), jnp.asarray(emat),
      jnp.asarray(smat), jnp.asarray(semat))
    return rows


def _xcorr_hits_kernel_b(x0_ref, x1_ref, pmat_ref, emat_ref, hits_ref,
                         *, bc: int, blk: int, seg: int, inv_pe: float,
                         eps: float, threshold: float, n_lags: int,
                         rpb: int, use_bf16: bool):
    """Batch-folded variant of :func:`_xcorr_hits_kernel`: one grid
    step covers `bc` captures x `blk` lags, so the fixed per-step cost
    (grid bookkeeping + DMA round-trips) amortizes across the batch —
    the vmapped 1-capture kernel floored at ~1.7 us/step no matter the
    tile size (its no-op same-grid twin measured 0.74 ms for 13.9M
    samples; VERDICT r3 weakness 1)."""
    nb = blk // 128
    nch = seg // 128
    base = pl.program_id(1) * blk
    lane = jax.lax.broadcasted_iota(jnp.int32, (nb, 128), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (nb, 128), 0)
    pos = base + rowi * 128 + lane
    row_base = base + jax.lax.broadcasted_iota(
        jnp.int32, (nb, 1), 0) * 128
    for c in range(bc):
        r = jnp.concatenate([x0_ref[c], x1_ref[c, :nch]], axis=0)
        sq = r * r
        dot = jnp.zeros((nb, 128), jnp.float32)
        energy = jnp.zeros((nb, 128), jnp.float32)
        for k in range(nch):
            rk = r[k:k + nb]
            if use_bf16:
                dot = dot + jnp.dot(
                    rk.astype(jnp.bfloat16),
                    pmat_ref[128 * k:128 * (k + 1), :].astype(
                        jnp.bfloat16),
                    preferred_element_type=jnp.float32)
                energy = energy + jnp.dot(
                    sq[k:k + nb].astype(jnp.bfloat16),
                    emat_ref[128 * k:128 * (k + 1), :].astype(
                        jnp.bfloat16),
                    preferred_element_type=jnp.float32)
            else:
                dot = dot + jnp.dot(
                    rk, pmat_ref[128 * k:128 * (k + 1), :],
                    preferred_element_type=jnp.float32)
                energy = energy + jnp.dot(
                    sq[k:k + nb], emat_ref[128 * k:128 * (k + 1), :],
                    preferred_element_type=jnp.float32)
        denom = jax.lax.rsqrt(jnp.maximum(energy, 1e-30)) * inv_pe
        corr = jnp.where(energy < eps, 0.0, dot * denom)
        hit = (corr >= threshold) & (pos < n_lags)
        idxm = jnp.where(hit, lane, _BIGI)
        for k in range(rpb):
            m = jnp.min(idxm, axis=1, keepdims=True)      # (nb, 1)
            hits_ref[c, :, k:k + 1] = jnp.where(
                m < _BIGI, row_base + m, _BIGI)
            v = jnp.sum(jnp.where(lane == m, corr, 0.0), axis=1,
                        keepdims=True)
            hits_ref[c, :, rpb + 1 + k:rpb + 2 + k] = \
                jax.lax.bitcast_convert_type(v, jnp.int32)
            idxm = jnp.where(lane > m, idxm, _BIGI)
        hits_ref[c, :, rpb:rpb + 1] = jnp.sum(
            hit.astype(jnp.int32), axis=1, keepdims=True)
        for k in range(2 * rpb + 1, 16):
            hits_ref[c, :, k:k + 1] = jnp.zeros((nb, 1), jnp.int32)


def pallas_xcorr_hits_batched(
    samples: jax.Array,          # f32[B, T]
    pattern: np.ndarray,         # f32[L] (host constant)
    threshold: float,
    eps: float = 1e-6,
    blk: int = 16384,
    rpb: int = 4,
    bc: int = 8,
    interpret: bool = False,
    use_bf16: bool = False,
) -> jax.Array:
    """Batched normalized xcorr + fused hit extraction over a (bc,
    lag-tile) 2-D grid.  Returns ``rows[B, ceil(T'/128), 16]`` with the
    same per-row contract as :func:`pallas_xcorr_hits` (emit_corr=False
    form).  Decision-identical to the vmapped 1-capture kernel
    (pinned by tests/test_pallas_xcorr.py).  MEASURED SLOWER than the
    vmapped kernel on the flagship shape (1.14 vs 2.40 ms at batch 32,
    tools/prof_xcorr_b.py r4 sweep — Mosaic schedules many small steps
    better than a bc-unrolled body), so the decode path uses the
    vmapped form; kept for shapes where the per-step fixed cost
    dominates (short captures, tiny batches)."""
    assert rpb <= 4
    pattern = np.asarray(pattern, np.float32)
    l = len(pattern)
    b, t = samples.shape
    seg = 128 + _round_up(max(l - 1, 1), 128)
    pmat, emat = _banded_mats(tuple(pattern.tolist()), seg)
    pe = float(np.sqrt(np.sum(pattern.astype(np.float64) ** 2)))

    bc = min(bc, b)
    b_pad = _round_up(b, bc)
    t_pad = _round_up(max(t, blk), blk)
    grid = (b_pad // bc, t_pad // blk)
    nb = blk // 128
    nch = seg // 128
    x_rows = jnp.pad(samples.astype(jnp.float32),
                     ((0, b_pad - b), (0, t_pad + blk - t))
                     ).reshape(b_pad, -1, 128)

    rows = pl.pallas_call(
        functools.partial(_xcorr_hits_kernel_b, bc=bc, blk=blk, seg=seg,
                          inv_pe=1.0 / pe, eps=eps, threshold=threshold,
                          n_lags=t - l + 1, rpb=rpb, use_bf16=use_bf16),
        out_shape=jax.ShapeDtypeStruct((b_pad, t_pad // 128, 16),
                                       jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bc, nb, 128), lambda ib, i: (ib, i, 0),
                         memory_space=pltpu.VMEM),
            _thin_x1_spec(nb, nch, bc=bc),
            pl.BlockSpec((seg, 128), lambda ib, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((seg, 128), lambda ib, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bc, nb, 16), lambda ib, i: (ib, i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b_pad * t_pad * seg, transcendentals=0,
            bytes_accessed=4 * (b_pad * t_pad + 2 * seg * 128)),
        interpret=interpret,
    )(x_rows, x_rows, jnp.asarray(pmat), jnp.asarray(emat))
    return rows[:b]


def _xcorr_rowstats_kernel(x0_ref, x1_ref, pmat_ref, emat_ref,
                           stats_ref, *, blk: int, seg: int,
                           inv_pe: float, eps: float, n_lags: int,
                           use_bf16: bool):
    """Normalized xcorr + per-128-lag-row (max, argmax) epilogue — the
    dense correlation never leaves VMEM.  Built for anchor search
    (dsp/equalizer.py): the old path wrote the full corr to HBM and
    peeled argmaxes over it (write T + 4x(read T + write T) HBM sweeps
    + 9 dispatches); this emits 16 i32 per 128 lags in ONE pass.
    stats row r: col 0 = bitcast f32 max corr in lag row r, col 1 =
    absolute lag position of that max (first-max tie rule), rest 0."""
    nb = blk // 128
    nch = seg // 128
    r = jnp.concatenate([x0_ref[:, :], x1_ref[:nch, :]], axis=0)
    sq = r * r
    dot = jnp.zeros((nb, 128), jnp.float32)
    energy = jnp.zeros((nb, 128), jnp.float32)
    for k in range(nch):
        rk = r[k:k + nb]
        if use_bf16:
            dot = dot + jnp.dot(
                rk.astype(jnp.bfloat16),
                pmat_ref[128 * k:128 * (k + 1), :].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
            energy = energy + jnp.dot(
                sq[k:k + nb].astype(jnp.bfloat16),
                emat_ref[128 * k:128 * (k + 1), :].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
        else:
            dot = dot + jnp.dot(
                rk, pmat_ref[128 * k:128 * (k + 1), :],
                preferred_element_type=jnp.float32)
            energy = energy + jnp.dot(
                sq[k:k + nb], emat_ref[128 * k:128 * (k + 1), :],
                preferred_element_type=jnp.float32)
    denom = jax.lax.rsqrt(jnp.maximum(energy, 1e-30)) * inv_pe
    corr = jnp.where(energy < eps, 0.0, dot * denom)

    base = pl.program_id(0) * blk
    lane = jax.lax.broadcasted_iota(jnp.int32, (nb, 128), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (nb, 128), 0)
    pos = base + rowi * 128 + lane
    cm = jnp.where(pos < n_lags, corr, -jnp.inf)
    mx = jnp.max(cm, axis=1, keepdims=True)               # (nb, 1)
    is_mx = cm >= mx                                      # ties -> all
    amx = jnp.min(jnp.where(is_mx, lane, 128), axis=1,
                  keepdims=True)                          # first max
    row_base = base + jax.lax.broadcasted_iota(
        jnp.int32, (nb, 1), 0) * 128
    stats_ref[:, 0:1] = jax.lax.bitcast_convert_type(
        jnp.where(jnp.isfinite(mx), mx, jnp.float32(-3.4e38)), jnp.int32)
    stats_ref[:, 1:2] = row_base + jnp.minimum(amx, 127)
    for k in range(2, 16):
        stats_ref[:, k:k + 1] = jnp.zeros((nb, 1), jnp.int32)


def pallas_xcorr_rowstats(
    samples: jax.Array,          # f32[T]
    pattern: np.ndarray,         # f32[L] (host constant)
    eps: float = 1e-6,
    blk: int = 16384,
    interpret: bool = False,
    use_bf16: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """(rowmax f32[R], rowpos i32[R]) per 128-lag row, R = ceil(T/128).

    One fused pass; rows fully past the valid lag range carry -3.4e38
    so a host/XLA top-k peel over the R-length vectors (R ~ T/128) can
    never pick them.  See _xcorr_rowstats_kernel."""
    pattern = np.asarray(pattern, np.float32)
    l = len(pattern)
    t = samples.shape[-1]
    seg = 128 + _round_up(max(l - 1, 1), 128)
    pmat, emat = _banded_mats(tuple(pattern.tolist()), seg)
    pe = float(np.sqrt(np.sum(pattern.astype(np.float64) ** 2)))

    t_pad = _round_up(max(t, blk), blk)
    grid = t_pad // blk
    nb = blk // 128
    nch = seg // 128
    x_rows = jnp.pad(samples.astype(jnp.float32),
                     (0, t_pad + blk - t)).reshape(-1, 128)

    stats = pl.pallas_call(
        functools.partial(_xcorr_rowstats_kernel, blk=blk, seg=seg,
                          inv_pe=1.0 / pe, eps=eps,
                          n_lags=t - l + 1, use_bf16=use_bf16),
        out_shape=jax.ShapeDtypeStruct((t_pad // 128, 16), jnp.int32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((nb, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            _thin_x1_spec(nb, nch),
            pl.BlockSpec((seg, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((seg, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, 16), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * t_pad * seg, transcendentals=0,
            bytes_accessed=4 * (t_pad + 2 * seg * 128)),
        compiler_params=None if interpret else _xc_params(),
        interpret=interpret,
    )(x_rows, x_rows, jnp.asarray(pmat), jnp.asarray(emat))
    rowmax = jax.lax.bitcast_convert_type(stats[:, 0], jnp.float32)
    return rowmax, stats[:, 1]


def pallas_normalized_xcorr(
    samples: jax.Array,          # f32[T]
    pattern: np.ndarray,         # f32[L] (host constant)
    eps: float = 1e-6,
    blk: int = 8192,
    interpret: bool = False,
    normalize: bool = True,
    scale: float = 1.0,
    full_length: bool = False,
    use_bf16: bool = False,
) -> jax.Array:
    """corr[i] = dot(x[i:i+L],p) / (||x[i:i+L]||·||p||), low-energy -> 0.

    Matches :func:`trackmaker_tpu.sync.correlate.normalized_xcorr`
    (returns T-L+1 lags).  With ``normalize=False`` returns the raw
    sliding dot product times ``scale`` (the ASK receiver's
    ``sync_power``).  ``full_length=True`` returns all T lags (tail
    windows read zero padding).
    """
    pattern = np.asarray(pattern, np.float32)
    l = len(pattern)
    t = samples.shape[-1]
    seg = 128 + _round_up(max(l - 1, 1), 128)
    pmat, emat = _banded_mats(tuple(pattern.tolist()), seg)
    pe = float(np.sqrt(np.sum(pattern.astype(np.float64) ** 2)))

    t_pad = _round_up(max(t, blk), blk)
    grid = t_pad // blk
    nb = blk // 128
    nch = seg // 128
    # row-major view (see _xcorr_kernel); x0 stream: rows of block i;
    # x1 stream: the next whole block (the kernel reads its first nch
    # rows — same input traffic as the pre-row-major design)
    x_rows = jnp.pad(samples.astype(jnp.float32),
                     (0, t_pad + blk - t)).reshape(-1, 128)

    out = pl.pallas_call(
        functools.partial(_xcorr_kernel, blk=blk, seg=seg,
                          inv_pe=1.0 / pe, eps=eps,
                          normalize=normalize, scale=scale,
                          use_bf16=use_bf16),
        out_shape=jax.ShapeDtypeStruct((t_pad // 128, 128), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((nb, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            _thin_x1_spec(nb, nch),
            pl.BlockSpec((seg, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((seg, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * t_pad * seg, transcendentals=0,
            bytes_accessed=4 * (t_pad + 2 * seg * 128)),
        interpret=interpret,
    )(x_rows, x_rows, jnp.asarray(pmat), jnp.asarray(emat))
    return out.reshape(-1)[: t if full_length else t - l + 1]
