"""Speculative batched PHY decode: Pallas attempt kernel + scalar walk.

Round-2 profiling on the real chip showed the two-phase decoder's cost
is NOT compute: the per-step ops inside the consumption `lax.scan`
(sync-refine window stack, header decode) each cost ~30-60us of
dispatch, and XLA lowers vmapped `dynamic_slice` window gathers to
catastrophically slow gather ops (19 ms for 128 windows x 32 captures
vs <1 ms of actual HBM traffic).  This module restructures decoding so
neither appears on the hot path:

1. *Candidate extraction* (XLA, dense): every correlation hit becomes a
   candidate — per-512-block argmax peel (no `nonzero`, no sort) +
   rank/one-hot compaction into a sorted list of up to `C` positions.
   More hits than `C` (or more than `RPB` per block) sets an overflow
   flag -> the caller falls back to the exact scan path.

2. *Attempt kernel* (Pallas, grid over captures): for each candidate,
   one double-buffered DMA pulls a (36, 384)-row slab from HBM (384
   samples = 3 DMA-aligned lanes of 128 = exactly 8 Manchester bytes =
   64 bits, so byte/bit boundaries land on fixed row offsets with no
   in-kernel reshape); the +/-1-bit sync-word realignment
   (decoder.rs:158-217) and the full Manchester frame decode
   (decoder.rs:242-331) are banded-Toeplitz matmuls on the MXU, with
   the arbitrary sample offset handled by dynamically slicing
   precomputed offset tables along sublanes.

3. *Epilogue* (XLA, dense): header fields, length sanity, destination
   filter and CRC8 — the CRC uses a fixed-length GF(2) matmul plus a
   zero-append inverse correction (bitops.crc8_bits_fixed_unzero), so
   no dynamic roll/gather.

4. *Walk kernel* (Pallas, grid over captures): the sequential
   consumption walk over the candidate list runs as one SMEM scalar
   loop — replacing the dispatch-bound `lax.scan` (~4-6 ms) with a
   single kernel launch.  The walk replays decoder.rs:242-356's cursor
   decisions exactly; because EVERY hit is in the candidate table (not
   just run starts), mid-run cursor landings are handled exactly and no
   conformance check is needed — only candidate overflow forces the
   exact path.

Two attempt kernels share the architecture: Manchester (byte = 48
samples) and 4B5B+NRZI (byte = 30 samples; level sums via banded
matmuls, NRZI transitions as lane-shifted products, the 4B5B inverse
table as 32 iota-compare selects — near-zero level averages are
conformance-flagged since the optimistic transition rule ignores the
reference's last-valid-average carry, line_coding.rs:265-269).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# DMA pipeline depth for the attempt kernels (slabs in flight).  With
# 1-slot lookahead every iteration stalled on HBM round-trip latency
# (~760 ns/candidate measured); deeper pipelines hide it behind the
# previous candidates' compute.  Env-tunable for on-chip A/B.
ATTEMPT_PIPE = max(2, int(_os.environ.get("TM_ATTEMPT_PIPE", "4")))

# Sync-refine fold: the xcorr kernel computes the dense sync-word
# correlation on its VMEM-resident tiles and refines each hit's frame
# start in its epilogue, so the attempt kernels skip their per-candidate
# refine (3 matmul issues + argmax chain — and their floor is op-issue
# cost).  Module-level so tests can flip it (bool); env values "1"/"0"
# force it.  Default legacy (in-attempt refine) everywhere: it measured
# ~18% faster on the flagship shape (r5 on-chip A/B: 3.62 vs 4.40 ms),
# and since the attempt kernels stash the refine DELTA (not the
# absolute position) through their f32 lane, legacy is integer-exact at
# ANY capture length — the old 2^24 limit that used to force fold on
# flat 600 s captures is gone (r5).
SYNC_FOLD = _os.environ.get("TM_SYNC_FOLD", "auto")


def _resolve_fold(t: int) -> bool:
    """Fold decision for a capture/flat length of `t` samples (trace
    time, static).  Honors bools poked by tests (`pd.SYNC_FOLD = True`)
    and forced env values; "auto" = legacy at every length (the delta
    stash is exact everywhere, and legacy wins the on-chip A/B)."""
    sf = SYNC_FOLD
    if isinstance(sf, bool):
        return sf
    if sf == "auto":
        return False
    return sf == "1"

from trackmaker_tpu.core import bitops
from trackmaker_tpu.core.config import (
    FOUR_B_FIVE_B,
    FRAME_TYPE_DATA,
    MANCHESTER,
    PHY_HEADER_BYTES,
    PhyConfig,
)
from trackmaker_tpu.phy import line_coding

DROW = 384        # samples per DMA row: 3 aligned lanes = 8 bytes = 64 bits
NR = 48           # DMA rows per slab: 8-aligned start + residual + frame
BROWS = 34        # byte-grid rows: 34*8 = 272 >= 263 frame bytes
RPB = 4           # max hits per 512-lag block before overflow
BLK = 512
_BIGI = np.int32(2**30)


def spec_supported_cfg(cfg: PhyConfig) -> bool:
    if cfg.samples_per_level != 3:
        return False
    if cfg.line_coding == MANCHESTER:
        return (cfg.preamble_len == 96 and cfg.sync_len == 48
                and cfg.sync_margin == 6 and cfg.header_samples == 336)
    if cfg.line_coding == FOUR_B_FIVE_B:
        return (cfg.preamble_len == 60 and cfg.sync_len == 30
                and cfg.sync_margin == 15 and cfg.header_samples == 210)
    return False


def _check_cfg(cfg: PhyConfig) -> None:
    assert spec_supported_cfg(cfg), \
        "speculative kernels are specialized for spl=3 configs"


def _cat8(orig: np.ndarray) -> np.ndarray:
    """Lane-concatenated band table, 8 sublane-shifted copies:
    cat8[v, r, 0:128] = orig[v + r], cat8[v, r, 128:256] =
    orig[v + r + 384].  A single 384-row slice at start = 383 - q
    yields [A | B] — the row-r and row-r+1 band matrices side by
    side with offset-0 layout — feeding the single-matmul form whose
    two 128-lane output halves are combined by an offset-1-row
    elementwise add (Mosaic compiles the offset add; it rejects the
    in-kernel lane CONCAT of an offset-1 slice — r4 finding,
    tools/exp_offset_add.py)."""
    cat = np.zeros((776, 256), orig.dtype)
    n = orig.shape[0]
    m0 = min(776, n)
    cat[:m0, 0:128] = orig[:m0]
    m1 = min(776, n - 384)
    cat[:m1, 128:256] = orig[384:384 + m1]
    return np.stack([cat[v:v + 768] for v in range(8)])


@functools.lru_cache(maxsize=8)
def _sync_tables(pattern_key, n_pos: int) -> tuple[np.ndarray, float]:
    """Lane-cat (8, 768, 128) copies of the banded sync matrix
    T[u+383, k] = sync_pat[u - k] for k in [0, n_pos): Mosaic requires
    dynamic sublane slice starts provably divisible by 8, so slice
    copy v = start % 8 at the 8-aligned start - v.  Because n_pos <= 64
    (margins are 6/15), the [A | B] halves fit ONE 128-lane table —
    A's positions in lanes 0:64, the +384-row band B in lanes 64:128 —
    half the VMEM of the 256-lane form (the blocked 600 s program blew
    the 16 MB scoped-vmem limit by 1.34 MB with both tables at 256
    lanes, r4).  The window-energy band is T*T elementwise (the
    patterns are exactly +-1), so no separate energy table is
    needed."""
    sp = np.asarray(pattern_key, np.float32)
    assert np.all(np.abs(sp) == 1.0)
    assert n_pos <= 64
    w = len(sp)
    orig = np.zeros((1159, 64), np.float32)
    for u in range(0, w + n_pos):
        for k in range(n_pos):
            j = u - k
            if 0 <= j < w:
                orig[u + 383, k] = sp[j]
    cat = np.zeros((776, 128), np.float32)
    cat[:, 0:64] = orig[:776]
    cat[:1159 - 384, 64:128] = orig[384:]
    se = float(np.sqrt(np.sum(sp.astype(np.float64) ** 2)))
    return np.stack([cat[v:v + 768] for v in range(8)]), se


@functools.lru_cache(maxsize=2)
def _body_table() -> np.ndarray:
    """Lane-cat (8, 768, 256) copies of Tb[u+383, m] = v6[u - 6m] for
    u in [0, 384), m in [0, 64): bit m of a 64-bit row is
    sign(first-half sum - second-half sum) of the 6 samples at offset
    6m (line_coding.rs:93-123); the 384-row slice at 383 - o absorbs
    the frame's sample offset o within its DMA row, lanes 128:256
    carrying the next-row band."""
    v6 = np.array([1, 1, 1, -1, -1, -1], np.float32)
    orig = np.zeros((1159, 128), np.float32)
    for u in range(0, 384):
        for m in range(64):
            j = u - 6 * m
            if 0 <= j < 6:
                orig[u + 383, m] = v6[j]
    return _cat8(orig)


@functools.lru_cache(maxsize=2)
def _pack_table() -> np.ndarray:
    """W[m, k] = 2^(7 - (m - 8k)) for 8k <= m < 8k+8, k in [0, 8):
    packs a 64-bit row into its 8 MSB-first bytes via one matmul."""
    w = np.zeros((128, 128), np.float32)
    for k in range(8):
        for bbit in range(8):
            w[8 * k + bbit, k] = float(1 << (7 - bbit))
    return w


def _attempt_kernel(cand_ref, fs_ref, vlen_ref, nval_ref, x384_ref,
                    *rest, n_cand: int, t_max: int, sync_e: float,
                    shared_x: bool = False, fold_sync: bool = False):
    if fold_sync:
        # refined frame starts arrive via fs_ref (computed by the
        # xcorr kernel's fused refine) — no sync table, no in-kernel
        # refine: the body starts straight at the frame decode
        t8_ref = None
        tb8_ref, w_ref, bytes_ref, xw, sem = rest
    else:
        t8_ref, tb8_ref, w_ref, bytes_ref, xw, sem = rest
    b = pl.program_id(0)
    bx = 0 if shared_x else b   # flat-capture mode: every grid step
    #                             (block) reads the one shared buffer
    vlen = vlen_ref[b]
    nv = jnp.minimum(nval_ref[b], n_cand)  # skip the 2^30 fill slots

    def base_of(c):
        pos = cand_ref[b, c]
        i_c = jnp.minimum(pos, t_max)
        # base = expected - margin = i + (96 - 48) - 6 (decoder.rs:177-179)
        return i_c, i_c + 42

    def dma(c, slot):
        _, base = base_of(c)
        r0 = base // DROW
        start8 = pl.multiple_of((r0 // 8) * 8, 8)  # HBM slices need
        return pltpu.make_async_copy(              # 8-aligned sublanes
            x384_ref.at[bx, pl.ds(start8, NR), :],
            xw.at[slot], sem.at[slot])

    def tslice(tref, start):
        """384-row slice of the lane-cat band table at an arbitrary
        start, via the (start % 8)-shifted copy + an 8-aligned slice:
        [A | B] with A = band rows [start, start+384) in lanes 0:128
        and B = the +384-shifted band in lanes 128:256 (see _cat8)."""
        v = start % 8
        idx = pl.multiple_of(start - v, 8)
        return tref[v, pl.ds(idx, DROW), :]


    # ATTEMPT_PIPE-deep DMA pipeline (see the module constant)
    for i in range(ATTEMPT_PIPE - 1):
        @pl.when(nv > i)
        def _(i=i):
            dma(i, i).start()

    def body_fn(c, _):
        la = ATTEMPT_PIPE - 1
        slot = c % ATTEMPT_PIPE

        @pl.when(c + la < nv)
        def _():
            dma(c + la, (c + la) % ATTEMPT_PIPE).start()

        dma(c, slot).wait()
        i_c, base = base_of(c)
        q = base % DROW
        ro = (base // DROW) % 8        # residual rows below the slab top

        def rowsel(kk, height, max_k):
            # xw[slot, kk:kk+height] with a traced kk (dynamic sublane
            # slices need 8-alignment): a one-hot row-selection MATMUL.
            # Each output row has exactly one 1.0, so the f32 MXU pass
            # is exact — and it replaced a max_k-deep masked sum of
            # full-height slabs that cost ~40% of the kernel (VPU
            # passes over height*DROW*max_k elements per candidate).
            ri = jax.lax.broadcasted_iota(jnp.int32, (height, NR), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (height, NR), 1)
            sel = (ci == ri + kk).astype(jnp.float32)
            return jnp.dot(sel, xw[slot],
                           preferred_element_type=jnp.float32)

        if fold_sync:
            # the xcorr kernel's fused refine already found fs
            # (sync/pallas_xcorr.py:_xcorr_hits_refine_kernel) — this
            # kernel's floor is op-issue cost (0.80 us/candidate, half
            # sequencer), so dropping the 3 refine matmuls + argmax
            # chain per candidate is the r4 candidate-cost lever
            fs = fs_ref[b, c]
        else:
            # ---- sync refine: 13 sliding sync-word dots as ONE banded
            # matmul per quantity against the lane-cat [A | B] table
            # slice — the a+b split-sum form paid 4 matmul issues per
            # candidate, and issue latency, not FLOPs, dominates this
            # kernel (a bf16-precision A/B moved phase_a by <2%, r4).
            # The two output halves (64-lane: n_pos <= 64, see
            # _sync_tables) merge with an offset-1-row add (the only
            # merge epilogue Mosaic compiles, tools/exp_offset_add.py).
            ts = tslice(t8_ref, 383 - q)        # (384, 128) = [A | B]
            x01 = rowsel(ro, 2, 8)
            o_d = jnp.dot(x01, ts, preferred_element_type=jnp.float32)
            o_e = jnp.dot(x01 * x01, ts * ts,
                          preferred_element_type=jnp.float32)
            dot = o_d[0:1, 0:64] + o_d[1:2, 64:128]
            en = o_e[0:1, 0:64] + o_e[1:2, 64:128]
            lane64 = jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1)
            posk = base + lane64
            validk = (lane64 < 13) & (posk <= vlen - 48)
            cc = jnp.where(en > 1e-6, dot / (jnp.sqrt(en) * sync_e), 0.0)
            cc = jnp.where(validk, cc, -jnp.inf)
            best = jnp.argmax(cc).astype(jnp.int32)
            bestpos = jnp.where(jnp.max(cc) > -1.0, base + best,
                                i_c + 48)
            fs = bestpos + 48

        # ---- body decode: 34 rows x 64 bits as ONE banded matmul
        # against the lane-cat [A | B] body-table slice, output halves
        # combined by the offset-1-row add
        off = fs - (base // DROW) * DROW        # in [48, 493)
        r0b = off // DROW                       # 0 or 1
        o2 = off % DROW
        tb = tslice(tb8_ref, 383 - o2)          # (384, 256)
        xsh = rowsel(ro + r0b, BROWS + 1, 10)   # rows [ro+r0b, +35)
        o_b = jnp.dot(xsh, tb, preferred_element_type=jnp.float32)
        d = o_b[0:BROWS, 0:128] + o_b[1:BROWS + 1, 128:256]
        bits = (d <= 0.0).astype(jnp.float32)   # bit=1 iff 2nd half larger
        byte_blk = jnp.dot(bits, w_ref[:, :],
                           preferred_element_type=jnp.float32)  # (34, 128)
        if not fold_sync:
            # lanes 0..7 hold the row's 8 bytes; stash the refine DELTA
            # fs - i_c at [33, 8] (row 33 covers bytes 264.. > 263).
            # The delta is in [48, 103] — trivially f32-exact at ANY
            # capture length, which is what lets the legacy kernels
            # decode flat 600 s captures (2^25 positions) that the old
            # absolute-fs stash rounded (r5; the epilogue adds cand
            # back in i32).  Fold mode skips the stash: the epilogue
            # reads the i32 fs_cand directly.
            row_id = jax.lax.broadcasted_iota(jnp.int32, (BROWS, 128), 0)
            lane_id = jax.lax.broadcasted_iota(jnp.int32, (BROWS, 128), 1)
            byte_blk = jnp.where((row_id == BROWS - 1) & (lane_id == 8),
                                 (fs - i_c).astype(jnp.float32), byte_blk)
        # 4-D out block: indexing the candidate on a leading (untiled)
        # dim keeps every store a full aligned (BROWS, 128) tile — the
        # old flat (n_cand*BROWS, 128) layout stored at dynamic sublane
        # offset c*34, which is 8-aligned only every 4th candidate
        bytes_ref[0, c] = byte_blk
        return 0

    jax.lax.fori_loop(0, nv, body_fn, 0)




# ---------------------------------------------------------------------------
# 4B5B + NRZI attempt kernel
# ---------------------------------------------------------------------------

NR4 = 48          # DMA rows per 4B5B slab
LROWS = 6         # regrouped level rows of 640 (5*128) levels each
BROWS4 = 24       # output rows per candidate (4B5B)


@functools.lru_cache(maxsize=2)
def _level_mats() -> tuple[np.ndarray, np.ndarray]:
    """MA[p][s, j] / MB[p][s, j]: sum of the 3 samples of level j at
    sample phase p within a 384-sample row (MB catches level 127's
    spill into the next row for p > 0).  Stacked (3, 384, 128)."""
    ma = np.zeros((3, 384, 128), np.float32)
    mb = np.zeros((3, 384, 128), np.float32)
    for p in range(3):
        for j in range(128):
            for ss in range(3 * j + p, 3 * j + p + 3):
                if ss < 384:
                    ma[p, ss, j] = 1.0
                else:
                    mb[p, ss - 384, j] = 1.0
    return ma, mb


@functools.lru_cache(maxsize=2)
def _level_mats_cat() -> np.ndarray:
    """[MA | MB] lane-concatenated, (3, 384, 256): feeds the
    single-matmul level-sum form (matmul ISSUES per candidate dominate
    the attempt kernels, not FLOPs), output halves combined by the
    offset-1-row add."""
    ma, mb = _level_mats()
    return np.concatenate([ma, mb], axis=2)


@functools.lru_cache(maxsize=2)
def _sym_mats_256() -> np.ndarray:
    """[W5 | Z5] side by side, (640, 256): one matmul yields the
    symbol values (cols 0..127 against the transition rows) and the
    zero-level counts (cols 128..255 against the zero rows)."""
    w5, z5 = _sym_mats()
    return np.concatenate([w5, z5], axis=1)


@functools.lru_cache(maxsize=2)
def _sym_mats() -> tuple[np.ndarray, np.ndarray]:
    """W5[5m+j, m] = 2^(4-j): packs 5 transition bits into the symbol
    value; Z5: 0/1 ones band (zero-level count per symbol)."""
    w5 = np.zeros((640, 128), np.float32)
    z5 = np.zeros((640, 128), np.float32)
    for m in range(128):
        for j in range(5):
            w5[5 * m + j, m] = float(1 << (4 - j))
            z5[5 * m + j, m] = 1.0
    return w5, z5


def _attempt_kernel_4b5b(cand_ref, fs_ref, vlen_ref, nval_ref, x384_ref,
                         *rest, n_cand: int, t_max: int, sync_e: float,
                         shared_x: bool = False, fold_sync: bool = False):
    if fold_sync:
        t8_ref = None      # fs arrives refined via fs_ref (see
        #                    _attempt_kernel) — no sync table needed
        mab_ref, w5z5_ref, out_ref, xw, sem = rest
    else:
        t8_ref, mab_ref, w5z5_ref, out_ref, xw, sem = rest
    b = pl.program_id(0)
    bx = 0 if shared_x else b
    vlen = vlen_ref[b]
    nv = jnp.minimum(nval_ref[b], n_cand)

    def base_of(c):
        pos = cand_ref[b, c]
        i_c = jnp.minimum(pos, t_max)
        # base = expected - margin = i + (60 - 30) - 15
        return i_c, i_c + 15

    def dma(c, slot):
        _, base = base_of(c)
        r0 = base // DROW
        start8 = pl.multiple_of((r0 // 8) * 8, 8)
        return pltpu.make_async_copy(
            x384_ref.at[bx, pl.ds(start8, NR4), :],
            xw.at[slot], sem.at[slot])

    def tslice(tref, start):
        # 384-row lane-cat [A | B] band slice (see _attempt_kernel)
        v = start % 8
        idx = pl.multiple_of(start - v, 8)
        return tref[v, pl.ds(idx, DROW), :]

    def s12_mat(ql):
        # lane-cat realign one-hot [S1 | S2] (see body_fn)
        ar2 = jax.lax.broadcasted_iota(jnp.int32, (128, 256), 0)
        ac2 = jax.lax.broadcasted_iota(jnp.int32, (128, 256), 1)
        return (ar2 == (ac2 % 128) + ql
                - 128 * (ac2 // 128)).astype(jnp.float32)

    def sym_inverse(symf):
        # symbol -> (ok, nibble) mask-shift inverse (see body_fn)
        okm = 0
        nibm = [0, 0, 0, 0]
        for nv_, code in enumerate(line_coding.FOURB_FIVEB_ENCODE):
            okm |= 1 << int(code)
            for bbit in range(4):
                if (nv_ >> bbit) & 1:
                    nibm[bbit] |= 1 << int(code)
        symi = symf.astype(jnp.int32)           # exact values in [0,32)
        ok_i = (jnp.int32(okm) >> symi) & 1
        nib_i = ((jnp.int32(nibm[0]) >> symi) & 1) \
            + (((jnp.int32(nibm[1]) >> symi) & 1) << 1) \
            + (((jnp.int32(nibm[2]) >> symi) & 1) << 2) \
            + (((jnp.int32(nibm[3]) >> symi) & 1) << 3)
        return ok_i.astype(jnp.float32), nib_i.astype(jnp.float32)


    # ATTEMPT_PIPE-deep DMA pipeline (see _attempt_kernel)
    for i in range(ATTEMPT_PIPE - 1):
        @pl.when(nv > i)
        def _(i=i):
            dma(i, i).start()

    def body_fn(c, _):
        la = ATTEMPT_PIPE - 1
        slot = c % ATTEMPT_PIPE

        @pl.when(c + la < nv)
        def _():
            dma(c + la, (c + la) % ATTEMPT_PIPE).start()

        dma(c, slot).wait()
        i_c, base = base_of(c)
        ro = (base // DROW) % 8
        q0 = base % DROW

        def rowsel(kk, height, max_k):
            # one-hot row-selection matmul (see _attempt_kernel.rowsel)
            ri = jax.lax.broadcasted_iota(jnp.int32, (height, NR4), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (height, NR4), 1)
            sel = (ci == ri + kk).astype(jnp.float32)
            return jnp.dot(sel, xw[slot],
                           preferred_element_type=jnp.float32)

        if fold_sync:
            fs = fs_ref[b, c]   # refined by the xcorr kernel's fused
            #                     refine (see _attempt_kernel)
        else:
            # ---- sync refine: 31 sliding 30-sample dots as ONE
            # banded matmul per quantity against the lane-cat [A | B]
            # table slice (64-lane halves, see _sync_tables; matmul
            # issues per candidate dominate, not FLOPs — see
            # _attempt_kernel), output halves combined by the
            # offset-row add
            ts = tslice(t8_ref, 383 - q0)       # (384, 128)
            x01 = rowsel(ro, 2, 8)
            o_d = jnp.dot(x01, ts, preferred_element_type=jnp.float32)
            o_e = jnp.dot(x01 * x01, ts * ts,
                          preferred_element_type=jnp.float32)
            dot = o_d[0:1, 0:64] + o_d[1:2, 64:128]
            en = o_e[0:1, 0:64] + o_e[1:2, 64:128]
            lane64 = jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1)
            posk = base + lane64
            validk = (lane64 < 31) & (posk <= vlen - 30)
            cc = jnp.where(en > 1e-6, dot / (jnp.sqrt(en) * sync_e), 0.0)
            cc = jnp.where(validk, cc, -jnp.inf)
            best = jnp.argmax(cc).astype(jnp.int32)
            bestpos = jnp.where(jnp.max(cc) > -1.0, base + best,
                                i_c + 30)
            fs = bestpos + 30

        # ---- level sums for the whole slab at the frame's sample
        # phase: ONE matmul against the lane-cat [MA | MB] table,
        # output halves combined by the offset-1-row add
        oo = fs - (base // DROW // 8) * 8 * DROW  # offset within slab
        p = oo % 3
        # dynamic index on the UNTILED leading dim is an address
        # offset (like the tslice copies) — the where-select pair it
        # replaces materialized a (384, 256) table copy per candidate
        mab = mab_ref[p]
        o_l = jnp.dot(xw[slot], mab,
                      preferred_element_type=jnp.float32)  # (NR4, 256)
        lv_all = o_l[0:NR4 - 1, 0:128] + o_l[1:NR4, 128:256]
        # level j of slab row k is global level 128k + j - ql, with the
        # frame's level 0 at row ro2 lane ql
        ro2 = oo // DROW
        ql = (oo % DROW) // 3

        def lrowsel(kk, height, max_k):
            # one-hot row-selection matmul (see _attempt_kernel.rowsel)
            nr_lv = NR4 - 1
            ri = jax.lax.broadcasted_iota(jnp.int32, (height, nr_lv), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (height, nr_lv), 1)
            sel = (ci == ri + kk).astype(jnp.float32)
            return jnp.dot(sel, lv_all,
                           preferred_element_type=jnp.float32)

        lsel = lrowsel(ro2, 32, 10)            # (32, 128)
        # lane-cat realign one-hot [S1 | S2]: lanes 0..127 realize the
        # s1 shift (r == c + ql), lanes 128..255 the s2 shift
        # (r == c - 128 + ql - 128) — one iota compare + ONE matmul
        # replace the s1/s2 pair, halves combined by the offset-row add
        o_r = jnp.dot(lsel[0:32, :], s12_mat(ql),
                      preferred_element_type=jnp.float32)      # (32,256)
        lal = o_r[0:31, 0:128] + o_r[1:32, 128:256]            # (31,128)
        lflat = lal[0:30, :].reshape(1, 30 * 128)   # (1, 3840)

        # ---- NRZI transitions (optimistic: prev = previous level);
        # computed on the flat level row so the only boundary fix is
        # lane 0 (fresh decode state: prev level = +1,
        # line_coding.rs:228)
        lane_f = jax.lax.broadcasted_iota(jnp.int32, (1, 3840), 1)
        prevf = jnp.where(lane_f == 0, 1.0, pltpu.roll(lflat, 1, 1))
        tr = (prevf * lflat < 0.0).astype(jnp.float32).reshape(LROWS, 640)
        nz = (jnp.abs(lflat) <= 4e-6).astype(jnp.float32).reshape(
            LROWS, 640)

        # ---- symbols, validity, nibbles (table-free 4B5B inverse);
        # [tr; nz] against the side-by-side [W5 | Z5] table: one call
        # (the off-diagonal blocks are computed and discarded — 2x the
        # FLOPs of the pair, half the matmul issues, and issues win)
        symzc = jnp.dot(jnp.concatenate([tr, nz], axis=0),
                        w5z5_ref[:, :],
                        preferred_element_type=jnp.float32)  # (12, 256)
        zc = symzc[LROWS:2 * LROWS, 128:256]
        # symbol -> (nibble, valid) as mask-shifts: the 5-bit symbol
        # indexes five 32-bit constants (validity + one per nibble
        # bit), so the whole inverse is 5 variable-amount shifts — the
        # 16-code compare loop it replaces was ~48 small VPU ops per
        # candidate, and op COUNT (sequencer throughput) is this
        # kernel's floor (tools/exp_attempt_tiles.py).  Codes are
        # <= 30, so every mask is a positive int32.
        ok, nib = sym_inverse(symzc[0:LROWS, 0:128])

        # ---- output block: nib rows 0-5, ok 6-11, zero 12-17, fs 18
        blk24 = jnp.concatenate(
            [nib, ok, (zc > 0).astype(jnp.float32),
             jnp.zeros((BROWS4 - 3 * LROWS, 128), jnp.float32)], axis=0)
        if not fold_sync:
            # delta stash, exact at any capture length (see
            # _attempt_kernel); fold mode skips it
            r24 = jax.lax.broadcasted_iota(jnp.int32, (BROWS4, 128), 0)
            l24 = jax.lax.broadcasted_iota(jnp.int32, (BROWS4, 128), 1)
            blk24 = jnp.where((r24 == 3 * LROWS) & (l24 == 0),
                              (fs - i_c).astype(jnp.float32), blk24)
        # leading-dim candidate index: full aligned tile store (see
        # _attempt_kernel's bytes_ref note)
        out_ref[0, c] = blk24
        return 0

    jax.lax.fori_loop(0, nv, body_fn, 0)


# Walk-scan unroll factor (see _spec_walk_query): 8 was the r4 sweep
# winner; >= steps means a fully unrolled, while-loop-free chase.
WALK_UNROLL = max(1, int(_os.environ.get("TM_WALK_UNROLL", "8")))


def _walk_kernel(fields_ref, scal_ref, out_ref, *, n_cand: int,
                 max_frames: int):
    """Sequential consumption walk (decoder.rs:242-356) over the sorted
    candidate list, as SMEM scalar ops.  fields rows: 0=pos, 1=consumed,
    2=stop-if-attempted, 3=keep-if-attempted.  scal lanes: 0=start
    cursor (hits before it were consumed by an upstream block),
    1=scan limit (candidates at/past it belong to the downstream block;
    see decoder.decode_capture's cursor semantics).  Output rows:
    0=keep, 1=attempted (candidates the cursor actually reached —
    skipped ones never influence decode, so conformance checks gate on
    this), 2=walk state in lanes 0..3: [final cursor, stopped on an
    incomplete frame, pending preamble start (_BIGI if none), attempt
    count]."""
    cur0 = scal_ref[0, 0, 0]
    limit = scal_ref[0, 0, 1]

    def body(c, carry):
        cur, done, att, pending = carry
        pos = fields_ref[0, 0, c]
        consumed = fields_ref[0, 1, c]
        stopf = fields_ref[0, 2, c]
        keepf = fields_ref[0, 3, c]
        exists = (pos < _BIGI) & (pos < limit)
        at = exists & (done == 0) & (pos >= cur) & (att < max_frames)
        stop = at & (stopf > 0)
        adv = at & jnp.logical_not(stop)
        out_ref[0, 0, c] = (adv & (keepf > 0)).astype(jnp.int32)
        out_ref[0, 1, c] = at.astype(jnp.int32)
        return (jnp.where(adv, pos + consumed, cur),
                jnp.where(stop, 1, done),
                att + at.astype(jnp.int32),
                jnp.where(stop, jnp.minimum(pending, pos), pending))

    cur, done, att, pending = jax.lax.fori_loop(
        0, n_cand, body,
        (cur0, jnp.int32(0), jnp.int32(0), jnp.int32(_BIGI)))
    out_ref[0, 2, 0] = cur
    out_ref[0, 2, 1] = done
    out_ref[0, 2, 2] = pending
    out_ref[0, 2, 3] = att


def _spec_walk(fields, start_cursor, scan_limit, max_frames: int,
               interpret: bool = False):
    """Vectorized consumption walk (decoder.rs:242-356) over the sorted
    candidate list — a batched pointer chase instead of a scalar loop.

    The scalar SMEM kernel (`_spec_walk_smem`) measured ~2.9 ms of the
    7.3 ms flagship decode: its grid steps serialize on the single
    scalar core (32 blocks x 128 candidates x ~20 SMEM ops).  The walk
    is a chain in a functional graph, and candidate positions are
    SORTED, so it vectorizes exactly:

    * successor(c) = first index with pos >= pos_c + consumed_c — a
      per-pair compare + count along the sorted axis (no gather);
      stop candidates and candidates at/past the scan limit map to an
      absorbing sink (non-existence is a suffix property of the
      sorted list, so the chain can never skip past a hole).
    * the attempted set = the first `max_frames` nodes of the chain
      from s0 = first index with pos >= start_cursor, marked by a
      `lax.scan` pointer chase over the whole batch at once: each
      step ORs one-hot(ptr) into a visited bitmap and advances every
      row's pointer through the successor table (a (B, C+1) masked
      sum, no gather).  Chain indices strictly increase (consumed
      >= 1), so min(max_frames, C+1) steps reach the sink; each step
      is ~3 tiny VPU ops, ~0.1 ms total at B=32, C=128 — vs ~3 ms
      for the same chain as an MXU matrix power series (tried:
      binary-doubling S(2n) = (I+M^n)S(n) over (C+1)^2 one-hot
      matrices; 21 batched 129x129 matmuls lose to 72 fused scan
      steps at these sizes).

    Returns ``(keep, attempted, final_cursor, done, pending)`` per
    capture.  `done` mirrors decode_capture's done_f: True when the
    walk ended on a stop or ran out of candidates — NOT when it merely
    hit `max_frames` attempts (the exact scan's remaining steps would
    then see no candidate and stop, decoder.py's `step`).
    Differentially pinned against the SMEM kernel by
    tests/test_blocked_spec.py::test_walk_vectorized_equals_smem."""
    prep = _spec_walk_prepare(fields, scan_limit, max_frames)
    return _spec_walk_query(prep, start_cursor, max_frames)


def _spec_walk_prepare(fields, scan_limit, max_frames: int):
    """Cursor-independent half of :func:`_spec_walk`: the per-candidate
    successor table (with the absorbing sink at index C).
    Blocked/sharded seam fixpoints call this ONCE and re-run only the
    cheap `_spec_walk_query` per iteration (only `start_cursor` changes
    across fixpoint iterations; `scan_limit` does not)."""
    b, _, c_n = fields.shape
    pos = fields[:, 0, :]                        # i32, ascending
    consumed = fields[:, 1, :]
    stopf = fields[:, 2, :] > 0
    keepf = fields[:, 3, :] > 0
    limit = jnp.broadcast_to(
        jnp.asarray(scan_limit, jnp.int32), (b,))
    exists = (pos < _BIGI) & (pos < limit[:, None])

    target = pos + consumed
    nxt = jnp.sum((pos[:, None, :] < target[:, :, None])
                  .astype(jnp.int32), axis=-1)   # (B, C) in [0, C]
    nxt = jnp.where(stopf | ~exists, c_n, nxt)
    nxt_ext = jnp.concatenate(                   # sink self-loop
        [nxt, jnp.full((b, 1), c_n, nxt.dtype)], axis=-1)

    return (nxt_ext, pos, consumed, stopf, keepf, exists)


def _spec_walk_query(prep, start_cursor, max_frames: int):
    """Cursor-dependent half of :func:`_spec_walk`: chase the successor
    chain from `start_cursor`'s first candidate and reduce the visited
    set to (keep, attempted, final_cursor, done, pending)."""
    nxt_ext, pos, consumed, stopf, keepf, exists = prep
    b, c_n = pos.shape
    cur0 = jnp.broadcast_to(
        jnp.asarray(start_cursor, jnp.int32), (b,))

    ar = jnp.arange(c_n + 1, dtype=jnp.int32)
    s0 = jnp.sum((pos < cur0[:, None]).astype(jnp.int32), axis=-1)
    # visited init derives from pos so its varying-axes typing matches
    # the scan body's output under shard_map (CLAUDE.md invariant)
    vis0 = jnp.pad(pos * 0, ((0, 0), (0, 1))) > 0   # (B, C+1) False

    def step(carry, _):
        ptr, vis = carry
        onehot = ptr[:, None] == ar[None, :]
        nptr = jnp.sum(jnp.where(onehot, nxt_ext, 0), axis=-1)
        return (nptr.astype(ptr.dtype), vis | onehot), None

    # chain indices strictly increase, so C+1 steps always reach the
    # sink; extra steps past max_frames would only re-visit it
    steps = min(max_frames, c_n + 1)
    # unroll: the per-step ops are tiny (B x C+1 compares), so scan
    # iteration overhead dominates — unroll=8 measured 0.69 vs 0.99 ms
    # at B=32, C=128 (tools/prof_walk.py); env-tunable for the r5
    # full-unroll A/B (the XLA while-loop carries most of the step
    # cost at these sizes, so unroll=steps may win outright)
    (_, visited), _ = jax.lax.scan(
        step, (s0.astype(jnp.int32), vis0), None, length=steps,
        unroll=min(steps, WALK_UNROLL))

    att = visited[:, :c_n] & exists
    keep = att & keepf & ~stopf   # stop candidates never yield a frame
    att_n = jnp.sum(att.astype(jnp.int32), axis=-1)
    stopped = jnp.any(att & stopf, axis=-1)
    pending = jnp.min(jnp.where(att & stopf, pos, _BIGI), axis=-1)
    adv_end = jnp.max(jnp.where(att & ~stopf, pos + consumed, -1),
                      axis=-1)
    cur_f = jnp.maximum(cur0, adv_end)
    done = stopped | (att_n < max_frames)
    return keep, att, cur_f, done, pending


def _spec_walk_smem(fields, start_cursor, scan_limit, max_frames: int,
                    interpret: bool = False):
    """The original scalar SMEM walk kernel — kept as the differential
    reference for `_spec_walk` (same contract)."""
    b, _, n_cand = fields.shape
    # (B, 1, 2): keeps the SMEM block's last two dims equal to the
    # overall array dims (Mosaic's block-shape rule)
    scal = jnp.stack([
        jnp.broadcast_to(jnp.asarray(start_cursor, jnp.int32), (b,)),
        jnp.broadcast_to(jnp.asarray(scan_limit, jnp.int32), (b,)),
    ], axis=1)[:, None, :]
    out = pl.pallas_call(
        functools.partial(_walk_kernel, n_cand=n_cand,
                          max_frames=max_frames),
        out_shape=jax.ShapeDtypeStruct((b, 3, n_cand), jnp.int32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 4, n_cand), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, n_cand), lambda bb: (bb, 0, 0),
                               memory_space=pltpu.SMEM),
        interpret=interpret,
    )(fields, scal)
    keep = out[:, 0, :].astype(bool)
    attempted = out[:, 1, :].astype(bool)
    cur_f = out[:, 2, 0]
    pending = out[:, 2, 2]
    done = (out[:, 2, 1] > 0) | (out[:, 2, 3] < max_frames)
    return keep, attempted, cur_f, done, pending


def _pick_i32(vals: jax.Array, valid: jax.Array,
              onehot: jax.Array) -> jax.Array:
    """Rank-compact int32 values through a one-hot slot matrix with the
    16-bit-halves trick: a single f32 einsum is only integer-exact
    below 2^24, and flat long-capture positions reach 2^25 (600 s at
    48 kHz = 28.8M samples — the same hazard _spec_compact.pick_pos
    guards against)."""
    v = jnp.where(valid, vals, 0)
    _hi = jax.lax.Precision.HIGHEST     # explicit: exact one-hot picks
    lo = jnp.einsum("...i,...ic->...c",
                    (v & 0xFFFF).astype(jnp.float32), onehot,
                    precision=_hi)
    hi = jnp.einsum("...i,...ic->...c",
                    (v >> 16).astype(jnp.float32), onehot,
                    precision=_hi)
    return (hi.astype(jnp.int32) << 16) + lo.astype(jnp.int32)


def _compact_hit_rows(rows: jax.Array, n_cand: int, rpb: int = RPB,
                      group: int = 32, s1: int = 16,
                      with_fs: bool = False):
    """(cand, corr_at_cand, n_valid, overflow) from the xcorr kernel's
    fused per-128-lag-row hit extraction (sync/pallas_xcorr.py:
    pallas_xcorr_hits) — the same candidate contract as
    :func:`_extract_candidates`, but hierarchical: stage 1 compacts
    each `group`-row block's `group*rpb` slots to `s1`, stage 2
    rank-compacts the survivors globally.  The flat single-stage form
    built a (B, R*rpb, n_cand) one-hot — 222 MB of f32 traffic on the
    flagship shape, ~0.6 ms of the 3.6 ms decode (tools/prof_fused.py
    r4); the two-stage form touches ~5x less.  (group=32, s1=16) won
    the on-chip sweep (tools/exp_extract_group.py: 0.248 ms vs 0.328
    at the old 16/8, with the same hit-density cap over a 2x span —
    strictly safer for clustered hits).  Overflow adds one condition —
    more than `s1` extracted hits inside one group*128-lag span
    (4096 lags = 85 ms of audio at the defaults) — conservative like
    the others: flagged captures re-decode exactly.
    Position compaction uses 16-bit-halves einsums (integer-exact past
    2^24, where flat 600 s captures live).  ``with_fs=True`` parses the
    refine-fold contract (pallas_xcorr_hits_refine): lanes
    ``2*rpb+1..3*rpb`` carry each hit's refined frame start as a small
    DELTA from the hit position — one exact f32 einsum per stage picks
    it — and the absolute fs (cand + delta, i32) returns as a fifth
    result."""
    lead = rows.shape[:-2]
    r = rows.shape[-2]
    starts = rows[..., :rpb]
    cvals = jax.lax.bitcast_convert_type(
        rows[..., rpb + 1:2 * rpb + 1], jnp.float32)
    counts = rows[..., rpb]
    fvals = rows[..., 2 * rpb + 1:3 * rpb + 1] if with_fs else None

    # stage 0 (r5): per-ROW rank compaction of the rpb=8 kernel lanes
    # to s0=4 slots before anything reshapes into groups.  Every
    # downstream one-hot shrinks by rpb/s0 = 2x — stage 1's oh1 was
    # ~115 MB of materialized f32 on the blocked 600 s shape (the
    # einsum traffic IS the compaction cost; tools/prof_blocked.py) —
    # while >4 extracted hits inside one 128-lag span (2.7 ms of
    # audio; legitimate frames are >= ~855 samples apart) joins the
    # conservative overflow conditions: flagged captures re-decode
    # exactly, like every other cap here.
    s0 = min(4, rpb)
    if s0 < rpb:
        vg0 = starts < _BIGI
        rank0 = jnp.cumsum(vg0.astype(jnp.int32), axis=-1) - 1
        oh0 = (vg0[..., None]
               & (rank0[..., None] == jnp.arange(s0, dtype=jnp.int32))
               ).astype(jnp.float32)
        row_n = jnp.sum(vg0.astype(jnp.int32), axis=-1)
        starts = _pick_i32(starts, vg0, oh0)
        starts = jnp.where(jnp.arange(s0) < row_n[..., None],
                           starts, _BIGI)
        cvals = jnp.einsum("...i,...ic->...c",
                           jnp.where(vg0, cvals, 0.0), oh0,
                           precision=jax.lax.Precision.HIGHEST)
        if with_fs:
            fvals = jnp.einsum("...i,...ic->...c",
                               jnp.where(vg0, fvals.astype(jnp.float32),
                                         0.0), oh0,
                               precision=jax.lax.Precision.HIGHEST)
        over0 = jnp.any(row_n > s0, axis=-1)
    else:
        over0 = jnp.zeros(lead, bool)
    rpb_c = s0

    ng = -(-r // group)
    pad_r = ng * group - r
    if pad_r:
        pc = [(0, 0)] * len(lead)
        starts = jnp.pad(starts, pc + [(0, pad_r), (0, 0)],
                         constant_values=_BIGI)
        cvals = jnp.pad(cvals, pc + [(0, pad_r), (0, 0)])
        counts = jnp.pad(counts, pc + [(0, pad_r)])
        if with_fs:
            fvals = jnp.pad(fvals, pc + [(0, pad_r), (0, 0)])

    # stage 1: per-group rank compaction to s1 slots
    sg = starts.reshape(*lead, ng, group * rpb_c)
    cg = cvals.reshape(*lead, ng, group * rpb_c)
    vg = sg < _BIGI
    rank1 = jnp.cumsum(vg.astype(jnp.int32), axis=-1) - 1
    oh1 = (vg[..., None]
           & (rank1[..., None] == jnp.arange(s1, dtype=jnp.int32))
           ).astype(jnp.float32)
    grp_n = jnp.sum(vg.astype(jnp.int32), axis=-1)
    s_c = _pick_i32(sg, vg, oh1)
    c_c = jnp.einsum("...i,...ic->...c", jnp.where(vg, cg, 0.0), oh1,
                     precision=jax.lax.Precision.HIGHEST)
    if with_fs:
        fg = fvals.reshape(*lead, ng, group * rpb_c).astype(jnp.float32)
        f_c = jnp.einsum("...i,...ic->...c", jnp.where(vg, fg, 0.0),
                         oh1, precision=jax.lax.Precision.HIGHEST)
    s_c = jnp.where(jnp.arange(s1) < grp_n[..., None], s_c, _BIGI)

    # stage 2: global rank compaction of the survivors
    flat = s_c.reshape(*lead, ng * s1)
    cflat = c_c.reshape(*lead, ng * s1)
    valid = flat < _BIGI
    rank = jnp.cumsum(valid.astype(jnp.int32), axis=-1) - 1
    onehot = (valid[..., None]
              & (rank[..., None] == jnp.arange(n_cand, dtype=jnp.int32))
              ).astype(jnp.float32)
    cand = _pick_i32(flat, valid, onehot)
    corr_c = jnp.einsum("...i,...ic->...c",
                        jnp.where(valid, cflat, 0.0), onehot,
                        precision=jax.lax.Precision.HIGHEST)
    n_valid = jnp.sum(valid.astype(jnp.int32), axis=-1)
    overflow = (jnp.any(counts > rpb, axis=-1)
                | over0
                | jnp.any(grp_n > s1, axis=-1)
                | (jnp.sum(counts, axis=-1) > n_cand))
    cand = jnp.where(jnp.arange(n_cand) < n_valid[..., None],
                     cand, _BIGI)
    if with_fs:
        fd = jnp.einsum("...i,...ic->...c",
                        jnp.where(valid, f_c.reshape(*lead, ng * s1),
                                  0.0), onehot,
                        precision=jax.lax.Precision.HIGHEST)
        fs_c = cand + fd.astype(jnp.int32)
        return cand, corr_c, n_valid, overflow, fs_c
    return cand, corr_c, n_valid, overflow


def _extract_candidates(hits: jax.Array, n_cand: int,
                        rpb: int = RPB, blk: int = BLK):
    """All hit positions, ascending, padded with 2^30 — via per-block
    argmax peel + rank compaction (dense ops only; `nonzero` measured
    ~5 ms/batch on-chip).  `rpb` caps hits per `blk`-lag block before
    the overflow flag fires (the ASK receiver's fire-candidates are
    denser than preamble hits and use a higher cap)."""
    n = hits.shape[-1]
    hb = -(-n // blk)
    rows = jnp.pad(hits, [(0, 0)] * (hits.ndim - 1)
                   + [(0, hb * blk - n)]).reshape(*hits.shape[:-1], hb, blk)
    lane = jnp.arange(blk, dtype=jnp.int32)
    base = jnp.arange(hb, dtype=jnp.int32) * blk
    starts = []
    r = rows
    for _ in range(rpb):
        has = jnp.any(r, axis=-1)
        p = jnp.argmax(r, axis=-1).astype(jnp.int32)
        starts.append(jnp.where(has, base + p, _BIGI))
        r = r & (lane > p[..., None])
    per_block = jnp.sum(rows.astype(jnp.int32), axis=-1)
    overflow = jnp.any(per_block > rpb, axis=-1) | (
        jnp.sum(per_block, axis=-1) > n_cand)
    flat = jnp.stack(starts, axis=-1).reshape(*hits.shape[:-1], hb * rpb)
    valid = flat < _BIGI
    rank = jnp.cumsum(valid.astype(jnp.int32), axis=-1) - 1
    onehot = (valid[..., None]
              & (rank[..., None] == jnp.arange(n_cand, dtype=jnp.int32))
              ).astype(jnp.float32)
    cand = jnp.einsum("...i,...ic->...c",
                      jnp.where(valid, flat, 0).astype(jnp.float32),
                      onehot, precision=jax.lax.Precision.HIGHEST)
    n_valid = jnp.sum(valid.astype(jnp.int32), axis=-1)
    cand = jnp.where(jnp.arange(n_cand) < n_valid[..., None],
                     cand.astype(jnp.int32), _BIGI)
    return cand, n_valid, overflow


class SpecFields(NamedTuple):
    """Cursor-independent per-candidate decode products (phase A).

    Everything here depends only on the capture, not on where the
    consumption walk starts — so blocked/sharded callers can compute it
    ONCE and re-run only the (tiny) walk kernel inside their
    consumed-until seam fixpoint (parallel/stream.py)."""
    cand: jax.Array       # i32[B, C] candidate preamble starts (_BIGI pad)
    fields: jax.Array     # i32[B, 4, C] walk rows: pos/consumed/stop/keep
    overflow: jax.Array   # bool[B] candidate table overflowed
    nonconf: jax.Array    # bool[B, C] optimistic decode unsound if attempted
    bytes_m: jax.Array    # i32[B, C, n_total] frame bytes, masked to length
    dlen: jax.Array       # i32[B, C]
    ftype: jax.Array      # i32[B, C]
    seq: jax.Array        # i32[B, C]
    src: jax.Array        # i32[B, C]
    dst: jax.Array        # i32[B, C]
    corr: jax.Array       # f32[B, C] correlation at each candidate


def _spec_phase_a(
    cfg: PhyConfig,
    x: jax.Array,              # f32[B, T]; f32[T_flat] with flat_blocks
    local_addr: jax.Array,     # i32 scalar
    n_cand: int,
    vlens: jax.Array,          # i32[B]
    interpret: bool = False,
    flat_blocks: tuple[int, int] | None = None,
) -> SpecFields:
    """Dense correlation + candidate extraction + attempt kernel +
    decision epilogue — every per-candidate quantity the consumption
    walk needs, computed for ALL candidates independent of the cursor.

    ``flat_blocks=(n_blocks, block)`` is the long-capture mode: x is
    ONE flat capture (pre-padded to n_blocks*block, block % 128 == 0),
    correlated once with no halo duplication; the per-128-lag hit rows
    split into per-block candidate tables by reshape (positions stay
    GLOBAL), and the attempt kernel DMAs its slabs from the single
    shared buffer — so a frame near a block seam reads the real
    following samples and no windowed copy of the capture ever exists
    (the windowed path materialized (n_blocks, block+halo) overlapping
    copies, ~17 ms for a 600 s capture).  Walk cursors/limits for this
    mode are global sample positions (parallel/stream.py)."""
    if flat_blocks is None:
        b, t = x.shape
    else:
        n_blocks, block = flat_blocks
        assert x.ndim == 1 and block % 128 == 0
        b = n_blocks
        t = x.shape[-1]
    manchester = cfg.line_coding == MANCHESTER

    pre_np = line_coding.preamble_waveform(cfg)
    from trackmaker_tpu.sync import correlate
    pre_energy = correlate.preamble_energy(pre_np)
    sp = pre_np[cfg.preamble_len - cfg.sync_len:]
    t8_np, sync_e = _sync_tables(tuple(sp.tolist()),
                                 2 * cfg.sync_margin + 1)

    from trackmaker_tpu import sync as sync_mod
    from trackmaker_tpu.sync.pallas_xcorr import (
        pallas_xcorr_hits, pallas_xcorr_hits_batched,
        pallas_xcorr_hits_refine)
    # lag-tile sweep (fused in-program timing, tools/prof_fused.py):
    # r4 remeasure with the emit_corr=False hit kernel: 433k rows
    # 1.86/1.17/1.04/1.96 ms at blk 8k/16k/32k/64k and 275k rows
    # 1.26/0.78/0.60/1.32 — 32k wins from ~200k samples up (the r3
    # sweep that favored 16k at 275k predates the fused epilogue)
    if t >= 200_000:
        xc_blk = 32768
    elif t >= 131_072:
        xc_blk = 16384
    else:
        xc_blk = 8192
    fold = _resolve_fold(t)
    # (no length guard: the legacy kernels stash the refine DELTA, which
    # is f32-exact at any capture length — r5)
    fs_cand = None
    if fold:
        # refine-fold path: hits + refined frame starts in one kernel
        # (explicit (capture, lag-tile) grid so per-capture vlen rides
        # scalar prefetch; i32 fs end-to-end, so flat captures past
        # 2^24 samples never round fs through f32)
        n_pos = 2 * cfg.sync_margin + 1
        refine_kw = dict(
            sync_off=cfg.preamble_len - cfg.sync_len - cfg.sync_margin,
            n_pos=n_pos, sync_len=cfg.sync_len,
            fall_off=cfg.preamble_len, blk=xc_blk,
            interpret=interpret, use_bf16=sync_mod.bf16_enabled())
        if flat_blocks is None:
            rows = pallas_xcorr_hits_refine(
                x, vlens, pre_np, sp, cfg.correlation_threshold,
                **refine_kw)
            cand, corr_cand, n_valid, overflow, fs_cand = \
                _compact_hit_rows(rows, n_cand, with_fs=True)
        else:
            rows = pallas_xcorr_hits_refine(
                x[None], vlens[:1], pre_np, sp,
                cfg.correlation_threshold, **refine_kw)[0]
            rows_b = rows[: n_blocks * (block // 128)].reshape(
                n_blocks, block // 128, 16)
            cand, corr_cand, n_valid, overflow, fs_cand = \
                _compact_hit_rows(rows_b, n_cand, with_fs=True)
    elif flat_blocks is None:
        # vmapped 1-capture kernel: measured FASTER than a batch-folded
        # (bc, lag-tile) 2-D grid (1.14 vs 2.40 ms at batch 32 —
        # tools/prof_xcorr_b.py r4 sweep; Mosaic schedules the many
        # small steps better than one bc-unrolled body), and a thin
        # nch-row x1 stream changed nothing (the kernel is
        # overhead/VPU-bound, not HBM-bound, at these shapes)
        _, rows = jax.vmap(lambda s: pallas_xcorr_hits(
            s, pre_np, cfg.correlation_threshold, blk=xc_blk,
            interpret=interpret, use_bf16=sync_mod.bf16_enabled(),
            emit_corr=False))(x)
        cand, corr_cand, n_valid, overflow = _compact_hit_rows(rows, n_cand)
    else:
        _, rows = pallas_xcorr_hits(
            x, pre_np, cfg.correlation_threshold, blk=xc_blk,
            interpret=interpret, use_bf16=sync_mod.bf16_enabled(),
            emit_corr=False)
        rows_b = rows[: n_blocks * (block // 128)].reshape(
            n_blocks, block // 128, 16)
        cand, corr_cand, n_valid, overflow = _compact_hit_rows(
            rows_b, n_cand)
    if fs_cand is None:
        fs_cand = jnp.zeros_like(cand)

    # row-shaped view for the kernel's slab DMAs; padded so any
    # clipped candidate's slab stays in bounds.  (A candidate-parallel
    # XLA attempt layout — dense stencil + decimation + per-candidate
    # row-gather/realign — was built and A/B'd on chip in r5: it LOSES
    # 2.2x to these sequential kernels at the flagship's ~65
    # candidates/capture; deleted, see docs/BENCHMARKS.md and git
    # fd30b41/d23ce64.)
    nr = NR if manchester else NR4
    r384 = -(-(t + 48) // DROW) + nr + 10
    if flat_blocks is None:
        x384 = jnp.pad(x, ((0, 0), (0, r384 * DROW - t))).reshape(
            b, r384, DROW)
    else:
        x384 = jnp.pad(x, (0, r384 * DROW - t)).reshape(1, r384, DROW)

    n_total = PHY_HEADER_BYTES + cfg.max_frame_bytes     # 263
    if manchester:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(b,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)]   # x384
            # fold mode drops the sync table (t8)
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 if fold else 3),
            out_specs=pl.BlockSpec(
                (1, n_cand, BROWS, 128), lambda bb, *_: (bb, 0, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((ATTEMPT_PIPE, NR, DROW), jnp.float32),
                pltpu.SemaphoreType.DMA((ATTEMPT_PIPE,)),
            ],
        )
        tables = [] if fold else [jnp.asarray(t8_np)]
        bytes_cm = pl.pallas_call(
            functools.partial(_attempt_kernel, n_cand=n_cand, t_max=t,
                              sync_e=sync_e, fold_sync=fold,
                              shared_x=flat_blocks is not None),
            out_shape=jax.ShapeDtypeStruct((b, n_cand, BROWS, 128),
                                           jnp.float32),
            grid_spec=grid_spec,
            cost_estimate=pl.CostEstimate(
                flops=2 * b * n_cand * (2 + 2 + 2 * BROWS + BROWS)
                * DROW * 128,
                transcendentals=0,
                bytes_accessed=4 * b * n_cand * NR * DROW),
            interpret=interpret,
        )(cand, fs_cand, vlens, n_valid.astype(jnp.int32), x384,
          *tables, jnp.asarray(_body_table()),
          jnp.asarray(_pack_table()))

        grid8 = bytes_cm                      # (b, n_cand, BROWS, 128)
        byts_i = grid8[..., :8].reshape(
            b, n_cand, BROWS * 8).astype(jnp.int32)
        # legacy: the kernel stashes the refine DELTA (f32-exact at any
        # length); rebase on the candidate position in i32 (the same
        # min(pos, t) the kernel's base_of used)
        fs = fs_cand if fold \
            else (jnp.minimum(cand, t)
                  + grid8[:, :, BROWS - 1, 8].astype(jnp.int32))
        dlen = byts_i[..., 0] * 256 + byts_i[..., 1]
        total_bits = (PHY_HEADER_BYTES + dlen) * 8
        total_samples = total_bits * 6
        n_valid_bits = total_bits          # Manchester never truncates
        line_fail = jnp.zeros_like(dlen, bool)
        hdr_valid = jnp.ones_like(dlen, bool)
        nonconf = jnp.zeros_like(dlen, bool)
    else:
        mab_np = _level_mats_cat()
        w5z5_np = _sym_mats_256()
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(b,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)]
            * (2 if fold else 3),
            out_specs=pl.BlockSpec(
                (1, n_cand, BROWS4, 128), lambda bb, *_: (bb, 0, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((ATTEMPT_PIPE, NR4, DROW), jnp.float32),
                pltpu.SemaphoreType.DMA((ATTEMPT_PIPE,)),
            ],
        )
        tables = [] if fold else [jnp.asarray(t8_np)]
        out_cm = pl.pallas_call(
            functools.partial(_attempt_kernel_4b5b, n_cand=n_cand,
                              t_max=t, sync_e=sync_e, fold_sync=fold,
                              shared_x=flat_blocks is not None),
            out_shape=jax.ShapeDtypeStruct((b, n_cand, BROWS4, 128),
                                           jnp.float32),
            grid_spec=grid_spec,
            cost_estimate=pl.CostEstimate(
                flops=2 * b * n_cand * (2 * NR4 + 2 * 32 + 4 + 4)
                * DROW * 128,
                transcendentals=0,
                bytes_accessed=4 * b * n_cand * NR4 * DROW),
            interpret=interpret,
        )(cand, fs_cand, vlens, n_valid.astype(jnp.int32), x384,
          *tables, jnp.asarray(mab_np), jnp.asarray(w5z5_np))

        g = out_cm                        # (b, n_cand, BROWS4, 128)
        # only the first 5 of LROWS=6 symbol rows (640 symbols) can
        # ever matter: the largest frame is 263 bytes = 526 symbols,
        # and every consumer below is masked to total_bits//4 <= 526 —
        # the trim cuts ~17% off every [B, C, syms] epilogue pass with
        # decision-identical results (zeros/validity beyond symbol 526
        # cannot reach any header, consumption, or conformance rule)
        erows, esyms = 5, 640
        nib = g[:, :, 0:erows, :].reshape(b, n_cand, esyms)
        sym_ok = g[:, :, LROWS:LROWS + erows, :].reshape(
            b, n_cand, esyms) > 0
        zflag = g[:, :, 2 * LROWS:2 * LROWS + erows, :].reshape(
            b, n_cand, esyms) > 0
        # legacy: delta stash rebased in i32 (see the Manchester branch)
        fs = fs_cand if fold \
            else (jnp.minimum(cand, t)
                  + g[:, :, 3 * LROWS, 0].astype(jnp.int32))

        # valid-prefix rule (line_coding.rs:277-289): everything from
        # the first invalid symbol on is zero-filled
        pok = jnp.cumprod(sym_ok.astype(jnp.int32), axis=-1)
        nib_m = (nib * pok).astype(jnp.int32)
        byts_i = (nib_m[..., 0::2] * 16 + nib_m[..., 1::2])[..., :n_total]
        dlen = byts_i[..., 0] * 256 + byts_i[..., 1]
        total_bits = (PHY_HEADER_BYTES + dlen) * 8
        total_samples = (total_bits // 4) * 15
        in_sym = (jnp.arange(esyms) < (total_bits // 4)[..., None])
        n_valid_bits = 4 * jnp.sum(pok * in_sym, axis=-1)
        line_fail = n_valid_bits < total_bits
        # >= 49 decoded header bits <=> first 13 nibbles valid
        hdr_valid = jnp.sum(pok[..., :13], axis=-1) == 13
        # conformance: a near-zero level average means the exact
        # decoder's skip-carry could produce different bits/validity
        hdr_zero = jnp.any(zflag[..., :14], axis=-1)
        body_zero = jnp.any(zflag & in_sym, axis=-1)
        nonconf = hdr_zero | body_zero

    byts_i = byts_i[..., :n_total]
    crc_field = byts_i[..., 2]
    ftype = byts_i[..., 3]
    header_ok = ((ftype == 1) | (ftype == 2)) & hdr_valid
    len_bad = ((ftype == FRAME_TYPE_DATA) & (dlen == 0)) | (
        dlen > cfg.max_frame_bytes)
    vl = vlens[:, None]
    hdr_incomplete = fs + cfg.header_samples > vl
    incomplete = fs + total_samples > vl
    dst = byts_i[..., 6]
    dst_ok = (dst == local_addr) | (local_addr < 0)

    in_frame = (jnp.arange(n_total)
                < (PHY_HEADER_BYTES + dlen)[..., None])
    bytes_m = jnp.where(in_frame, byts_i, 0)
    bits = bitops.unpack_bits(bytes_m.astype(jnp.uint8))
    payload_bits = bits[..., PHY_HEADER_BYTES * 8:]
    crc = bitops.crc8_bits_fixed_unzero(
        payload_bits, jnp.clip(dlen, 0, cfg.max_frame_bytes),
        cfg.max_frame_bytes)
    crc_ok = crc.astype(jnp.int32) == crc_field

    sfb_valid = ((n_valid_bits + 3) // 4) * 15 if not manchester \
        else n_valid_bits * 6
    consumed = jnp.where(
        ~header_ok, cfg.header_samples,
        jnp.where(len_bad, 1,
                  jnp.where(line_fail, cfg.preamble_len + sfb_valid,
                            cfg.preamble_len + total_samples)))
    stopf = hdr_incomplete | (header_ok & ~len_bad & incomplete)
    keepf = (~hdr_incomplete & header_ok & ~len_bad & ~incomplete
             & ~line_fail & dst_ok & crc_ok)
    fields = jnp.stack(
        [cand, consumed, stopf.astype(jnp.int32), keepf.astype(jnp.int32)],
        axis=1).astype(jnp.int32)                         # (B, 4, C)

    return SpecFields(cand=cand, fields=fields, overflow=overflow,
                      nonconf=nonconf, bytes_m=bytes_m, dlen=dlen,
                      ftype=ftype, seq=byts_i[..., 4], src=byts_i[..., 5],
                      dst=dst, corr=corr_cand)


def _spec_compact(a: SpecFields, keep: jax.Array, max_frames: int):
    """Compact kept candidates to the leading `max_frames` slots in
    position order (phase C).

    The selection runs as one-hot MATMULS, not gathers: sel (B, K, C)
    is exclusive along C per output slot, so einsum with it IS the
    gather — and XLA lowers a `take_along_axis` over the (B, C, 263)
    byte table to a scalar-driven gather that measured ~2.5 ms of the
    7.5 ms flagship decode, vs ~0.1 ms for the MXU contraction.  All
    selected fields are exact in f32 (bytes <= 255, positions < 2^24).
    """
    rank = jnp.cumsum(keep.astype(jnp.int32), axis=-1) - 1
    sel = keep[:, None, :] & (
        rank[:, None, :] == jnp.arange(max_frames)[None, :, None])
    any_k = jnp.any(sel, axis=-1)                        # (B, K)
    self_f = sel.astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST      # true-f32 MXU passes: exact
    #                                     for integers < 2^24

    def pick(arr, dtype):
        if arr.ndim == 2:                                # (B, C)
            out = jnp.einsum("bkc,bc->bk", self_f,
                             arr.astype(jnp.float32), precision=hi)
        else:                                            # (B, C, N)
            out = jnp.einsum("bkc,bcn->bkn", self_f,
                             arr.astype(jnp.float32), precision=hi)
        return out.astype(dtype)

    def pick_pos(arr):
        # positions reach 2^25 on flat long captures — above f32's
        # integer-exact range, so contract 16-bit halves separately
        lo16 = pick(arr & 0xFFFF, jnp.int32)
        hi16 = pick(arr >> 16, jnp.int32)
        return (hi16 << 16) + lo16

    out_bytes = pick(a.bytes_m, jnp.uint8)
    starts = pick_pos(a.cand)
    corr_v = pick(a.corr, jnp.float32)

    from trackmaker_tpu.phy.decoder import DecodedFrames
    return DecodedFrames(
        valid=any_k,
        frame_bytes=out_bytes,
        length=pick(a.dlen, jnp.int32),
        frame_type=pick(a.ftype, jnp.int32),
        sequence=pick(a.seq, jnp.int32),
        src=pick(a.src, jnp.int32),
        dst=pick(a.dst, jnp.int32),
        start=jnp.where(any_k, starts, -1),
        corr=jnp.where(any_k, corr_v, 0.0),
    )


def decode_capture_spec(
    cfg: PhyConfig,
    samples: jax.Array,          # f32[B, T]
    local_addr,
    max_frames: int = 64,
    n_cand: int = 128,
    valid_len=None,
    interpret: bool = False,
    start_cursor=None,
    scan_limit=None,
    with_cursor: bool = False,
):
    """Batched speculative decode.  Returns ``(DecodedFrames, ok[B])``;
    rows with ``ok=False`` (candidate overflow, or — 4B5B — a near-zero
    level average whose skip-carry the optimistic transition rule cannot
    replay) must be re-decoded with the exact path —
    :func:`trackmaker_tpu.phy.decoder.decode_capture_fast` does this
    automatically.  Valid frames are compacted to the leading slots in
    position order (the exact path instead leaves failed attempts as
    invalid slots in between; the valid-masked content is identical).

    `start_cursor`, `scan_limit` and `with_cursor` mirror
    :func:`trackmaker_tpu.phy.decoder.decode_capture`'s blocked-decode
    cursor semantics (per capture row here); with ``with_cursor=True``
    the return is ``(frames, ok, searched_until[B], final_cursor[B])``.
    Blocked callers that iterate the seam fixpoint should use
    :func:`_spec_phase_a` + :func:`_spec_walk` directly so phase A runs
    once (parallel/stream.py)."""
    _check_cfg(cfg)
    x = jnp.asarray(samples, jnp.float32)
    assert x.ndim == 2
    b, t = x.shape
    local_addr = jnp.asarray(local_addr, jnp.int32)
    vlens = jnp.broadcast_to(
        jnp.asarray(t if valid_len is None else valid_len, jnp.int32), (b,))

    a = _spec_phase_a(cfg, x, local_addr, n_cand, vlens, interpret)
    cur0 = 0 if start_cursor is None else start_cursor
    limit = int(_BIGI) if scan_limit is None else scan_limit
    keep, attempted, cur_f, done, pending = _spec_walk(
        a.fields, cur0, limit, max_frames, interpret)
    res = _spec_compact(a, keep, max_frames)
    ok = ~(a.overflow | jnp.any(attempted & a.nonconf, axis=-1))
    if not with_cursor:
        return res, ok
    searched_until = jnp.clip(
        jnp.where(pending < _BIGI, pending,
                  jnp.where(done, vlens - (cfg.preamble_len - 1), cur_f)),
        0, vlens)
    return res, ok, searched_until, cur_f


decode_capture_spec_jit = jax.jit(
    decode_capture_spec,
    static_argnames=("cfg", "max_frames", "n_cand", "interpret",
                     "with_cursor"))
