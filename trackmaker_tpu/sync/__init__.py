from trackmaker_tpu.sync.correlate import (  # noqa: F401
    normalized_xcorr,
    sliding_dot,
    sliding_energy,
)
from trackmaker_tpu.sync.pallas_xcorr import pallas_normalized_xcorr  # noqa: F401

import os

import jax
import numpy as _np


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def bf16_enabled() -> bool:
    """Whether the Pallas xcorr kernel may use bf16 multiplicands.

    Default OFF: decode_capture's invariant is decision-for-decision
    oracle equality, and single-pass bf16 is not provably equal to the
    f32 3-pass matmul at the corr>=0.9 threshold boundary.  bf16 was
    *measured* bit-identical on v5e (and is ~20% faster on the kernel),
    so callers that run their own correctness gate on real hardware —
    bench.py payload-verifies every decode — opt in via
    TM_XCORR_BF16=1.
    """
    return os.environ.get("TM_XCORR_BF16", "0") == "1"


def auto_xcorr(samples, pattern_np, pattern_energy=None, eps: float = 1e-6):
    """Normalized sliding correlation, dispatched by backend.

    On TPU the fused Pallas kernel is both ~18x faster than the XLA conv
    lowering and compiles in ~1s instead of minutes (measured on v5e via
    remote compile); on CPU the conv path is used (Pallas interpret mode
    would be slower and the conv compiles instantly there).
    """
    if _on_tpu():
        return pallas_normalized_xcorr(samples, _np.asarray(pattern_np),
                                       eps=eps, use_bf16=bf16_enabled())
    import jax.numpy as jnp
    return normalized_xcorr(samples, jnp.asarray(pattern_np),
                            pattern_energy, eps)


def auto_xcorr_row_stats(samples, pattern_np, eps: float = 1e-6):
    """(rowmax f32[R], rowpos i32[R]) — per-128-lag-row max of the
    normalized correlation and its absolute lag, R = ceil(T/128).

    Anchor-search primitive (dsp/equalizer.py): a top-k peel over these
    R-length vectors replaces argmax sweeps over the dense T-length
    correlation.  On TPU one fused Pallas pass (the dense corr never
    reaches HBM); anchors are quality-gated heuristics, not
    oracle-decision inputs, so the kernel always runs bf16 multiplicands
    (~0.4% relative corr error vs a 0.5 quality gate).  On CPU the same
    stats from the dense conv path."""
    if _on_tpu():
        from trackmaker_tpu.sync.pallas_xcorr import pallas_xcorr_rowstats
        return pallas_xcorr_rowstats(samples, _np.asarray(pattern_np),
                                     eps=eps, use_bf16=True)
    import jax.numpy as jnp
    corr = normalized_xcorr(samples, jnp.asarray(pattern_np), None, eps)
    n = corr.shape[-1]
    r = -(-n // 128)
    cm = jnp.pad(corr, (0, r * 128 - n),
                 constant_values=-_np.float32(3.4e38)).reshape(r, 128)
    rowmax = jnp.max(cm, axis=1)
    rowpos = jnp.arange(r, dtype=jnp.int32) * 128 \
        + jnp.argmax(cm, axis=1).astype(jnp.int32)
    return rowmax, rowpos


def find_pattern_starts(rx, pattern_np, threshold: float,
                        max_frames: int = 64,
                        min_sep: int | None = None):
    """Generic threshold-crossing preamble finder: int32[max_frames]
    pattern starts (-1 padding), in order, separated by at least
    `min_sep` samples (default: one pattern length).  Callers decoding
    equal-length frames pass min_sep = frame_samples so in-body
    threshold crossings (line-coded data can correlate with the
    preamble at lowered thresholds) are consumed like the streaming
    decoders' cursor does.

    The OFDM receivers' chirp sync generalized to any host-constant
    pattern (Manchester/4B5B preambles for the coded PHYs' batched
    decode).  Same structure as `phy/ofdm.py:find_preambles` (which
    delegates here): block-bitmap first-crossing queries + aligned-row
    masked-argmax refine over one pattern span — no `nonzero`, no
    traced-start dynamic slices (CLAUDE.md gather rules).  Traceable
    under jit/vmap/shard_map (the scan carry derives from rx)."""
    import jax.numpy as jnp
    from trackmaker_tpu.core import blockq

    pattern_np = _np.asarray(pattern_np, _np.float32)
    corr = auto_xcorr(rx, pattern_np)
    t = corr.shape[-1]
    hits = corr >= threshold
    tables = blockq.block_tables(hits)
    w = len(pattern_np)
    sep = w if min_sep is None else int(min_sep)
    r_ = 512
    n_need = (w + r_ - 1) // r_ + 1
    nrows = -(-(t + w) // r_) + n_need
    rows = jnp.pad(corr, (0, nrows * r_ - t)).reshape(nrows, r_)
    lane = jnp.arange(n_need * r_, dtype=jnp.int32)

    def step(carry, _):
        cursor, done = carry
        first, has = blockq.first_set_from(tables, cursor)
        first = jnp.where(has, first, 0)
        jb, off = first // r_, first % r_
        win = jnp.concatenate([rows[jb + i] for i in range(n_need)])
        ok = (lane >= off) & (lane < off + w)
        peak = jb * r_ + jnp.argmax(jnp.where(ok, win, -jnp.inf))
        new_cursor = peak + sep
        out = jnp.where(has & ~done, peak, -1)
        return (jnp.where(has, new_cursor, cursor), done | ~has), out

    zero = (rx[0] * 0).astype(jnp.int32)
    (_, _), starts = jax.lax.scan(
        step, (zero, zero > 0), None, length=max_frames,
        unroll=min(8, max_frames))
    return starts


def auto_sliding_dot_scaled(samples, pattern_np, scale: float):
    """Raw sliding dot(x[i-L+1..i], p)*scale aligned so lag i ends at
    sample i (left zero-history), length == len(samples).  The ASK
    receiver's sync correlator."""
    import jax.numpy as jnp
    l = len(pattern_np)
    padded = jnp.concatenate(
        [jnp.zeros(l - 1, jnp.float32), samples.astype(jnp.float32)])
    if _on_tpu():
        return pallas_normalized_xcorr(
            padded, _np.asarray(pattern_np), normalize=False, scale=scale,
            use_bf16=bf16_enabled())
    out = sliding_dot(padded, jnp.asarray(pattern_np, jnp.float32)) * scale
    return out
