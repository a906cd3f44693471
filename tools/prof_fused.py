"""Stage profiler with in-program iteration loops: immune to the
tunnel's per-dispatch RTT.  argv: [encoding] [iters]"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
from trackmaker_tpu.core.config import PhyConfig
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.phy.encoder import PhyEncoder
from trackmaker_tpu.phy import pallas_decode as pd

enc_name = sys.argv[1] if len(sys.argv) > 1 else "manchester"
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
rng = np.random.default_rng(0)
cfg = PhyConfig(line_coding=enc_name)
n_frames, batch = 64, 32
frames = [Frame.new_data(i & 0xFF, 1, 2,
          rng.integers(0, 256, 128, dtype=np.uint8).tobytes())
          for i in range(n_frames)]
wave = PhyEncoder(cfg).encode_frames(frames, gap_samples=200)
t = len(wave)
caps = np.stack([wave + rng.normal(0, 0.05, t).astype(np.float32)
                 for _ in range(batch)])
x = jnp.asarray(caps)
print(f"enc={enc_name} t={t} batch={batch} total={batch*t/1e6:.1f}M iters={ITERS}", flush=True)

def sync1(r):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])

def timeit_fused(name, fn, x, iters=ITERS, repeats=3):
    @jax.jit
    def loop(x):
        def body(c, i):
            r = fn(x + i.astype(jnp.float32) * 1e-30)
            # sum EVERY leaf: summing only the first let XLA
            # dead-code-eliminate the other outputs (measured: it
            # dropped the whole attempt kernel from "phase_a")
            s = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(r):
                s = s + jnp.sum(leaf.astype(jnp.float32))
            return c + s, None
        out, _ = jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(iters, dtype=jnp.int32))
        return out
    r = loop(x); sync1(r)
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        r = loop(x)
        sync1(r)
        ts.append((time.time() - t0) / iters * 1000)
    print(f"{name:24s} {min(ts):8.2f} ms  (med {sorted(ts)[1]:.2f})", flush=True)
    return min(ts)

from trackmaker_tpu import sync as sync_mod
from trackmaker_tpu.sync.pallas_xcorr import pallas_xcorr_hits
from trackmaker_tpu.phy import line_coding
pre_np = line_coding.preamble_waveform(cfg)
# match phy/pallas_decode._spec_phase_a's lag-tile heuristic
if t >= 200_000:
    xc_blk = 32768
elif t >= 131_072:
    xc_blk = 16384
else:
    xc_blk = 8192

def xcorr_raw(x):
    return jax.vmap(lambda s: pallas_xcorr_hits(
        s, pre_np, cfg.correlation_threshold, blk=xc_blk,
        use_bf16=sync_mod.bf16_enabled(), emit_corr=False))(x)[1]

def xcorr_bf16(x):
    return jax.vmap(lambda s: pallas_xcorr_hits(
        s, pre_np, cfg.correlation_threshold, blk=xc_blk,
        use_bf16=True, emit_corr=False))(x)[1]

def xcorr_extract(x):
    _, rows = jax.vmap(lambda s: pallas_xcorr_hits(
        s, pre_np, cfg.correlation_threshold, blk=xc_blk,
        use_bf16=sync_mod.bf16_enabled(), emit_corr=False))(x)
    return pd._compact_hit_rows(rows, 128)

vlens = jnp.full((batch,), t, jnp.int32)

def xcorr_refine(x):
    from trackmaker_tpu.sync.pallas_xcorr import pallas_xcorr_hits_refine
    sp_l = pre_np[cfg.preamble_len - cfg.sync_len:]
    return pallas_xcorr_hits_refine(
        x, vlens, pre_np, sp_l, cfg.correlation_threshold,
        sync_off=cfg.preamble_len - cfg.sync_len - cfg.sync_margin,
        n_pos=2 * cfg.sync_margin + 1, sync_len=cfg.sync_len,
        fall_off=cfg.preamble_len, blk=xc_blk,
        use_bf16=sync_mod.bf16_enabled())

def phase_a(x):
    return pd._spec_phase_a(cfg, x, jnp.int32(2), 128, vlens)

def full(x):
    return pd.decode_capture_spec(cfg, x, 2, max_frames=72)

timeit_fused("xcorr only", xcorr_raw, x)
timeit_fused("xcorr bf16", xcorr_bf16, x)
timeit_fused("xcorr+extract", xcorr_extract, x)
try:
    timeit_fused("xcorr+refine", xcorr_refine, x)
except Exception as e:
    print("xcorr+refine failed:", repr(e)[:200], flush=True)
timeit_fused("phase_a", phase_a, x)
timeit_fused("full spec decode", full, x)
for blk_try in (8192, 32768, 65536):
    def xc(x, b=blk_try):
        return jax.vmap(lambda s: pallas_xcorr_hits(
            s, pre_np, cfg.correlation_threshold, blk=b,
            use_bf16=False, emit_corr=False))(x)[1]
    timeit_fused(f"xcorr blk={blk_try}", xc, x)


# --- attempt-kernel / decision-epilogue split: time phase A with the
# epilogue consumers replaced by a raw sum of the kernel output ---
def _attempt_sum_fn():
    """Build a jittable fn that runs candidate extraction + the attempt
    kernel ONLY (sums its raw output), mirroring _spec_phase_a's
    manchester arm."""
    import functools as ft
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from trackmaker_tpu.phy.pallas_decode import (
        _attempt_kernel, _body_table, _pack_table,
        BROWS, NR, DROW)
    from trackmaker_tpu.phy import pallas_decode as pdm

    from trackmaker_tpu.sync.pallas_xcorr import pallas_xcorr_hits_refine

    pre2 = line_coding.preamble_waveform(cfg)
    sp = pre2[cfg.preamble_len - cfg.sync_len:]
    t8_np, sync_e = pdm._sync_tables(tuple(sp.tolist()),
                                     2 * cfg.sync_margin + 1)
    fold = pdm.SYNC_FOLD

    def fn(x):
        b, tt = x.shape
        if fold:
            rows = pallas_xcorr_hits_refine(
                x, vlens, pre2, sp, cfg.correlation_threshold,
                sync_off=cfg.preamble_len - cfg.sync_len
                - cfg.sync_margin,
                n_pos=2 * cfg.sync_margin + 1, sync_len=cfg.sync_len,
                fall_off=cfg.preamble_len, blk=xc_blk)
            cand, corr_cand, n_valid, overflow, fs_cand = \
                pdm._compact_hit_rows(rows, 128, with_fs=True)
        else:
            _, rows = jax.vmap(lambda s: pallas_xcorr_hits(
                s, pre2, cfg.correlation_threshold, blk=xc_blk,
                use_bf16=False, emit_corr=False))(x)
            cand, corr_cand, n_valid, overflow = \
                pdm._compact_hit_rows(rows, 128)
            fs_cand = jnp.zeros_like(cand)
        r384 = -(-(tt + 48) // DROW) + NR + 10
        x384 = jnp.pad(x, ((0, 0), (0, r384 * DROW - tt))).reshape(
            b, r384, DROW)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(b,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)]
            * (2 if fold else 3),
            out_specs=pl.BlockSpec(
                (1, 128, BROWS, 128), lambda bb, *_: (bb, 0, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((pdm.ATTEMPT_PIPE, NR, DROW), jnp.float32),
                pltpu.SemaphoreType.DMA((pdm.ATTEMPT_PIPE,)),
            ],
        )
        tables = [] if fold else [jnp.asarray(t8_np)]
        out = pl.pallas_call(
            ft.partial(_attempt_kernel, n_cand=128, t_max=tt,
                       sync_e=sync_e, fold_sync=fold),
            out_shape=jax.ShapeDtypeStruct((b, 128, BROWS, 128),
                                           jnp.float32),
            grid_spec=grid_spec,
        )(cand, fs_cand, vlens, n_valid.astype(jnp.int32), x384,
          *tables, jnp.asarray(_body_table()),
          jnp.asarray(_pack_table()))
        return out
    return fn


if enc_name == "manchester":
    try:
        timeit_fused("xcorr+extract+attempt", _attempt_sum_fn(), x)
    except Exception as e:
        print("attempt-only stage failed:", repr(e)[:200], flush=True)

# --- appended stages: walk/compact split ---
def phase_a_walk(x):
    a = pd._spec_phase_a(cfg, x, jnp.int32(2), 128, vlens)
    keep, att, fcur, done, pend = pd._spec_walk(a.fields, 0, int(pd._BIGI), 72)
    return keep

def phase_a_walk_compact(x):
    a = pd._spec_phase_a(cfg, x, jnp.int32(2), 128, vlens)
    keep, att, fcur, done, pend = pd._spec_walk(a.fields, 0, int(pd._BIGI), 72)
    return pd._spec_compact(a, keep, 72).valid

timeit_fused("phase_a+walk", phase_a_walk, x)
timeit_fused("phase_a+walk+compact", phase_a_walk_compact, x)

sys.stdout.flush(); os._exit(0)
