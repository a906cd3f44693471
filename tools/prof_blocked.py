"""Stage profile of the blocked_600s row: where do the ~8 ms go?
Flagship scaling predicts ~4.5-5 ms for 28.8M samples (2.07x the
13.9M flagship sweep + sparse attempts), so the gap is in compaction,
the walk fixpoint, or the epilogue.  Stages, each in-program-looped
(full-leaf carry sums), both fold modes for the kernel stages:

  xcorr hits        pallas_xcorr_hits over the flat capture
  xcorr+refine      pallas_xcorr_hits_refine (the fold-mode kernel)
  phase_a legacy    hits + compaction + attempts (delta stash)
  phase_a fold      same via the refine-fold path
  full legacy/fold  _decode_blocked_spec (walk fixpoint + compact)

Run when the tunnel is up:
    timeout 1500 python -u tools/prof_blocked.py [iters] > /tmp/prof_blocked.log
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
if os.environ.get("TM_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")

from trackmaker_tpu.core.config import PhyConfig
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.oracle.phy import OracleEncoder
from trackmaker_tpu.phy import line_coding
from trackmaker_tpu.phy import pallas_decode as pd
from trackmaker_tpu.parallel import stream as pstream
from trackmaker_tpu import sync as sync_mod
from trackmaker_tpu.sync.pallas_xcorr import (pallas_xcorr_hits,
                                              pallas_xcorr_hits_refine)

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
SECONDS = int(os.environ.get("TM_PB_SECONDS", "600"))
INTERPRET = os.environ.get("TM_CPU", "0") == "1"

cfg = PhyConfig()
rng = np.random.default_rng(0)
t = SECONDS * 48_000
n_blocks = max(2, (64 * SECONDS) // 600)
n_frames = max(2, (48 * SECONDS) // 600)
enc = OracleEncoder(cfg)
wave = np.zeros(t, np.float32)
step = t // (n_frames + 1)
for i in range(n_frames):
    w = enc.encode_frame(Frame.new_data(i, 1, 2, bytes([i]) * 64))
    wave[(i + 1) * step:(i + 1) * step + len(w)] = w
wave += rng.normal(0, 0.05, t).astype(np.float32)
x = jnp.asarray(wave)
block = -(-(-(-t // n_blocks)) // 128) * 128
t_pad = n_blocks * block
print(f"backend={jax.default_backend()} t={t} blocks={n_blocks} "
      f"iters={ITERS}", flush=True)

pre_np = np.asarray(line_coding.preamble_waveform(cfg))
sp_np = pre_np[cfg.preamble_len - cfg.sync_len:]


def inloop(fn, n=ITERS):
    @jax.jit
    def loop(xx):
        def body(c, i):
            r = fn(xx + i.astype(jnp.float32) * 1e-30)
            s = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(r):
                s = s + jnp.sum(leaf.astype(jnp.float32))
            return c + s, None
        out, _ = jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(n, dtype=jnp.int32))
        return out
    return loop


def timed(label, fn):
    loop = inloop(fn)
    r = loop(x)
    np.asarray(r)
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(loop(x))
        ts.append((time.time() - t0) / ITERS * 1000)
    print(f"  {label:24s} {min(ts):8.3f} ms  (med {sorted(ts)[1]:.3f})",
          flush=True)
    return min(ts)


def hits_only(xx):
    xp = jnp.pad(xx, (0, t_pad - t))
    return pallas_xcorr_hits(xp, pre_np, cfg.correlation_threshold,
                             blk=32768, interpret=INTERPRET,
                             use_bf16=sync_mod.bf16_enabled(),
                             emit_corr=False)[1]


def hits_refine(xx):
    xp = jnp.pad(xx, (0, t_pad - t))
    return pallas_xcorr_hits_refine(
        xp[None], jnp.asarray([t], jnp.int32), pre_np, sp_np,
        cfg.correlation_threshold,
        sync_off=cfg.preamble_len - cfg.sync_len - cfg.sync_margin,
        n_pos=2 * cfg.sync_margin + 1, sync_len=cfg.sync_len,
        fall_off=cfg.preamble_len, blk=32768, interpret=INTERPRET,
        use_bf16=sync_mod.bf16_enabled())


def phase_a(xx):
    xp = jnp.pad(xx, (0, t_pad - t))
    vlens = jnp.full((n_blocks,), t, jnp.int32)
    a = pd._spec_phase_a(cfg, xp, jnp.int32(2), 128, vlens, INTERPRET,
                         flat_blocks=(n_blocks, block))
    return (a.fields, a.overflow)


def full(xx):
    # unjitted form: each timed() builds a fresh outer jit, so the
    # SYNC_FOLD module flag is re-read at trace time (the jitted
    # wrapper would hit its arg-keyed cache and ignore the flip)
    return pstream._decode_blocked_spec(cfg, xx, 2, n_blocks, 8, t,
                                        128, INTERPRET)


timed("xcorr hits", hits_only)
timed("xcorr+refine (fold)", hits_refine)
old = pd.SYNC_FOLD
for mode, val in (("legacy", False), ("fold", True)):
    pd.SYNC_FOLD = val
    timed(f"phase_a {mode}", phase_a)
    timed(f"full {mode}", full)
pd.SYNC_FOLD = old
sys.stdout.flush()
os._exit(0)
