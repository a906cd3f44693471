"""Candidate-parallel attempt-phase stage split (fused in-program
timing): where do par mode's ~8 ms go on the flagship shape?

Rows:
  stencil        _stencil_rows alone (incl. the (N,6) swapaxes)
  stencil_notr   same adds/pad but NO phase-decimation transpose
                 (wrong layout — isolates the relayout cost)
  +gather        stencil + per-candidate whole-row takes
  +realign       ... + _realign128 lane realign
  par_full       _par_attempt_manchester end-to-end
  seq_ref        fold-mode phase A (sequential attempt kernels) for
                 the same capture, as the thing to beat

argv: [iters]    run when the tunnel is up:
    timeout 900 python -u tools/prof_par.py 100 > /tmp/prof_par.log
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
from trackmaker_tpu.phy.encoder import PhyEncoder
from trackmaker_tpu.phy import pallas_decode as pd

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
rng = np.random.default_rng(0)
cfg = PhyConfig()
n_frames, batch = 64, 32
frames = [Frame.new_data(i & 0xFF, 1, 2,
          rng.integers(0, 256, 128, dtype=np.uint8).tobytes())
          for i in range(n_frames)]
wave = PhyEncoder(cfg).encode_frames(frames, gap_samples=200)
t = len(wave)
caps = np.stack([wave + rng.normal(0, 0.05, t).astype(np.float32)
                 for _ in range(batch)])
x = jnp.asarray(caps)
vlens = jnp.full((batch,), t, jnp.int32)
# synthetic-but-realistic candidate fs grid: n_frames true starts plus
# spread duplicates up to C=128 (values only steer gathers; any
# in-range fs exercises the same work)
C = 128
fs_np = np.linspace(100, t - 3000, C).astype(np.int32)
fs = jnp.asarray(np.tile(fs_np, (batch, 1)))
print(f"t={t} batch={batch} C={C} iters={ITERS}", flush=True)


def timeit(name, fn, *args):
    @jax.jit
    def loop(a0):
        def body(c, i):
            r = fn(a0 + i.astype(jnp.float32) * 1e-30, *args[1:])
            s = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(r):
                s = s + jnp.sum(leaf.astype(jnp.float32))
            return c + s, None
        out, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(ITERS, dtype=jnp.int32))
        return out
    r = loop(args[0]); np.asarray(r)
    ts = []
    for _ in range(3):
        t0 = time.time(); r = loop(args[0]); np.asarray(r)
        ts.append((time.time() - t0) / ITERS * 1000)
    ts.sort()
    print(f"{name:14s} {ts[0]:7.3f} ms  (med {ts[1]:.3f})", flush=True)
    return ts[0]


NROW = 18


def stencil(xx):
    return pd._stencil_rows(xx, (1, 1, 1, -1, -1, -1), 6, NROW + 2)


def stencil_notr(xx):
    # same pad + shifted adds, no decimation transpose
    tt = xx.shape[-1]
    rp = -(-(tt // 6 + 1) // 128) + NROW + 2
    tpad = 6 * 128 * rp
    xp = jnp.pad(xx, [(0, 0), (0, tpad + 6 - tt)])
    s = xp[..., 0:tpad]
    for j, cj in enumerate((1, 1, -1, -1, -1), start=1):
        term = xp[..., j:tpad + j]
        s = s + term if cj > 0 else s - term
    return s.reshape(batch, 6 * rp, 128)


def gather(xx):
    rows = stencil(xx)
    return pd._par_gather(rows, fs, 6, NROW)


def realign(xx):
    flat, ql = pd._par_gather(stencil(xx), fs, 6, NROW)
    return pd._realign128(flat, ql, pd.BROWS * 8 * 8)


def par_full(xx):
    return pd._par_attempt_manchester(xx, fs)


INTERPRET = os.environ.get("TM_CPU", "0") == "1"


def seq_ref(xx):
    return pd._spec_phase_a(cfg, xx, jnp.int32(2), C, vlens,
                            interpret=INTERPRET)


r_st = timeit("stencil", stencil, x)
r_nt = timeit("stencil_notr", stencil_notr, x)
timeit("+gather", gather, x)
timeit("+realign", realign, x)
timeit("par_full", par_full, x)
timeit("seq_phase_a", seq_ref, x)
print(f"transpose cost ~= {r_st - r_nt:.3f} ms", flush=True)
sys.stdout.flush()
os._exit(0)
