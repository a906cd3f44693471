"""ASK spec-receiver profile: payload-gated, in-program iteration
loop per tools/prof_fused.py.  (Was the pairscan-vs-blockscan A/B; the
blockscan lost 2.1x on-chip -- 8.5k vs 17.9k x -- and was deleted,
r5.)

    timeout 1200 python -u tools/ab_ask.py [iters] [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
if os.environ.get("TM_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from trackmaker_tpu.phy import ask, ask_spec

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 16
INTERPRET = os.environ.get("TM_CPU", "0") == "1"

cfg = ask.AskConfig()
n_frames = 64
frames = ask.build_frames(b"the quick brown fox", cfg, num_frames=n_frames)
waves = [ask.build_track(cfg, frames, seed=7 + b) for b in range(BATCH)]
t = max(len(w) for w in waves)
caps = np.zeros((BATCH, t), np.float32)
for b, w in enumerate(waves):
    caps[b, :len(w)] = w
x = jnp.asarray(caps)
MAXF = n_frames + 8
print(f"backend={jax.default_backend()} t={t} batch={BATCH} iters={ITERS}",
      flush=True)


def fn(xi):
    return ask_spec.demodulate_spec(cfg, xi, max_frames=MAXF, n_cand=96,
                                    chain_window=int(os.environ.get("TM_ASK_CW", "512")),
                                    interpret=INTERPRET)


def gate():
    """bench_ask's payload gate under the current flag."""
    res, okflags = jax.tree_util.tree_map(np.asarray, fn(x))
    if not okflags.all():
        print(f"  GATE FAILED: conformance ok_frac={okflags.mean():.2f}",
              flush=True)
        return False
    ok = res.valid
    if int(ok.sum()) != BATCH * n_frames:
        print(f"  GATE FAILED: valid {int(ok.sum())}/{BATCH * n_frames}",
              flush=True)
        return False
    for b in range(BATCH):
        if not np.array_equal(res.bits[b][ok[b]], frames[:, 8:]):
            print(f"  GATE FAILED: payload b={b}", flush=True)
            return False
    print("  GATE ok (payload-exact)", flush=True)
    return True


def measure():
    @jax.jit
    def loop(xx):
        def body(c, i):
            r = fn(xx + i.astype(jnp.float32) * 1e-30)
            s = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(r):
                s = s + jnp.sum(leaf.astype(jnp.float32))
            return c + s, None
        out, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(ITERS, dtype=jnp.int32))
        return out

    r = loop(x)
    np.asarray(r)
    ts = []
    for _ in range(3):
        t0 = time.time()
        r = loop(x)
        np.asarray(r)
        ts.append((time.time() - t0) / ITERS * 1000)
    return min(ts), sorted(ts)[1]


print("pairscan: gating...", flush=True)
assert gate()
best, med = measure()
xr = BATCH * t / cfg.sample_rate / (best / 1000.0)
print(f"pairscan {best:7.2f} ms (med {med:.2f})  {xr:9.0f}x", flush=True)
sys.stdout.flush()
os._exit(0)
