"""ASK speculative-receiver stage profiler (fused in-program timing,
every output leaf summed — see prof_fused.py).  argv: [iters] [batch]"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
from trackmaker_tpu.phy import ask, ask_spec

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 16
cfg = ask.AskConfig()
n_frames = 64
frames = ask.build_frames(b"the quick brown fox", cfg, num_frames=n_frames)
waves = [ask.build_track(cfg, frames, seed=7 + b) for b in range(BATCH)]
t = max(len(w) for w in waves)
caps = np.zeros((BATCH, t), np.float32)
for b, w in enumerate(waves):
    caps[b, :len(w)] = w
x = jnp.asarray(caps)
print(f"ask t={t} batch={BATCH} total={BATCH*t/1e6:.1f}M iters={ITERS}",
      flush=True)


def sync1(r):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])


def timeit_fused(name, fn, x, iters=ITERS, repeats=3):
    @jax.jit
    def loop(x):
        def body(c, i):
            r = fn(x + i.astype(jnp.float32) * 1e-30)
            s = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(r):
                s = s + jnp.sum(leaf.astype(jnp.float32))
            return c + s, None
        out, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(iters, dtype=jnp.int32))
        return out
    r = loop(x); sync1(r)
    ts = []
    for _ in range(repeats):
        t0 = time.time(); r = loop(x); sync1(r)
        ts.append((time.time() - t0) / iters * 1000)
    print(f"{name:24s} {min(ts):8.2f} ms  (med {sorted(ts)[1]:.2f})",
          flush=True)
    return min(ts)


from trackmaker_tpu.phy.pallas_decode import _extract_candidates

N_CAND, CHAIN_W, MAXF = 96, int(os.environ.get("TM_ASK_CW", "512")), n_frames + 8


def stage_dense(x):
    return jax.vmap(lambda row: ask.dense_arrays(cfg, row))(x)


def stage_cand(x):
    def one(row):
        power, sync, upd_ok = ask.dense_arrays(cfg, row)
        hits = ask_spec.dense_fire_candidates(cfg, sync, upd_ok)
        return _extract_candidates(hits, N_CAND, rpb=8)
    return jax.vmap(one)(x)


def stage_phase_b(x):
    def one(row):
        power, sync, upd_ok = ask.dense_arrays(cfg, row)
        hits = ask_spec.dense_fire_candidates(cfg, sync, upd_ok)
        cand, _nv, overflow = _extract_candidates(hits, N_CAND, rpb=8)
        virt = jnp.full((1,), -(cfg.frame_samples + 1), jnp.int32)
        cand_full = jnp.concatenate([virt, cand])
        fields, rx_pad = ask_spec._phase_b(
            cfg, row, power, sync, upd_ok, cand_full, CHAIN_W)
        return fields, overflow
    return jax.vmap(one)(x)


def stage_walk(x):
    def one(row):
        power, sync, upd_ok = ask.dense_arrays(cfg, row)
        hits = ask_spec.dense_fire_candidates(cfg, sync, upd_ok)
        cand, _nv, overflow = _extract_candidates(hits, N_CAND, rpb=8)
        virt = jnp.full((1,), -(cfg.frame_samples + 1), jnp.int32)
        cand_full = jnp.concatenate([virt, cand])
        fields, rx_pad = ask_spec._phase_b(
            cfg, row, power, sync, upd_ok, cand_full, CHAIN_W)
        return fields, rx_pad, overflow
    fields, rx_pads, overflow = jax.vmap(one)(x)
    return ask_spec._walk(fields, MAXF, False)


def full(x):
    return ask_spec.demodulate_spec(cfg, x, max_frames=MAXF,
                                    n_cand=N_CAND,
                                    chain_window=CHAIN_W)


timeit_fused("dense arrays", stage_dense, x)
timeit_fused("+fire+extract", stage_cand, x)
timeit_fused("+phase_b", stage_phase_b, x)
timeit_fused("+walk", stage_walk, x)
timeit_fused("full spec demod", full, x)
sys.stdout.flush(); os._exit(0)
