"""Walk-implementation shootout on the real chip (fused timing).

Times _spec_walk variants on realistic (B, 4, C) fields extracted from
a flagship-shaped capture, plus synthetic dense tables.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
from trackmaker_tpu.phy import pallas_decode as pd

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
B, C, MF = 32, 128, 72
rng = np.random.default_rng(3)

pos = np.sort(rng.integers(0, 400_000, (B, C)), axis=1)
fields_np = np.stack([
    pos,
    rng.integers(1, 7000, (B, C)),
    (rng.random((B, C)) < 0.1).astype(np.int64),
    (rng.random((B, C)) < 0.9).astype(np.int64),
], axis=1)
fields = jnp.asarray(fields_np, jnp.int32)

def sync1(r):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])

def timeit_fused(name, fn, x, iters=ITERS, repeats=3):
    @jax.jit
    def loop(x):
        def body(c, i):
            r = fn(x + i)           # i32 zero-ish perturbation: i*0
            leaf = jax.tree_util.tree_leaves(r)[0]
            return c + jnp.sum(leaf.astype(jnp.float32)), None
        out, _ = jax.lax.scan(
            body, jnp.float32(0.0),
            jnp.zeros((iters,), jnp.int32))
        return out
    r = loop(x); sync1(r)
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        r = loop(x); sync1(r)
        ts.append((time.time() - t0) / iters * 1000)
    print(f"{name:28s} {min(ts):8.3f} ms  (med {sorted(ts)[1]:.3f})",
          flush=True)
    return min(ts)


def walk_current(f):
    """prepare + query: the shipped _spec_walk (one-hot scan chase)."""
    return pd._spec_walk(f, 0, int(pd._BIGI), MF)[0]

def prepare_only(f):
    return pd._spec_walk_prepare(f, int(pd._BIGI), MF)[0]

def nxt_only(f):
    pos = f[:, 0, :]
    consumed = f[:, 1, :]
    stopf = f[:, 2, :] > 0
    exists = pos < pd._BIGI
    target = pos + consumed
    nxt = jnp.sum((pos[:, None, :] < target[:, :, None])
                  .astype(jnp.int32), axis=-1)
    return jnp.where(stopf | ~exists, C, nxt)


def walk_matvec(f):
    """Vector iteration: visited = sum_k v0 M^k, k < MF."""
    pos = f[:, 0, :]
    consumed = f[:, 1, :]
    stopf = f[:, 2, :] > 0
    keepf = f[:, 3, :] > 0
    exists = pos < pd._BIGI
    target = pos + consumed
    nxt = jnp.sum((pos[:, None, :] < target[:, :, None])
                  .astype(jnp.int32), axis=-1)
    nxt = jnp.where(stopf | ~exists, C, nxt)
    ar = jnp.arange(C + 1)
    m = (nxt[:, :, None] == ar[None, None, :]).astype(jnp.float32)
    m = jnp.concatenate([m, jnp.zeros((B, 1, C + 1), jnp.float32)], 1)
    s0 = jnp.zeros((B,), jnp.int32)
    v = (jnp.sum((pos < 0).astype(jnp.int32), -1)[:, None]
         == ar[None, :]).astype(jnp.float32)
    def body(carry, _):
        v, acc = carry
        acc = acc + v
        v = jnp.einsum("bc,bcj->bj", v, m)
        return (v, acc), None
    (v, acc), _ = jax.lax.scan(body, (v, jnp.zeros_like(v)),
                               None, length=MF, unroll=8)
    att = (acc[:, :C] > 0.5) & exists
    return att & keepf & ~stopf


def walk_gather(f):
    """Pure pointer-chase: cur = nxt[cur], one-hot accumulate."""
    pos = f[:, 0, :]
    consumed = f[:, 1, :]
    stopf = f[:, 2, :] > 0
    keepf = f[:, 3, :] > 0
    exists = pos < pd._BIGI
    target = pos + consumed
    nxtp = jnp.sum((pos[:, None, :] < target[:, :, None])
                   .astype(jnp.int32), axis=-1)
    nxtp = jnp.where(stopf | ~exists, C, nxtp)
    nxt_ext = jnp.concatenate(
        [nxtp, jnp.full((B, 1), C, jnp.int32)], axis=1)  # sink->sink
    ar = jnp.arange(C + 1)[None, :]
    cur = jnp.sum((pos < 0).astype(jnp.int32), -1)       # (B,)
    def body(carry, _):
        cur, acc = carry
        acc = acc | (ar == cur[:, None])
        cur = jnp.take_along_axis(nxt_ext, cur[:, None], axis=1)[:, 0]
        return (cur, acc), None
    (cur, acc), _ = jax.lax.scan(
        body, (cur, jnp.zeros((B, C + 1), bool)), None,
        length=MF, unroll=8)
    att = acc[:, :C] & exists
    return att & keepf & ~stopf


def walk_smem(f):
    return pd._spec_walk_smem(f, 0, int(pd._BIGI), MF)[0]


timeit_fused("nxt only", nxt_only, fields)
timeit_fused("prepare only", prepare_only, fields)
timeit_fused("walk current", walk_current, fields)
timeit_fused("walk matvec scan", walk_matvec, fields)
timeit_fused("walk gather scan", walk_gather, fields)
timeit_fused("walk smem kernel", walk_smem, fields)


# r5: unroll sweep of the shipped walk (WALK_UNROLL read at trace time;
# each timeit re-jits, so flipping the module flag retraces)
for u in (8, 16, 24, 36, 72):
    pd.WALK_UNROLL = u
    timeit_fused(f"walk unroll={u}", walk_current, fields)
pd.WALK_UNROLL = 8

# agreement check
a = np.asarray(walk_current(fields))
for name, fn in (("matvec", walk_matvec), ("gather", walk_gather),
                 ("smem", walk_smem)):
    got = np.asarray(fn(fields))
    print(f"agree {name}: {np.array_equal(a, got)}", flush=True)

sys.stdout.flush(); os._exit(0)
