import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from trackmaker_tpu.phy.pallas_decode import _BIGI, _spec_walk, _spec_walk_smem

rng = np.random.default_rng(17)
trial = 0
b = int(rng.integers(1, 5))
c = int(rng.choice([8, 32, 128]))
n_real = rng.integers(0, c + 1, b)
pos = np.full((b, c), int(_BIGI), np.int64)
for i in range(b):
    k = int(n_real[i])
    pos[i, :k] = np.sort(rng.integers(0, 40_000, k))
consumed = rng.integers(1, 3000, (b, c))
stopf = (rng.random((b, c)) < 0.25).astype(np.int64)
keepf = (rng.random((b, c)) < 0.6).astype(np.int64)
fields = jnp.asarray(np.stack([pos, consumed, stopf, keepf], axis=1), jnp.int32)
cur0 = jnp.asarray(rng.integers(0, 30_000, b), jnp.int32)
limit = jnp.asarray(rng.choice([20_000, 41_000, int(_BIGI)], b), jnp.int32)
mf = int(rng.choice([1, 2, 5, c, 2 * c]))

print("b,c,mf:", b, c, mf)
print("cur0:", np.asarray(cur0), "limit:", np.asarray(limit))
got = _spec_walk(fields, cur0, limit, mf)
want = _spec_walk_smem(fields, cur0, limit, mf, interpret=True)
names = ("keep", "attempted", "cur_f", "done", "pending")
for name, g, w in zip(names, got, want):
    g, w = np.asarray(g), np.asarray(w)
    if not np.array_equal(g, w):
        print("MISMATCH", name)
        for i in range(b):
            if g.ndim > 1 and not np.array_equal(g[i], w[i]):
                idx = np.nonzero(g[i] != w[i])[0]
                print(" row", i, "diff idx", idx)
                print("  pos      ", pos[i][:20])
                print("  consumed ", consumed[i][:20])
                print("  stopf    ", stopf[i][:20])
                print("  keepf    ", keepf[i][:20])
                print("  got att/keep:", np.nonzero(g[i])[0])
                print("  want att/keep:", np.nonzero(w[i])[0])
            elif g.ndim == 1 and g[i] != w[i]:
                print(" row", i, "got", g[i], "want", w[i])
sys.stdout.flush(); os._exit(0)
