"""One-process attempt-layout A/B on the flagship shape: times ONLY
the full spec decode per flag combo (module globals are read at trace
time, so flipping them and re-jitting retraces — no subprocess, no
re-import, one compile-cache).  In-program iteration loop per
tools/prof_fused.py (immune to dispatch RTT); readback before and
after every timing loop.  Run when the tunnel is up:

    timeout 1800 python -u tools/ab_quick.py [iters] > /tmp/ab_quick.log
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

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 150
REPEATS = 3
INTERPRET = os.environ.get("TM_CPU", "0") == "1"   # CPU smoke mode
BATCH = int(os.environ.get("TM_AB_BATCH", "32"))
N_FRAMES = int(os.environ.get("TM_AB_FRAMES", "64"))
MAXF = max(64, N_FRAMES)

# (name, dict of pallas_decode module flags) — flags restored per combo
# (the "par" candidate-parallel combo lost 2.2x on chip and was deleted)
COMBOS = [("legacy", {"SYNC_FOLD": False}),
          ("fold", {"SYNC_FOLD": True})]


def build(enc_name, rng):
    cfg = PhyConfig(line_coding=enc_name)
    n_frames, batch = N_FRAMES, BATCH
    frames = [Frame.new_data(i & 0xFF, 1, 2,
              rng.integers(0, 256, 128, dtype=np.uint8).tobytes())
              for i in range(n_frames)]
    wave = PhyEncoder(cfg).encode_frames(frames, gap_samples=200)
    t = len(wave)
    caps = np.stack([wave + rng.normal(0, 0.05, t).astype(np.float32)
                     for _ in range(batch)])
    return cfg, jnp.asarray(caps), t, batch, n_frames


def set_flags(flags):
    for k, v in flags.items():
        setattr(pd, k, v)


def gate(cfg, x, n_frames):
    """Payload-correctness gate under the CURRENT combo flags: a broken
    combo must fail here, not report a (possibly faster) wrong time.
    Returns True on pass; on failure prints diagnostics (ok fraction,
    valid-count range) so a combo-specific on-chip breakage is
    attributable without a separate debug run."""
    res, ok = jax.tree_util.tree_map(
        np.asarray, pd.decode_capture_spec(cfg, x, 2, max_frames=MAXF,
                                           n_cand=128,
                                           interpret=INTERPRET))
    vc = res.valid.sum(axis=1)
    if ok.all() and (vc == n_frames).all():
        return True
    print(f"  GATE FAILED: ok_frac={ok.mean():.2f} "
          f"valid=[{vc.min()}..{vc.max()}] want={n_frames} — not timed",
          flush=True)
    return False


def measure(cfg, x):
    def fn(xi):
        return pd.decode_capture_spec(cfg, xi, 2, max_frames=MAXF,
                                      n_cand=128, interpret=INTERPRET)

    @jax.jit
    def loop(xx):
        def body(c, i):
            r = fn(xx + i.astype(jnp.float32) * 1e-30)
            s = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(r):
                s = s + jnp.sum(leaf.astype(jnp.float32))
            return c + s, None
        out, _ = jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(ITERS, dtype=jnp.int32))
        return out

    r = loop(x)
    np.asarray(r)                       # compile + first transfer
    ts = []
    for _ in range(REPEATS):
        t0 = time.time()
        r = loop(x)
        np.asarray(r)
        ts.append((time.time() - t0) / ITERS * 1000)
    return min(ts), sorted(ts)[len(ts) // 2]


def main():
    print(f"backend={jax.default_backend()} iters={ITERS}", flush=True)
    results = {}
    for enc_name in ("manchester", "4b5b"):
        cfg, x, t, batch, n_frames = build(enc_name, np.random.default_rng(0))
        saved = {k: getattr(pd, k)
                 for combo in COMBOS for k in combo[1]}
        try:
            for name, flags in COMBOS:
                set_flags(flags)
                print(f"{enc_name:12s} {name:10s} gating...", flush=True)
                if not gate(cfg, x, n_frames):  # per-combo correctness
                    continue
                best, med = measure(cfg, x)
                xr = batch * t / cfg.sample_rate / (best / 1000.0)
                results[(enc_name, name)] = (best, xr)
                print(f"{enc_name:12s} {name:10s} {best:7.2f} ms "
                      f"(med {med:.2f})  {xr:9.0f}x", flush=True)
        finally:
            set_flags(saved)
    print("\nSummary:")
    for (enc_name, name), (best, xr) in results.items():
        print(f"  {enc_name:12s} {name:10s} {best:7.2f} ms {xr:9.0f}x")
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
