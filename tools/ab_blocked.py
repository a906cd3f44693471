"""Same-window A/B of the blocked_600s row across two source trees.

The r5 driver run read blocked_600s at 76.5k x where the r4 driver run
read 102.5k x — but they ran in DIFFERENT tunnel windows, so nobody can
tell code regression from chip state (the exact dispute VERDICT r4
"what's weak" 1 is about).  This tool times the blocked spec decode in
whatever tree `--tree` points at, so two back-to-back processes (HEAD,
then a git worktree of the r4 commit) measure both trees in ONE window:

    git worktree add /tmp/r4tree f403219
    python tools/ab_blocked.py --iters 100
    python tools/ab_blocked.py --iters 100 --tree /tmp/r4tree

Payload-gated; iteration loop inside the program; sums every output
leaf into the carry (DCE honesty).
"""

import argparse
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree", default="/root/repo")
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--seconds", type=int, default=600)
    args = ap.parse_args()
    sys.path.insert(0, args.tree)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    if os.environ.get("TM_CPU", "0") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from trackmaker_tpu.core.config import PhyConfig
    from trackmaker_tpu.core.framing import Frame
    from trackmaker_tpu.oracle.phy import OracleEncoder
    from trackmaker_tpu.parallel.stream import (
        _decode_blocked_spec_jit, decode_blocked_single_chip)

    cfg = PhyConfig()
    rng = np.random.default_rng(0)
    t = args.seconds * 48_000
    n_blocks = max(2, (64 * args.seconds) // 600)
    n_frames = max(2, (48 * args.seconds) // 600)
    enc = OracleEncoder(cfg)
    wave = np.zeros(t, np.float32)
    step = t // (n_frames + 1)
    for i in range(n_frames):
        w = enc.encode_frame(Frame.new_data(i, 1, 2, bytes([i]) * 64))
        wave[(i + 1) * step:(i + 1) * step + len(w)] = w
    wave += rng.normal(0, 0.05, t).astype(np.float32)
    x = jnp.asarray(wave)

    print(f"tree={args.tree} t={t} blocks={n_blocks} "
          f"backend={jax.default_backend()}")
    res = decode_blocked_single_chip(cfg, x, 2, n_blocks=n_blocks,
                                     max_frames_per_block=8)
    valid = np.asarray(res.valid)
    got = sorted(np.asarray(res.sequence)[valid].tolist())
    assert got == list(range(n_frames)), f"gate: {len(got)}/{n_frames}"
    print("gate ok")

    interp = jax.default_backend() != "tpu"
    fn = (lambda v: _decode_blocked_spec_jit(cfg, v, 2, n_blocks, 8,
                                             t, 128, interp))

    @jax.jit
    def loop(v):
        def body(c, i):
            r = fn(v + i.astype(jnp.float32) * 1e-30)
            acc = c
            for leaf in jax.tree_util.tree_leaves(r):
                acc = acc + jnp.sum(leaf.astype(jnp.float32))
            return acc, None
        out, _ = jax.lax.scan(
            body, jnp.float32(0.0),
            jnp.arange(args.iters, dtype=jnp.int32))
        return out

    r = loop(x)
    np.asarray(r)
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(loop(x))
        ts.append((time.time() - t0) / args.iters)
    ts.sort()
    med = ts[1]
    print(f"blocked {args.seconds}s: {med * 1e3:.2f} ms/iter  "
          f"{t / med / 48_000:.0f}x   (runs: "
          + " ".join(f"{u * 1e3:.2f}" for u in ts) + ")")
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
