"""One-process equalized-decode A/B on the equalized_b32 bench shape:
legacy dense-corr anchor peel vs the fused row-stats anchor
(sync.pallas_xcorr_rowstats, r5 item 5), with flagship (no equalizer)
as the ratio reference.  Also times the stages separately (anchor /
estimate+taps+apply / decode) so the remaining overhead is
attributable.  In-program iteration loop per tools/prof_fused.py;
readback before and after every timing loop.  Run when the tunnel is
up:

    timeout 1800 python -u tools/ab_eq.py [iters] > /tmp/ab_eq.log
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
from trackmaker_tpu.dsp import channel as chan
from trackmaker_tpu.dsp import equalizer as eqz
from trackmaker_tpu.phy.encoder import PhyEncoder
from trackmaker_tpu.phy import pallas_decode as pd
from trackmaker_tpu import sync as sync_mod
from trackmaker_tpu.phy import line_coding

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
REPEATS = 3
INTERPRET = os.environ.get("TM_CPU", "0") == "1"
BATCH = int(os.environ.get("TM_AB_BATCH", "32"))
N_FRAMES = int(os.environ.get("TM_AB_FRAMES", "64"))
MAXF = max(64, N_FRAMES)


def build(rng):
    cfg = PhyConfig(line_coding="manchester")
    frames = [Frame.new_data(i & 0xFF, 1, 2,
              rng.integers(0, 256, 128, dtype=np.uint8).tobytes())
              for i in range(N_FRAMES)]
    wave = PhyEncoder(cfg).encode_frames(frames, gap_samples=200)
    t = len(wave)
    caps = []
    for _ in range(BATCH):
        # 2-path echo channel (the row the equalizer exists for)
        taps = np.zeros(8, np.float32)
        taps[0], taps[7] = 1.0, 0.45
        y = np.asarray(chan.multipath(jnp.asarray(wave),
                                      jnp.asarray(taps)))
        caps.append(y + rng.normal(0, 0.05, t).astype(np.float32))
    return cfg, jnp.asarray(np.stack(caps)), t


def timed(label, loop_fn, x, per_iter_scale=1.0):
    r = loop_fn(x)
    np.asarray(r)
    ts = []
    for _ in range(REPEATS):
        t0 = time.time()
        r = loop_fn(x)
        np.asarray(r)
        ts.append((time.time() - t0) / ITERS * 1000 * per_iter_scale)
    best = min(ts)
    print(f"  {label:28s} {best:8.3f} ms", flush=True)
    return best


def inloop(fn, iters=None):
    n = ITERS if iters is None else iters

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


def main():
    print(f"backend={jax.default_backend()} iters={ITERS} "
          f"batch={BATCH}", flush=True)
    rng = np.random.default_rng(0)
    cfg, x, t = build(rng)
    pre = np.asarray(line_coding.preamble_waveform(cfg))
    l_pre = len(pre)

    # correctness gate: equalized decode recovers every frame
    res = jax.vmap(lambda r: eqz.equalize_capture(cfg, r)[0])(x)
    dec, ok = jax.tree_util.tree_map(
        np.asarray, pd.decode_capture_spec(cfg, res, 2, max_frames=MAXF,
                                           n_cand=128,
                                           interpret=INTERPRET))
    n_ok = (dec.valid.sum(axis=1) == N_FRAMES).sum()
    print(f"gate: ok={ok.all()} captures with all {N_FRAMES} frames: "
          f"{n_ok}/{BATCH}", flush=True)
    assert n_ok == BATCH

    # --- stage timings ------------------------------------------------
    def anchor_legacy(row):
        corr = sync_mod.auto_xcorr(row, pre)
        pos = jnp.arange(corr.shape[-1], dtype=jnp.int32)
        c = corr
        outs = []
        for _ in range(4):
            a = jnp.argmax(c).astype(jnp.int32)
            outs.append(a)
            c = jnp.where(jnp.abs(pos - a) < l_pre, -jnp.inf, c)
        return jnp.stack(outs)

    def anchor_rowstats(row):
        rowmax, rowpos = sync_mod.auto_xcorr_row_stats(row, pre)
        rm = rowmax
        outs = []
        for _ in range(4):
            j = jnp.argmax(rm)
            outs.append(rowpos[j])
            rm = jnp.where(jnp.abs(rowpos - rowpos[j]) < l_pre,
                           -jnp.inf, rm)
        return jnp.stack(outs)

    def anchor_dec(row):
        # stride-2 anchor search (TM_EQ_ANCHOR_DEC candidate, r5)
        rowmax, rowpos = sync_mod.auto_xcorr_row_stats(row[::2],
                                                       pre[::2])
        rowpos = rowpos * 2
        rm = rowmax
        outs = []
        for _ in range(4):
            j = jnp.argmax(rm)
            outs.append(rowpos[j])
            rm = jnp.where(jnp.abs(rowpos - rowpos[j]) < l_pre,
                           -jnp.inf, rm)
        return jnp.stack(outs)

    timed("anchor legacy (dense+peel)",
          inloop(lambda xx: jax.vmap(anchor_legacy)(xx)), x)
    timed("anchor rowstats (fused)",
          inloop(lambda xx: jax.vmap(anchor_rowstats)(xx)), x)
    timed("anchor rowstats stride-2",
          inloop(lambda xx: jax.vmap(anchor_dec)(xx)), x)
    # decimated-anchor equalized decode gate: anchors within 2 samples
    # + the K0 margin mean the trained taps still equalize; verify all
    # frames decode before the flag can default on
    os.environ["TM_EQ_ANCHOR_DEC"] = "1"   # read at trace time — keep
    #                                        set through the timed row
    #                                        (inloop retraces under its
    #                                        own jit)
    eqd = jax.jit(jax.vmap(
        lambda r: eqz.equalize_capture.__wrapped__(cfg, r)[0]))
    resd = eqd(x)
    decd, okd = jax.tree_util.tree_map(
        np.asarray, pd.decode_capture_spec(cfg, resd, 2, max_frames=MAXF,
                                           n_cand=128,
                                           interpret=INTERPRET))
    nd = (decd.valid.sum(axis=1) == N_FRAMES).sum()
    print(f"  stride-2 anchor gate: ok={okd.all()} full-decode "
          f"{nd}/{BATCH}", flush=True)
    timed("equalize_capture (stride-2 anchors)", inloop(eqd), x)
    os.environ["TM_EQ_ANCHOR_DEC"] = "0"

    # --- fine split with FIXED anchors/taps (host boundary) so each
    # stage times alone: where do the non-anchor ~2 ms go? -----------
    anc_f = jnp.asarray(np.asarray(jax.vmap(anchor_rowstats)(x)))

    def est4(xx):
        return jax.vmap(lambda r, a4: jax.vmap(
            lambda a: eqz.estimate_channel(cfg, r, a))(a4))(xx, anc_f)

    timed("estimate x4 (fixed anchors)", inloop(est4), x)
    hs, lams = est4(x)
    h1 = jnp.asarray(np.asarray(hs[:, 0]))
    lam1 = jnp.asarray(np.asarray(lams[:, 0]))

    def taps_fn(hh):
        return jax.vmap(eqz._mmse_taps)(hh, lam1)

    timed("mmse taps (fft x32)", inloop(taps_fn), h1)
    g = jnp.asarray(np.asarray(jax.vmap(eqz._mmse_taps)(h1, lam1)))

    def apply_fn(xx):
        return jax.vmap(eqz._apply_fir)(xx, g)

    timed("apply_fir", inloop(apply_fn), x)
    timed("equalize_capture (full)",
          inloop(lambda xx: jax.vmap(
              lambda r: eqz.equalize_capture(cfg, r)[0])(xx)), x)

    def dec_fn(xx):
        return pd.decode_capture_spec(cfg, xx, 2, max_frames=MAXF,
                                      n_cand=128, interpret=INTERPRET)

    flag = timed("flagship decode (no eq)", inloop(dec_fn), x)

    def eq_dec(xx):
        e = jax.vmap(lambda r: eqz.equalize_capture(cfg, r)[0])(xx)
        return dec_fn(e)

    full = timed("equalized decode (fused)", inloop(eq_dec), x)
    xr = BATCH * t / cfg.sample_rate / (full / 1000.0)
    print(f"\nratio eq/flagship = {flag / full:.3f} "
          f"(target >= 0.8);  equalized {xr:,.0f}x realtime", flush=True)
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
