"""Differential check: sync-refine fold vs legacy in-attempt refine.

Decodes random multi-frame captures (both codings, noise, truncation,
capture-end frames) through decode_capture_spec with
pallas_decode.SYNC_FOLD flipped both ways and asserts identical
frames, ok flags, and cursors.  Default: CPU interpret mode.  On a
live tunnel, ``TM_INTERPRET=0 python -u tools/check_sync_fold.py``
compiles and runs the real kernels on the TPU (the post-change compile
smoke).
"""
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax

INTERPRET = os.environ.get("TM_INTERPRET", "1") == "1"
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from trackmaker_tpu.core.config import PhyConfig, MANCHESTER, FOUR_B_FIVE_B  # noqa: E402
from trackmaker_tpu.core.framing import Frame  # noqa: E402
from trackmaker_tpu.oracle.phy import OracleEncoder  # noqa: E402
from trackmaker_tpu.phy import pallas_decode as pd  # noqa: E402


def build_capture(cfg, rng, n_frames, t, evil=False):
    """Random frames at random gaps, AWGN, into a t-sample capture."""
    enc = OracleEncoder(cfg)
    x = np.zeros(t, np.float32)
    pos = int(rng.integers(0, 2000))
    for k in range(n_frames):
        n = int(rng.integers(1, 64))
        payload = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        if evil:
            pre = bytes([0x33] * 12 if cfg.line_coding == MANCHESTER
                        else [0x5A] * 12)
            payload = (pre + payload)[:n] or b"\x00"
        wav = np.asarray(enc.encode_frame(
            Frame.new_data(sequence=k, src=1, dst=2, data=payload)),
            np.float32)
        if pos + len(wav) > t:
            x[pos:t] += wav[: t - pos]    # truncated final frame
            break
        x[pos: pos + len(wav)] += wav
        pos += len(wav) + int(rng.integers(0, 900))
    x += rng.normal(0, 0.05, t).astype(np.float32)
    return jnp.asarray(x)


def run(cfg, x, fold):
    pd.SYNC_FOLD = fold
    res, ok, srch, cur = pd.decode_capture_spec(
        cfg, x, 2, max_frames=16, n_cand=64, interpret=INTERPRET,
        with_cursor=True)
    return jax.tree_util.tree_map(np.asarray, (res, ok, srch, cur))


def main():
    rng = np.random.default_rng(int(os.environ.get("TM_SEED", "7")))
    n_bad = 0
    for coding, name in ((MANCHESTER, "manchester"),
                         (FOUR_B_FIVE_B, "4b5b")):
        cfg = PhyConfig(line_coding=coding)
        for trial in range(int(os.environ.get("TM_TRIALS", "6"))):
            b = 2
            t = 40_000 if trial % 2 == 0 else 70_000
            x = jnp.stack([
                build_capture(cfg, rng, 4, t, evil=(trial % 3 == 2))
                for _ in range(b)])
            a = run(cfg, x, True)
            o = run(cfg, x, False)
            leaves_a = jax.tree_util.tree_leaves(a)
            leaves_o = jax.tree_util.tree_leaves(o)
            same = all(np.array_equal(la, lo)
                       for la, lo in zip(leaves_a, leaves_o))
            nkeep = int(a[0].valid.sum())
            print(f"{name} trial {trial}: frames={nkeep} "
                  f"match={same}", flush=True)
            if not same:
                n_bad += 1
                for (la, lo), nm in zip(
                        zip(leaves_a, leaves_o),
                        [str(i) for i in range(len(leaves_a))]):
                    if not np.array_equal(la, lo):
                        print(f"  leaf {nm} differs:\n  fold={la}\n"
                              f"  legacy={lo}")
    print("RESULT:", "FAIL" if n_bad else "PASS", flush=True)
    sys.stdout.flush()
    os._exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
