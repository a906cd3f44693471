"""Round-4b on-chip A/B: sync-refine fold + PARALLEL grid semantics.  Runs tools/prof_fused.py under each flag combination
and prints a compact table.  Run when the tunnel is up:

    python -u tools/ab_r4b.py [iters]
"""
import os
import pathlib
import re
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
ITERS = sys.argv[1] if len(sys.argv) > 1 else "100"

COMBOS = [
    ("legacy", {"TM_SYNC_FOLD": "0", "TM_XC_PAR": "0"}),
    ("legacy+xcpar", {"TM_SYNC_FOLD": "0", "TM_XC_PAR": "1"}),
    ("fold", {"TM_SYNC_FOLD": "1", "TM_XC_PAR": "0"}),
    ("fold+xcpar", {"TM_SYNC_FOLD": "1", "TM_XC_PAR": "1"}),
]

ROWS = ("xcorr+extract", "xcorr+refine", "phase_a", "full spec decode",
        "xcorr+extract+attempt", "phase_a+walk", "phase_a+walk+compact")


def run(enc, name, env_over):
    env = dict(os.environ)
    env.update(env_over)
    p = subprocess.run(
        [sys.executable, "-u", str(ROOT / "tools/prof_fused.py"),
         enc, ITERS],
        env=env, cwd=ROOT, capture_output=True, text=True, timeout=900)
    vals = {}
    for line in p.stdout.splitlines():
        m = re.match(r"\s*(\S[\S ]*?)\s+([0-9.]+) ms", line)
        if m:
            vals[m.group(1).strip()] = float(m.group(2))
    print(f"--- {enc} {name}: " + "  ".join(
        f"{k}={vals.get(k, float('nan')):.2f}" for k in ROWS
        if k in vals), flush=True)
    if p.returncode != 0:
        print(p.stdout[-1500:])
        print(p.stderr[-2000:])
    return vals


def main():
    results = {}
    for enc in ("manchester", "fourb5b"):
        for name, env_over in COMBOS:
            if enc == "fourb5b" and "xcpar" in name and "fold" in name:
                pass  # xcpar orthogonal; keep full matrix anyway
            results[(enc, name)] = run(enc, name, env_over)
    print("\nSummary (full spec decode ms):")
    for (enc, name), vals in results.items():
        print(f"  {enc:12s} {name:18s} "
              f"{vals.get('full spec decode', float('nan')):.2f}")


if __name__ == "__main__":
    main()
