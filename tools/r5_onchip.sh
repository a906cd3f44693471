#!/bin/bash
# Round-5 on-chip validation sequence — run when the tunnel is UP.
# Each step is bounded and logs to /tmp/r5_*.log; the script keeps
# going on failure so one flaky step doesn't waste a healthy window.
# Usage: bash tools/r5_onchip.sh [quick]
#   quick: halve soak budget + iters for a degraded window.
cd /root/repo || exit 1
Q=${1:-}
IT=150; SOAK=380; VIT=200
if [[ "$Q" == quick ]]; then IT=60; SOAK=150; VIT=80; fi

step() {  # step <name> <timeout> <cmd...>
  local name=$1 to=$2; shift 2
  echo "== $name ($(date -u +%H:%M:%S)) =="
  timeout "$to" "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "   rc=$? tail: $(tail -2 /tmp/r5_${name}.log | tr '\n' ' | ')"
}

step probe     50 python -u tools/_probe.py
step ab_quick 1500 python -u tools/ab_quick.py "$IT"
step soak     1800 env TM_SOAK_BUDGET=$SOAK python -u tools/tpu_spec_soak.py
step ab_vit    900 python -u tools/ab_viterbi.py "$VIT"
step ab_eq    1800 python -u tools/ab_eq.py "$IT"
step prof_ask  900 python -u tools/prof_ask.py 100 16
step probe2     50 python -u tools/_probe.py
step bench     600 python -u bench.py
echo "== done ($(date -u +%H:%M:%S)) =="
