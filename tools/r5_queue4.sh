#!/bin/bash
# Consolidated round-5 second-half on-chip queue (supersedes queue2/3).
# Priority order: blocked attribution + legacy row first (headline
# target), then the per-row stage profiles, then validation + bench.
# Retries each job until rc=0; logs to /tmp/q4_<name>_<try>.log.
cd /root/repo || exit 1
MAXTRY=${MAXTRY:-4}

probe_up() {
  timeout 50 python -u tools/_probe.py > /tmp/q4_probe.log 2>&1
}

run_job() {
  local name=$1 to=$2; shift 2
  local try=1
  while (( try <= MAXTRY )); do
    if probe_up; then
      echo "== $name try$try start $(date -u +%H:%M:%S) $(grep -o 'rtt_ms=[0-9.]*' /tmp/q4_probe.log)"
      timeout "$to" "$@" > "/tmp/q4_${name}_${try}.log" 2>&1
      local rc=$?
      echo "== $name try$try rc=$rc $(date -u +%H:%M:%S) tail: $(tail -2 /tmp/q4_${name}_${try}.log | tr '\n' ' | ')"
      if [[ $rc -eq 0 ]]; then return 0; fi
      (( try++ ))
      sleep 120
    else
      echo "   tunnel down, waiting ($(date -u +%H:%M:%S))"
      sleep 240
    fi
  done
  echo "== $name GAVE UP after $MAXTRY tries"
}

run_job prof_blocked 1500 python -u tools/prof_blocked.py 100
run_job blocked_leg  1200 python -u tools/ab_blocked.py --iters 100
run_job ab_eq        1800 python -u tools/ab_eq.py 150
run_job prof_coded    900 python -u tools/prof_coded.py 100
run_job prof_ask      900 python -u tools/prof_ask.py 100 16
run_job ab_ask       1500 python -u tools/ab_ask.py 100 16
run_job ab_quick     1500 python -u tools/ab_quick.py 100
run_job soak         1800 env TM_SOAK_BUDGET=380 python -u tools/tpu_spec_soak.py
run_job bench         600 python -u bench.py
echo "== queue4 done $(date -u +%H:%M:%S)"
