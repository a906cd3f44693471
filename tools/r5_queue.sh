#!/bin/bash
# Opportunistic on-chip job queue for a flapping tunnel: before each
# job, probe; if the tunnel is down, wait and retry the SAME job.
# A job is retried (up to MAXTRY) until it exits 0.
# Logs to /tmp/q_<name>_<try>.log.  Usage: bash tools/r5_queue.sh
cd /root/repo || exit 1
MAXTRY=${MAXTRY:-3}

probe_up() {
  timeout 50 python -u tools/_probe.py > /tmp/q_probe.log 2>&1
}

run_job() {  # run_job <name> <timeout> <cmd...>
  local name=$1 to=$2; shift 2
  local try=1
  while (( try <= MAXTRY )); do
    if probe_up; then
      echo "== $name try$try start $(date -u +%H:%M:%S) $(grep -o 'rtt_ms=[0-9.]*' /tmp/q_probe.log)"
      timeout "$to" "$@" > "/tmp/q_${name}_${try}.log" 2>&1
      local rc=$?
      echo "== $name try$try rc=$rc $(date -u +%H:%M:%S) tail: $(tail -2 /tmp/q_${name}_${try}.log | tr '\n' ' | ')"
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

run_job ab_ask    1500 python -u tools/ab_ask.py 100 16
run_job prof_walk  900 python -u tools/prof_walk.py 100
run_job ab_vit2    900 python -u tools/ab_viterbi.py 200
run_job prof_coded 900 python -u tools/prof_coded.py 100
run_job ab_eq     1800 python -u tools/ab_eq.py 150
run_job prof_fused 900 python -u tools/prof_fused.py manchester 100
run_job bench2     600 python -u bench.py
echo "== queue done $(date -u +%H:%M:%S)"
