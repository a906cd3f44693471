#!/bin/bash
# Opportunistic on-chip job queue for a flapping tunnel: before each
# job, probe; if the tunnel is down, wait and retry the SAME job.
# Logs to /tmp/q_<name>.log.  Usage: bash tools/r5_queue.sh
cd /root/repo || exit 1

probe_up() {
  timeout 50 python -u tools/_probe.py > /tmp/q_probe.log 2>&1
}

run_job() {  # run_job <name> <timeout> <cmd...>
  local name=$1 to=$2; shift 2
  while true; do
    if probe_up; then
      echo "== $name start $(date -u +%H:%M:%S) rtt=$(grep -o 'rtt_ms=[0-9.]*' /tmp/q_probe.log)"
      timeout "$to" "$@" > "/tmp/q_${name}.log" 2>&1
      local rc=$?
      echo "== $name rc=$rc $(date -u +%H:%M:%S) tail: $(tail -2 /tmp/q_${name}.log | tr '\n' ' | ')"
      if [[ $rc -eq 0 ]]; then return 0; fi
      # rc!=0: one retry after a wait (tunnel may have died mid-job)
      sleep 180
      if probe_up; then
        timeout "$to" "$@" > "/tmp/q_${name}_retry.log" 2>&1
        echo "== $name retry rc=$? $(date -u +%H:%M:%S)"
      fi
      return 0
    fi
    echo "   tunnel down, waiting ($(date -u +%H:%M:%S))"
    sleep 240
  done
}

run_job ab_ask   1500 python -u tools/ab_ask.py 100 16
run_job prof_par 1200 python -u tools/prof_par.py 100
run_job ab_eq    1800 python -u tools/ab_eq.py 150
run_job bench2    600 python -u bench.py
echo "== queue done $(date -u +%H:%M:%S)"
