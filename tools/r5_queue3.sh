#!/bin/bash
# Follow-up queue: measurements of the r5 second-half code changes
# (legacy delta stash on blocked, ASK chain_window=512).  Waits for
# r5_queue2.sh to finish first so the chip isn't contended.
cd /root/repo || exit 1
MAXTRY=${MAXTRY:-4}

if [[ -f /tmp/queue2.pid ]]; then
  while kill -0 "$(cat /tmp/queue2.pid)" 2>/dev/null; do sleep 60; done
fi

probe_up() {
  timeout 50 python -u tools/_probe.py > /tmp/q3_probe.log 2>&1
}

run_job() {
  local name=$1 to=$2; shift 2
  local try=1
  while (( try <= MAXTRY )); do
    if probe_up; then
      echo "== $name try$try start $(date -u +%H:%M:%S) $(grep -o 'rtt_ms=[0-9.]*' /tmp/q3_probe.log)"
      timeout "$to" "$@" > "/tmp/q3_${name}_${try}.log" 2>&1
      local rc=$?
      echo "== $name try$try rc=$rc $(date -u +%H:%M:%S) tail: $(tail -2 /tmp/q3_${name}_${try}.log | tr '\n' ' | ')"
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

run_job blocked_legacy 1500 python -u tools/ab_blocked.py --iters 100
run_job ab_ask512 1500 python -u tools/ab_ask.py 100 16
run_job soak 1800 env TM_SOAK_BUDGET=380 python -u tools/tpu_spec_soak.py
run_job bench 600 python -u bench.py
echo "== queue3 done $(date -u +%H:%M:%S)"
