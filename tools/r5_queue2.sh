#!/bin/bash
# Round-5 second-half on-chip queue: regression attribution + stage
# profiles for the remaining verdict targets.  Retries each job until
# it exits 0 (tunnel flaps); logs to /tmp/q2_<name>_<try>.log.
# Usage: bash tools/r5_queue2.sh
cd /root/repo || exit 1
MAXTRY=${MAXTRY:-4}

probe_up() {
  timeout 50 python -u tools/_probe.py > /tmp/q2_probe.log 2>&1
}

run_job() {  # run_job <name> <timeout> <cmd...>
  local name=$1 to=$2; shift 2
  local try=1
  while (( try <= MAXTRY )); do
    if probe_up; then
      echo "== $name try$try start $(date -u +%H:%M:%S) $(grep -o 'rtt_ms=[0-9.]*' /tmp/q2_probe.log)"
      timeout "$to" "$@" > "/tmp/q2_${name}_${try}.log" 2>&1
      local rc=$?
      echo "== $name try$try rc=$rc $(date -u +%H:%M:%S) tail: $(tail -2 /tmp/q2_${name}_${try}.log | tr '\n' ' | ')"
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

# 1. blocked_600s regression attribution: HEAD vs r4-verdict tree in
#    ONE window (worktree prepared at /tmp/r4tree = f403219)
blocked_ab() {
  python -u tools/ab_blocked.py --iters 100 && \
  python -u tools/ab_blocked.py --iters 100 --tree /tmp/r4tree
}
run_job blocked_ab 1800 bash -c 'python -u tools/ab_blocked.py --iters 100 && python -u tools/ab_blocked.py --iters 100 --tree /tmp/r4tree'

# 2. equalizer fine stage split (estimate/taps/apply now timed alone)
run_job ab_eq     1800 python -u tools/ab_eq.py 150

# 3. coded-row stage split (sync/demod/viterbi)
run_job prof_coded 900 python -u tools/prof_coded.py 100

# 4. ASK stage split on the surviving pairscan formulation
run_job prof_ask   900 python -u tools/prof_ask.py 100 16

# 5. flagship sanity (payload gates at HIGHEST, post-deletions)
run_job ab_quick  1500 python -u tools/ab_quick.py 100

# 6. driver-style bench artifact
run_job bench      600 python -u bench.py
echo "== queue2 done $(date -u +%H:%M:%S)"
