#!/bin/bash
# Stall-killer for the round-5 dress rehearsal. The watchdog
# (runs/dress_watchdog.sh) only relaunches cli.inference when the process
# EXITS; a relay outage can instead wedge the client alive inside a stuck
# RPC (observed 23:55-00:27, cost ~32 min of the 50k budget until a manual
# kill). This loop watches the PNG count and kills the EXACT recorded PID
# (/tmp/dress_inference.pid — never pattern-matched) when the process is
# alive but has written nothing for STALL_S seconds. The watchdog then
# relaunches with batch-level resume. A fresh PID gets GRACE_S of warmup
# (checkpoint load + compile measured ~6 min on relaunch).
cd /root/repo
log=runs/dress_stallkill_r05.log
STALL_S=600
GRACE_S=1080
echo "=== stall-killer start $(date) ===" >> $log
last_pid=""
last_n=-1
last_progress=$(date +%s)
pid_since=$(date +%s)
while true; do
  deadline=$(cat runs/dress_deadline 2>/dev/null || echo 0)
  now=$(date +%s)
  [ "$now" -ge $((deadline + 120)) ] && break
  pid=$(cat /tmp/dress_inference.pid 2>/dev/null)
  if [ "$pid" != "$last_pid" ]; then
    last_pid="$pid"; pid_since=$now; last_progress=$now
    echo "$(date -u +%H:%M:%S) tracking pid=$pid" >> $log
  fi
  sdir=$(ls -d output/dress_r05/train/*/ 2>/dev/null | grep -v checkpoints | head -1)
  if [ -n "$sdir" ]; then
    n=$(ls "$sdir" 2>/dev/null | grep -c '\.png$')
    if [ "$n" != "$last_n" ]; then last_n=$n; last_progress=$now; fi
  fi
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
    idle=$((now - last_progress))
    age=$((now - pid_since))
    if [ "$idle" -ge "$STALL_S" ] && [ "$age" -ge "$GRACE_S" ]; then
      # $pid is the `timeout` wrapper (watchdog records $! of `timeout ... python`).
      # TERM the wrapper (GNU timeout forwards TERM to the python child); a client
      # wedged inside a C-extension RPC may not honor TERM, so after 30 s escalate
      # to KILL on the child (found by EXACT parent pid, never pattern) + wrapper.
      child=$(pgrep -P "$pid" 2>/dev/null | head -1)
      echo "$(date -u +%H:%M:%S) STALL: pid=$pid child=$child idle=${idle}s age=${age}s pngs=$last_n -> TERM" >> $log
      kill "$pid" 2>/dev/null
      sleep 30
      if [ -n "$child" ] && kill -0 "$child" 2>/dev/null; then
        echo "$(date -u +%H:%M:%S) child $child survived TERM -> KILL" >> $log
        kill -9 "$child" 2>/dev/null
        kill -9 "$pid" 2>/dev/null
      fi
      last_progress=$now
    fi
  fi
  sleep 60
done
echo "=== stall-killer done $(date) ===" >> $log
