#!/bin/bash
# Samples PNG count / disk usage of the dress-rehearsal output every 5 min.
cd /root/repo
log=runs/dress_monitor_r05.log
while true; do
  deadline=$(cat runs/dress_deadline 2>/dev/null || echo 0)
  [ "$(date +%s)" -ge $((deadline + 3600)) ] && break
  sdir=$(ls -d output/dress_r05/train/*/ 2>/dev/null | grep -v checkpoints | head -1)
  if [ -n "$sdir" ]; then
    n=$(ls "$sdir" 2>/dev/null | grep -c '\.png$')
    kb=$(du -sk "$sdir" 2>/dev/null | cut -f1)
    echo "$(date +%s) $(date -u +%H:%M:%S) pngs=$n kb=$kb" >> $log
  fi
  sleep 300
done
