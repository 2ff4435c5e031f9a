#!/bin/bash
# Round-5 dress-rehearsal RESUME after the host reboot at ~23:31-01:46 UTC
# (Aug 19-20) wiped ALL untracked state: the 28,008-PNG sample set, latents,
# and the 200-step checkpoint. Only the git-tracked tree (incl. runs/ logs
# of legs 1-3 and the 17,316-image eval) survived. This wrapper regenerates
# the synthetic ImageFolder, then execs the existing self-healing chain
# (runs/chain_r05_launch.sh: extract_features -> train_dit 200 ->
# dress_watchdog sampling loop). `exec` keeps one PID through the whole
# chain so /tmp/watchdog3.pid stays valid for runs/dress_eval2.sh.
cd /root/repo
export PYTHONUNBUFFERED=1
log=runs/tpu_prep3_r05.log
echo "=== resume-after-reboot start $(date) ===" >> $log
echo "note: host reboot wiped output/ (28,008 pngs) + .jax_cache; regenerating from scratch" >> $log
if ! ls output/dress_r05/imgs/*/*.png >/dev/null 2>&1; then
  echo "=== gen synth imgs $(date) ===" >> $log
  timeout 900 python runs/gen_synth_imgs.py output/dress_r05/imgs 2000 >> $log 2>&1
fi
echo "=== handing off to chain_r05_launch $(date) ===" >> $log
exec bash runs/chain_r05_launch.sh
