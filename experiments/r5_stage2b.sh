#!/bin/bash
# Round-5 stage 2 RELAUNCH: the triage sweep (r5_sweep.sh) completed in an
# earlier session — control 32/64 vs aug-boosted 64/64 median 0.0372 at
# 1280v/30k on the 64-image protocol — but a machine reboot wiped /tmp
# before stage 2 ran, so the winner knobs are pinned here explicitly
# (DS_AUG_BOOST=2 DS_P_DISTRACTOR=0.5) instead of re-parsed from logs.
#
#   A. winner knobs @ 1280v/60k analytic  (QUALITY_r05 headline)
#   B. winner knobs @ 1280v/60k mesh_tex  (texture hypothesis, VERDICT #2)
#   C. winner knobs @  256v/60k analytic  (view curve, VERDICT #3)
#
# Launch detached:  setsid nohup bash experiments/r5_stage2b.sh &
# Logs: /tmp/r5_sweep/stage2_*.log
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5_sweep
echo $$ > /tmp/r5_sweep/stage2.pid

WIN="DS_AUG_BOOST=2 DS_P_DISTRACTOR=0.5"
COMMON="DS_VIEWS=1280 DS_POSE_STEPS=60000 DS_EVAL_EVERY=10000 DS_INFER=64 DS_SELECT=16"

run() {
  local name="$1"; shift
  local log="/tmp/r5_sweep/stage2_${name}.log"
  if [ -f "$log" ] && grep -q '"pose_correct"' "$log"; then
    echo "skip $name (done)"; return
  fi
  echo "=== stage2 $name: $* ($(date -u +%H:%M:%S)) ==="
  env "$@" python experiments/descriptor_scale.py > "$log" 2>&1
  grep -E 'select-eval|best checkpoint|pose_correct' "$log" | tail -9
}

run q1280_winner $COMMON $WIN DS_OUT_ROOT=/tmp/r5_dsroot DS_TAG=r5win

run q1280_meshtex $COMMON $WIN DS_SCENE=mesh_tex \
    DS_OUT_ROOT=/tmp/r5_dsroot_meshtex DS_TAG=r5tex

run q256_winner DS_VIEWS=256 DS_POSE_STEPS=60000 DS_EVAL_EVERY=10000 \
    DS_INFER=64 DS_SELECT=16 $WIN \
    DS_OUT_ROOT=/tmp/r5_dsroot256 DS_TAG=r5win

echo "STAGE2 COMPLETE $(date -u)"
