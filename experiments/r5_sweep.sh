#!/bin/bash
# Round-5 descriptor-overfitting triage sweep (VERDICT r4 next #1).
#
# Runs knob ablations SEQUENTIALLY on the single TPU at the 1280-view
# reference view count, 30k descriptor steps (the round-4/Q1 curves peak
# by ~20k), held-out-ADD checkpoint selection on the 16-image selection
# pool, and a final 64-image report-set eval — the triage comparison
# metric.  DS_OUT_ROOT is shared so the NeRF field / cors artifacts /
# negatives are built once and every ablation trains against the same
# field.
#
# Launch detached:  setsid nohup bash experiments/r5_sweep.sh &
# Logs: /tmp/r5_sweep/<name>.log ; PID: /tmp/r5_sweep/sweep.pid
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5_sweep
echo $$ > /tmp/r5_sweep/sweep.pid

export DS_VIEWS=1280
export DS_POSE_STEPS=${SWEEP_STEPS:-30000}
export DS_EVAL_EVERY=10000
export DS_INFER=64
export DS_SELECT=16
export DS_OUT_ROOT=/tmp/r5_dsroot

run() {
  local name="$1"; shift
  local log="/tmp/r5_sweep/${name}.log"
  if [ -f "$log" ] && grep -q '"pose_correct"' "$log"; then
    echo "skip $name (done)"; return
  fi
  echo "=== $name: $* ($(date -u +%H:%M:%S)) ==="
  env "$@" DS_TAG="$name" python experiments/descriptor_scale.py > "$log" 2>&1
  echo "--- $name done ($(date -u +%H:%M:%S)):"
  grep -E 'select-eval|best checkpoint|pose_correct' "$log" | tail -8
}

# control: reference-parity knobs under the selection protocol
run t_ctrl DS_DUMMY=1
# augmentation strength/diversity scaled up (primary anti-memorization lever)
run t_aug DS_AUG_BOOST=2 DS_P_DISTRACTOR=0.5
# + positive-key positional jitter (smooths the descriptor field on-surface;
#   Q1 already measured pos_noise alone: select 5/16 -> 9/16 -> 7/16)
run t_combo DS_AUG_BOOST=2 DS_P_DISTRACTOR=0.5 DS_POS_NOISE=0.01
# feature-head weight decay (low-frequency descriptor field)
run t_wd DS_WD=1e-3
# stronger key noise (round-4's one tested lever, x5)
run t_kn DS_KEY_NOISE=5e-3

echo "SWEEP COMPLETE $(date -u)"
