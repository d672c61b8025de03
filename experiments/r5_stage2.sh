#!/bin/bash
# Round-5 stage 2: after the triage sweep (r5_sweep.sh), pick the winning
# knob set by the 64-image report metric and run the full reference
# schedule with it, then the texture-hypothesis and view-curve points:
#   A. winner knobs @ 1280v/60k  (QUALITY_r05 headline candidate)
#   B. mesh_tex scene @ 1280v/60k winner knobs (texture anchoring,
#      VERDICT r4 next #2)
#   C. analytic 256v/60k, same 64-image protocol (view curve, #3)
# Waits for the sweep pid to exit first.  Logs: /tmp/r5_sweep/stage2_*.log
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5_sweep
echo $$ > /tmp/r5_sweep/stage2.pid

SWEEP_PID=$(cat /tmp/r5_sweep/sweep.pid 2>/dev/null || echo 0)
while [ "$SWEEP_PID" != "0" ] && kill -0 "$SWEEP_PID" 2>/dev/null; do
  sleep 60
done

# winner = argmax (correct, -median) over the triage logs' final json
WINNER_ENV=$(python - <<'EOF'
import glob, json, os
best = None
for log in glob.glob("/tmp/r5_sweep/t_*.log"):
    try:
        lines = [l for l in open(log) if '"pose_correct"' in l]
        d = json.loads(lines[-1])
        c = int(d["pose_correct"].split("/")[0])
        k = d["knobs"]
        env = (f"DS_KEY_NOISE={k['key_noise']} DS_POS_NOISE={k['pos_noise']} "
               f"DS_TEMP={k['infonce_temp']} DS_WD={k['head_weight_decay']} "
               f"DS_AUG_BOOST={k['aug_boost']} DS_P_DISTRACTOR={k['p_distractor']}")
        score = (c, -d["median_add"])
        if best is None or score > best[0]:
            best = (score, env, os.path.basename(log))
    except Exception:
        pass
print(best[1] if best else "")
EOF
)
echo "winner: $WINNER_ENV"

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

COMMON="DS_VIEWS=1280 DS_POSE_STEPS=60000 DS_EVAL_EVERY=10000 DS_INFER=64 DS_SELECT=16"

# A. headline: winner knobs at the reference schedule
run q1280_winner $COMMON $WINNER_ENV DS_OUT_ROOT=/tmp/r5_dsroot DS_TAG=r5win

# B. texture hypothesis: same regime on the textured mesh scene
run q1280_meshtex $COMMON $WINNER_ENV DS_SCENE=mesh_tex \
    DS_OUT_ROOT=/tmp/r5_dsroot_meshtex DS_TAG=r5tex

# C. view curve: 256v at the SAME 64-image protocol (winner knobs)
run q256_winner DS_VIEWS=256 DS_POSE_STEPS=60000 DS_EVAL_EVERY=10000 \
    DS_INFER=64 DS_SELECT=16 $WINNER_ENV \
    DS_OUT_ROOT=/tmp/r5_dsroot256 DS_TAG=r5win

echo "STAGE2 COMPLETE $(date -u)"
