#!/bin/bash
# Round-5 TPU probe batch, run in the chip-idle window between the
# stage-2 quality runs:
#   1. fused-loss kernel step time, direct vs grouped embedding
#      (VERDICT r4 next #4 — is the double-angle ladder the ~3 ms win
#      the round-4 decomposition predicted?)
#   2. CORS_TIMING stage breakdown at bench scale (VERDICT r4 next #5),
#      now with the dispatch-all-blocks + threaded-saves pipelining
#   3. entry() value check on the idle TPU (a concurrent-with-training
#      run printed NaNs; rule out real TPU-path numerics)
# Logs: /tmp/r5_sweep/probe_*.log
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5_sweep

echo "=== loss_kernel direct ($(date -u +%H:%M:%S))"
python experiments/loss_kernel_probe.py > /tmp/r5_sweep/probe_lk_direct.log 2>&1
tail -4 /tmp/r5_sweep/probe_lk_direct.log

echo "=== loss_kernel grouped"
PROBE_EMBED=grouped python experiments/loss_kernel_probe.py > /tmp/r5_sweep/probe_lk_grouped.log 2>&1
tail -4 /tmp/r5_sweep/probe_lk_grouped.log

echo "=== cors e2e timing"
CORS_TIMING=1 python experiments/cors_e2e_probe.py > /tmp/r5_sweep/probe_cors.log 2>&1
tail -40 /tmp/r5_sweep/probe_cors.log

echo "=== entry value check"
python - > /tmp/r5_sweep/probe_entry.log 2>&1 <<'EOF'
import jax, numpy as np
import __graft_entry__ as g
fn, args = g.entry()
out = np.asarray(jax.jit(fn)(*args))
print("finite:", bool(np.isfinite(out).all()),
      "nan_frac:", float(np.isnan(out).mean()),
      "min/max:", np.nanmin(out), np.nanmax(out))
EOF
tail -2 /tmp/r5_sweep/probe_entry.log
echo "PROBES COMPLETE $(date -u)"
