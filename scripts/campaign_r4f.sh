#!/bin/bash
# Round-4 TPU chain, part F: fast4 (feat_half — /2-native DPB feature,
# models/dmc.py:95-109) speed probe + drift fine-tune + protocol evals.
#
#   1. Speed probe: BENCH_PARTIAL warm start from the trained fast3
#      export (fast4's param tree is a strict subset — the four /1<->/2
#      bridge convs drop out; everything else restores trained).
#   2. If the probe holds, the exact 2-epoch mf5 drift fine-tune recipe
#      that landed fast2/fast3, warm-started --init-partial from the
#      fast3 export, then 96-frame GOP-8/32 evals + npz export.
#
#   nohup bash scripts/campaign_r4f.sh > /root/campaign_r4f.out 2>&1 &
#   echo $! > /tmp/r4f.pid
#
# Markers: R4F-PROBE-DONE, R4F-TRAIN-DONE, ALL-R4F-DONE.
set -euo pipefail
trap 'echo "R4F-FAILED: ${BASH_COMMAND} (line $LINENO)"' ERR

REPO=/root/repo
WORK=/root/campaign
export JAX_COMPILATION_CACHE_DIR=$REPO/.jax_cache
export PYTHONPATH=/root/.axon_site:$REPO

log() { echo "[r4f $(date +%H:%M:%S)] $*"; }

# ---- 1. speed probe (trained-weight payloads, fresh-init bridge gaps) ----
if [ ! -f /root/fast4_probe.json ]; then
  log "fast4 speed probe (BENCH_PARTIAL from the fast3 export)"
  cd $REPO
  BENCH_VARIANT=fast4 BENCH_PARTIAL=1 \
    BENCH_NPZ=$REPO/ckpts/dmc_fast3_2048_mf5.npz \
    python bench.py | tee /root/fast4_probe.json
fi
echo R4F-PROBE-DONE

# ---- 2. fine-tune + 96-frame evals (the fast2/fast3 recipe) ----
cd "$WORK"
CAMPAIGN3_TPU=1 FT_VARIANT=fast4 FT_TAG=dmc_fast4_mf5 \
  FT_INIT=$REPO/ckpts/dmc_fast3_2048_mf5.npz FT_EXTRA="--init-partial" \
  FT_START=50 FT_END=52 EVAL_FRAMES=96 EVAL_STREAMS=4 \
  bash $REPO/scripts/campaign3.sh $WORK 2048
echo R4F-TRAIN-DONE

python $REPO/scripts/export_weights.py \
  $WORK/checkpoints/dmc_fast4_mf5/2048.0 \
  $REPO/ckpts/dmc_fast4_2048_mf5.npz --model dmc --variant fast4
echo ALL-R4F-DONE
