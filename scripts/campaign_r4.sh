#!/bin/bash
# Round-4 TPU chain, part A (VERDICT r3 items 1+2):
#   1. fast3 drift fine-tune (lambda=2048, 2-epoch max-frames-5 — the
#      exact recipe that landed fast2) warm-started --init-partial from
#      the fast2 mf5 export, then 96-frame GOP-8/32 TPU evals + npz
#      export. Speed probe already holds: fast3 2.214 fps vs fast2
#      1.651 (34% cut — docs/PERFORMANCE.md).
#   2. The repaired intra-ladder chain (campaign_r3b.sh): training
#      phases no-op via --checkpoint resume, then the GOP-1 evals that
#      round 3's --gop bug killed.
#
#   nohup bash scripts/campaign_r4.sh > /root/campaign_r4.out 2>&1 &
#
# Markers: R4-FAST3-TRAIN-DONE, R4-FAST3-EXPORT-DONE, (r3b's markers),
# ALL-R4A-DONE. Liveness: scripts/chain_status.sh.
set -euo pipefail
trap 'echo "R4A-FAILED: ${BASH_COMMAND} (line $LINENO)"' ERR

REPO=/root/repo
WORK=/root/campaign

CAMPAIGN3_TPU=1 FT_VARIANT=fast3 FT_TAG=dmc_fast3_mf5 \
  FT_INIT=$REPO/ckpts/dmc_fast2_2048_mf5.npz FT_EXTRA="--init-partial" \
  FT_START=50 FT_END=52 EVAL_FRAMES=96 EVAL_STREAMS=4 \
  bash $REPO/scripts/campaign3.sh $WORK 2048
echo R4-FAST3-TRAIN-DONE

python $REPO/scripts/export_weights.py \
  $WORK/checkpoints/dmc_fast3_mf5/2048.0 \
  $REPO/ckpts/dmc_fast3_2048_mf5.npz --model dmc --variant fast3
echo R4-FAST3-EXPORT-DONE

bash $REPO/scripts/campaign_r3b.sh $WORK
echo ALL-R4A-DONE
