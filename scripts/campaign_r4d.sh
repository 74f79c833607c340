#!/bin/bash
# Round-4 chain, part D: finish separating the intra quality ladder.
#
# The r3b repair made RATE monotone (q4 0.554 < q5 0.614 < q6 0.650 bpp)
# but left FIDELITY anti-monotone (q4 27.99 > q5 27.17 > q6 25.41 dB):
# PSNR tracked the per-q training budget (q4/q5 got 12 fresh epochs from
# the q6 warm start, q6 itself only +6), not lambda. The lambda wiring is
# verified correct (cli/train_intra.py:101 — loss = lambda*mse + bpp, per-q
# lambda from models/intra.py:INTRA_QUALITIES). Fix: extend the budgets
# until the lambda ordering dominates — q5 to 18 epochs, q6 to 24 —
# then re-evaluate the whole ladder fresh.
# Reference capability anchored: per-quality cheng2020_anchor points
# (/root/reference/dmc/train.py:564-569, test.py:108-113).
#
#   bash scripts/campaign_r4d.sh /root/campaign
#
# Markers: R4D-Q5-DONE, R4D-Q6-DONE, R4D-EVAL-DONE, ALL-R4D-DONE.
set -euo pipefail
trap 'echo "R4D-FAILED: ${BASH_COMMAND} (line $LINENO)"' ERR

WORK=${1:-/root/campaign}
REPO=/root/repo
export JAX_COMPILATION_CACHE_DIR=$REPO/.jax_cache
export PYTHONPATH=/root/.axon_site:$REPO
cd "$WORK"

log() { echo "[r4d $(date +%H:%M:%S)] $*"; }

intra_more() {  # $1 = q, $2 = total epochs, $3 = npz name
  log "extending intra q$1 to $2 total epochs"
  python -m deepvideocodec_tpu.cli.train_intra -d data/images -q $1 \
    --init-from $REPO/ckpts/intra_q6.npz --batch-size 8 -e $2 \
    --checkpoint checkpoints/intra_q$1 \
    --patch-size 256 256 --num-workers 2 --name r4d
  python $REPO/scripts/export_weights.py checkpoints/intra_q$1 \
    $REPO/ckpts/$3 --model intra --quality $1
  echo R4D-Q$1-DONE
}
intra_more 5 ${Q5_EPOCHS:-18} intra_q5.npz
intra_more 6 ${Q6_EPOCHS:-24} intra_q6_r4d.npz

# fresh results dir — append_result has no dedup
for q in 4 5 6; do
  if [ ! -f results/intra_r4d/q$q.json ]; then
    log "evaluating q$q (GOP 1, ${EVAL_FRAMES:-96} frames)"
    python -m deepvideocodec_tpu.cli.evaluate -m intra --gop 1 \
      --frames-root data/eval -q $q \
      --intra-checkpoint 'checkpoints/intra_q{q}' \
      --results-dir results/intra_r4d --cache-dir cache/intra_r4d \
      --streams 4 --frames ${EVAL_FRAMES:-96}
  fi
done
echo R4D-EVAL-DONE

python $REPO/scripts/rd_report.py $WORK
echo ALL-R4D-DONE
