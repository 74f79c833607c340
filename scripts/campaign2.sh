#!/bin/bash
# Campaign phase 2: lambda-adaptation fine-tunes + real-bitstream RD eval.
#
# Phase 1 (campaign.sh) trains the intra ladder and ONE full 6-stage
# curriculum run (lambda=512, every stage boundary crossed in one
# TrainState). This phase derives the other operating points from it the
# cheap way: warm-start params (--init-from) and run only the late
# curriculum window (--start-epoch 44: e2e_rd then e2e_intra), which
# adapts the RD balance to the new lambda in ~12 epochs instead of 56.
# The fast topology variant fine-tunes from the base-2048 point the same
# way (identical param shapes; only warp/flow resolution differs).
#
#   bash scripts/campaign2.sh /root/campaign
set -euo pipefail

WORK=${1:-/root/campaign}
REPO=/root/repo
export JAX_COMPILATION_CACHE_DIR=$REPO/.jax_cache
export PYTHONPATH=/root/.axon_site:$REPO
cd "$WORK"

log() { echo "[campaign2 $(date +%H:%M:%S)] $*"; }

FT_ARGS="--batch-size 8 --max-frames 3 --patch-size 192 192 \
  --num-workers 2 --test-batch-size 8 -q 6 \
  --intra-checkpoint checkpoints/intra_q6 --name campaign \
  --start-epoch ${FT_START:-44} -e ${DMC_EPOCHS:-56}"

ft() {  # $1 = lambda, $2 = variant, $3 = init-from dir
  local tag=dmc; [ "$2" = fast ] && tag=dmc_fast
  if [ ! -d checkpoints/$tag/$1.0/params_export ]; then
    log "fine-tuning dmc lambda=$1 variant=$2 from $3"
    python -m deepvideocodec_tpu.cli.train -m dmc -d data/vimeo \
      --lambda $1 --variant $2 $FT_ARGS \
      --init-from $3 --checkpoint checkpoints/$tag/$1.0
  fi
}

ft 2048 base checkpoints/dmc/512.0
ft 8192 base checkpoints/dmc/2048.0
ft 2048 fast checkpoints/dmc/2048.0

# ---- real-bitstream RD evaluation ----
log "evaluating: all-intra ladder"
python -m deepvideocodec_tpu.cli.evaluate -m intra \
  --frames-root data/eval -q 4 5 6 \
  --intra-checkpoint 'checkpoints/intra_q{q}' \
  --results-dir results/intra --cache-dir cache/intra --streams 4 \
  --frames ${EVAL_FRAMES:-96}

eval_dmc() {  # $1 = lambda, $2 = variant
  local tag=dmc; [ "$2" = fast ] && tag=dmc_fast
  log "evaluating: dmc lambda=$1 variant=$2"
  python -m deepvideocodec_tpu.cli.evaluate -m dmc --variant $2 \
    --frames-root data/eval -q 6 --gop 32 --frames ${EVAL_FRAMES:-96} \
    --checkpoint checkpoints/$tag/$1.0 \
    --intra-checkpoint checkpoints/intra_q6 \
    --results-dir results/${tag}_$1 --cache-dir cache/${tag}_$1 \
    --streams 4
}

eval_dmc 512 base
eval_dmc 2048 base
eval_dmc 8192 base
eval_dmc 2048 fast

log "campaign2 complete; RD report:"
python $REPO/scripts/rd_report.py "$WORK"
