#!/bin/bash
# Trained-RD campaign (VERDICT round-1 tasks 3/6/7): synthetic data ->
# intra quality ladder -> full 6-stage DMC curriculum at several lambdas
# (base topology + the fast speed variant) -> real-bitstream evaluation.
# Runs the REAL CLIs end to end on the TPU.
#
#   bash scripts/campaign.sh /root/campaign
#
# Env knobs (smoke runs / scale): CLIPS, IMAGES, INTRA_EPOCHS, DMC_EPOCHS,
# LAMBDAS, FAST_LAMBDAS, EVAL_SEQS, EVAL_FRAMES.
#
# Produces under $WORK:
#   data/                       synthetic vimeo/images/eval trees
#   checkpoints/intra_q{4,5,6}  trained intra ladder points
#   checkpoints/dmc/{lambda}/   trained DMC checkpoints (one per lambda)
#   checkpoints/dmc_fast/{l}/   trained fast-variant checkpoints
#   results/                    q{q}.json RD points from cli.evaluate
set -euo pipefail

WORK=${1:-/root/campaign}
REPO=/root/repo
export JAX_COMPILATION_CACHE_DIR=$REPO/.jax_cache
export PYTHONPATH=/root/.axon_site:$REPO
mkdir -p "$WORK"; cd "$WORK"

log() { echo "[campaign $(date +%H:%M:%S)] $*"; }

if [ ! -f data/vimeo/sep_trainlist.txt ]; then
  log "generating synthetic datasets"
  python -m deepvideocodec_tpu.cli.synth_data --out data \
    --clips ${CLIPS:-512} --clip-size 192 --images ${IMAGES:-400} \
    --image-size 256 --eval-seqs ${EVAL_SEQS:-4} \
    --eval-frames ${EVAL_FRAMES:-96} --eval-size 256 256
fi

# ---- intra ladder (frozen I-frame codecs; reference train.py:564-569) ----
for Q in 4 5 6; do
  if [ ! -d checkpoints/intra_q$Q/params_export ] ; then
    log "training intra q$Q"
    python -m deepvideocodec_tpu.cli.train_intra -d data/images -q $Q \
      --batch-size 8 -e ${INTRA_EPOCHS:-12} --patch-size 256 256 \
      --num-workers 2 --name campaign
  fi
done

# ---- DMC 6-stage curriculum, one run per lambda (train.sh operating
#      point at reduced scale; epochs 0-55 cross every stage boundary) ----
train_dmc() {  # $1 = lambda, $2 = variant
  log "training dmc lambda=$1 variant=$2"
  local tag=dmc; [ "$2" = fast ] && tag=dmc_fast
  python -m deepvideocodec_tpu.cli.train -m dmc -d data/vimeo \
    --lambda $1 --batch-size 8 --max-frames 3 --variant $2 \
    --patch-size 192 192 -e ${DMC_EPOCHS:-56} --num-workers 2 \
    --test-batch-size 8 -q 6 --intra-checkpoint checkpoints/intra_q6 \
    --checkpoint checkpoints/$tag/$1.0 --name campaign
}

for LMBDA in ${LAMBDAS:-512 2048 8192}; do train_dmc $LMBDA base; done
for LMBDA in ${FAST_LAMBDAS:-2048}; do train_dmc $LMBDA fast; done

# ---- real-bitstream RD evaluation ----
log "evaluating: all-intra ladder"
python -m deepvideocodec_tpu.cli.evaluate -m intra \
  --frames-root data/eval -q 4 5 6 \
  --intra-checkpoint 'checkpoints/intra_q{q}' \
  --results-dir results/intra --cache-dir cache/intra --streams 4 \
  --frames ${EVAL_FRAMES:-96}

eval_dmc() {  # $1 = lambda, $2 = variant
  log "evaluating: dmc lambda=$1 variant=$2"
  local tag=dmc; [ "$2" = fast ] && tag=dmc_fast
  python -m deepvideocodec_tpu.cli.evaluate -m dmc --variant $2 \
    --frames-root data/eval -q 6 --gop 32 --frames ${EVAL_FRAMES:-96} \
    --checkpoint checkpoints/$tag/$1.0 \
    --intra-checkpoint checkpoints/intra_q6 \
    --results-dir results/${tag}_$1 --cache-dir cache/${tag}_$1 \
    --streams 4
}

for LMBDA in ${LAMBDAS:-512 2048 8192}; do eval_dmc $LMBDA base; done
for LMBDA in ${FAST_LAMBDAS:-2048}; do eval_dmc $LMBDA fast; done

log "campaign complete; results under $WORK/results"
