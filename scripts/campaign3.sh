#!/bin/bash
# Campaign phase 3: drift-targeted cascade fine-tunes (CPU-feasible).
#
# docs/RD.md's analysis: GOP-8/32 PSNR is drift-dominated — the models
# train on 2 cascaded P-frames (max-frames 3) and the per-frame PSNR
# trajectory falls off exactly where the training cascade stops. This
# phase fine-tunes the trained operating points with max-frames 5
# (4 cascaded P-frames through the DPB) in the e2e_intra stage (the
# I-frame inside the train graph is the frozen intra codec's
# reconstruction, matching the eval distribution), then re-evaluates
# with the real bitstream at GOP 8 and GOP 32.
#
# Sized for this host (1 CPU core, XLA:CPU): batch 4, 128^2 crops.
# Reference protocol anchors: /root/reference/dmc/train.py:298-330
# (curriculum), train.sh:9 (max-frames operating point).
#
#   bash scripts/campaign3.sh /root/campaign [lambda ...]
set -euo pipefail

WORK=${1:-/root/campaign}
shift || true
LAMBDAS=("${@:-512}")
REPO=/root/repo
export JAX_COMPILATION_CACHE_DIR=$REPO/.jax_cache
# CPU campaign: force the CPU backend unconditionally — the machine
# profile PINS JAX_PLATFORMS=axon, so a ${VAR:-cpu} default would keep
# axon (and hang/fail when the tunnel is down). Set CAMPAIGN3_TPU=1 to
# run on the TPU instead (restores the axon plugin site on PYTHONPATH).
if [ "${CAMPAIGN3_TPU:-0}" = 1 ]; then
  export PYTHONPATH=/root/.axon_site:$REPO
else
  export JAX_PLATFORMS=cpu
  export XLA_FLAGS="${XLA_FLAGS:---xla_backend_optimization_level=0}"
  export PYTHONPATH=$REPO
fi
cd "$WORK"

log() { echo "[campaign3 $(date +%H:%M:%S)] $*"; }

# FT_EXTRA / EVAL_EXTRA: extra CLI args appended to the train / eval
# commands (e.g. FT_EXTRA="--unet-width 24 --init-partial" for the
# recon-UNet width RD-trade, with EVAL_EXTRA="--unet-width 24").
# FT_TAG overrides the checkpoint/results tag when the default
# dmc[_fast]_mf$MF would collide with an existing run.
FT_ARGS="--batch-size ${FT_BATCH:-4} --max-frames ${FT_FRAMES:-5} \
  --patch-size ${FT_PATCH:-128} ${FT_PATCH:-128} \
  --num-workers 2 --test-batch-size ${FT_BATCH:-4} -q 6 \
  --intra-checkpoint checkpoints/intra_q6 --name campaign3 \
  --log-every ${FT_LOG:-5} \
  --start-epoch ${FT_START:-50} -e ${FT_END:-53} ${FT_EXTRA:-}"

MF=${FT_FRAMES:-5}   # cascade length keys the tags/results dirs
ft() {  # $1 = lambda, $2 = variant (base|fast)
  local tag=dmc_mf$MF; [ "$2" = fast ] && tag=dmc_fast_mf$MF
  tag=${FT_TAG:-$tag}
  # FT_INIT overrides the warm-start source (e.g. chain mf7 from the
  # finished mf5 point instead of the max-frames-3 base).
  local init=${FT_INIT:-checkpoints/dmc/$1.0}
  [ "$2" = fast ] && init=${FT_INIT:-checkpoints/dmc_fast/$1.0}
  if [ ! -d checkpoints/$tag/$1.0/params_export ]; then
    log "drift fine-tune dmc lambda=$1 variant=$2 (max-frames $MF)"
    python -m deepvideocodec_tpu.cli.train -m dmc -d data/vimeo \
      --lambda $1 --variant $2 $FT_ARGS \
      --init-from $init --checkpoint checkpoints/$tag/$1.0
  fi
}

eval_dmc() {  # $1 = lambda, $2 = variant, $3 = gop, $4 = ckpt tag
  local tag=$4
  # Completeness guard (evaluate APPENDS one record per sequence — an
  # unguarded re-run would double-count; a killed run leaves a partial
  # file that must be deleted, not skipped). scripts/check_results.py.
  local res=results/${tag}_$1_gop$3_f${EVAL_FRAMES:-24}/q6.json
  if JAX_PLATFORMS=cpu python $REPO/scripts/check_results.py "$res" \
       --expect "${EVAL_SEQS_N:-4}" --clean; then
    log "eval $tag lambda=$1 gop=$3 already complete; skipping"
    return 0
  fi
  log "evaluating: $tag lambda=$1 gop=$3 (${EVAL_FRAMES:-24} frames)"
  python -m deepvideocodec_tpu.cli.evaluate -m dmc --variant $2 \
    --frames-root data/eval -q 6 --gop $3 --frames ${EVAL_FRAMES:-24} \
    --checkpoint checkpoints/$tag/$1.0 \
    --intra-checkpoint checkpoints/intra_q6 \
    --results-dir results/${tag}_$1_gop$3_f${EVAL_FRAMES:-24} \
    --cache-dir cache/${tag}_$1_gop$3 \
    --streams ${EVAL_STREAMS:-1} --per-frame ${EVAL_EXTRA:-}
}

for L in "${LAMBDAS[@]}"; do
  ft "$L" "${FT_VARIANT:-base}"
  tag=dmc_mf$MF; [ "${FT_VARIANT:-base}" = fast ] && tag=dmc_fast_mf$MF
  tag=${FT_TAG:-$tag}   # keep evals pointed at the FT_TAG checkpoint
  eval_dmc "$L" "${FT_VARIANT:-base}" 8 "$tag"
  eval_dmc "$L" "${FT_VARIANT:-base}" 32 "$tag"
done

log "campaign3 complete"
