#!/bin/bash
# Round-3b chain: fix the intra quality ladder (VERDICT r2 item 4).
#
# The committed all-intra ladder is non-monotone (q5 codes FEWER bits
# than q4 at equal PSNR — docs/RD.md) because q4/q5 got only 600 steps
# from scratch. q4/q5/q6 share one topology (n=128, m=192; only lambda
# differs: 845/1625/3140 — models/intra.py:450-457), so warm-starting
# q4/q5 from the committed trained q6 export and fine-tuning at their
# OWN lambda buys separation far cheaper than scratch training.
# Reference capability anchored: frozen pretrained cheng2020_anchor at
# q4/5/6 (/root/reference/dmc/train.py:564-569, test.py:108-113).
#
#   bash scripts/campaign_r3b.sh /root/campaign
#
# Resumable: each phase is skipped when its artifact already exists.
# Runs on the TPU (axon) by default; R3B_CPU=1 forces XLA:CPU.
# Markers: R3B-INTRA-Q{4,5,6}-DONE, R3B-EVAL-DONE, ALL-R3B-DONE.
set -euo pipefail

WORK=${1:-/root/campaign}
REPO=/root/repo
export JAX_COMPILATION_CACHE_DIR=$REPO/.jax_cache
if [ "${R3B_CPU:-0}" = 1 ]; then
  export JAX_PLATFORMS=cpu
  export XLA_FLAGS="${XLA_FLAGS:---xla_backend_optimization_level=0}"
  export PYTHONPATH=$REPO
else
  export PYTHONPATH=/root/.axon_site:$REPO
fi
mkdir -p "$WORK"; cd "$WORK"

log() { echo "[r3b $(date +%H:%M:%S)] $*"; }

if [ ! -f data/vimeo/sep_trainlist.txt ]; then
  log "generating synthetic datasets (seed 0 = round-2-identical corpus)"
  python -m deepvideocodec_tpu.cli.synth_data --out data \
    --clips ${CLIPS:-512} --clip-size 192 --images ${IMAGES:-400} \
    --image-size 256 --eval-seqs ${EVAL_SEQS:-4} \
    --eval-frames ${EVAL_FRAMES:-96} --eval-size 256 256
fi

# ---- intra ladder fine-tunes ----
# q4/q5: 12 epochs from the q6 export at their own lambda.
# q6: +6 epochs continuing its own export.
intra_ft() {  # $1 = q, $2 = epochs
  # Resume via --checkpoint (the CLI restores the latest step and no-ops
  # once start_epoch >= epochs) — an existence guard on params_export is
  # satisfied after epoch 0 and silently exports undertrained weights
  # after a mid-train reboot (round-3 advisor, medium).
  log "training intra q$1 (${2} epochs, warm start from intra_q6.npz)"
  python -m deepvideocodec_tpu.cli.train_intra -d data/images -q $1 \
    --init-from $REPO/ckpts/intra_q6.npz --batch-size 8 -e $2 \
    --checkpoint checkpoints/intra_q$1 \
    --patch-size 256 256 --num-workers 2 --name r3b
  local out=$REPO/ckpts/intra_q$1.npz
  [ $1 = 6 ] && out=$REPO/ckpts/intra_q6_r3b.npz  # judge vs old by eval
  python $REPO/scripts/export_weights.py checkpoints/intra_q$1 "$out" \
    --model intra --quality $1
  echo R3B-INTRA-Q$1-DONE
}
intra_ft 4 ${Q45_EPOCHS:-12}
intra_ft 5 ${Q45_EPOCHS:-12}
intra_ft 6 ${Q6_EPOCHS:-6}

# ---- GOP-1 real-bitstream evals across the ladder ----
# Per-quality guard: append_result has no dedup, so a crash between
# qualities + blanket re-run would double-append into the finished
# q jsons (round-3 advisor, low).
for q in 4 5 6; do
  if [ ! -f results/intra_r3b/q$q.json ]; then
    log "evaluating re-trained q$q (GOP 1, ${EVAL_FRAMES:-96} frames)"
    python -m deepvideocodec_tpu.cli.evaluate -m intra --gop 1 \
      --frames-root data/eval -q $q \
      --intra-checkpoint 'checkpoints/intra_q{q}' \
      --results-dir results/intra_r3b --cache-dir cache/intra_r3b \
      --streams 4 --frames ${EVAL_FRAMES:-96}
  fi
done
echo R3B-EVAL-DONE

python $REPO/scripts/rd_report.py results
echo ALL-R3B-DONE
