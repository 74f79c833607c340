#!/bin/bash
# Round-5 CPU-side chain: runs while the TPU relay is down (zombie mode
# observed again at round-5 start: port 8083 answers, jax clients hang
# >300 s in backend init). Does the CPU-feasible remainder of the queue:
#
#   0. corpora + intra_q6 rebuild (campaign_r5.sh phase 0b's blocks) —
#      under $WORK/.bootstrap.lock so the TPU chain, which gates on the
#      relay and may wake mid-generation, waits instead of racing.
#   1. DVC / DCVC family training (the r4g A/B/C compressed curriculum,
#      VERDICT r4 "missing #3") on XLA:CPU into the SAME checkpoint dirs
#      campaign_r5.sh family() guards on — under
#      $WORK/.families_cpu.lock so the TPU chain never double-trains.
#      cli.train auto-resumes a dir from its latest step, so kills are
#      cheap. FAM args must stay IDENTICAL to campaign_r5.sh's (epoch
#      math is steps_per_epoch-derived; a batch-size mismatch between a
#      partial CPU run and a TPU resume would garble the stage windows).
#   2. npz exports the moment each family lands (VM wipes eat anything
#      uncommitted).
#
#   nohup bash scripts/campaign_r5_cpu.sh > /root/campaign_r5_cpu.out 2>&1 &
#   echo $! > /tmp/r5cpu.pid
#
# Markers: R5CPU-DATA-DONE, R5CPU-DVC-DONE, R5CPU-DCVC-DONE, ALL-R5CPU-DONE.
set -euo pipefail

REPO=/root/repo
WORK=/root/campaign
mkdir -p "$WORK"
trap 'rm -f "$WORK/.bootstrap.lock" "$WORK/.families_cpu.lock";
      echo "R5CPU-FAILED: ${BASH_COMMAND} (line $LINENO)"' ERR
export JAX_COMPILATION_CACHE_DIR=$REPO/.jax_cache
export JAX_PLATFORMS=cpu
export XLA_FLAGS="${XLA_FLAGS:---xla_backend_optimization_level=0}"
export PYTHONPATH=$REPO
cd "$WORK"

log() { echo "[r5cpu $(date +%H:%M:%S)] $*"; }

INTRA_NPZ=$REPO/ckpts/intra_q6_r4d.npz

# ---- 0. corpora (seed-0, bit-identical to the wiped trees) ----
touch .bootstrap.lock
if [ ! -f data/vimeo/sep_trainlist.txt ]; then
  log "generating base synthetic corpus (train clips + images + eval)"
  python -m deepvideocodec_tpu.cli.synth_data \
    --out data --clips ${CLIPS:-512} --clip-size 192 --images 400 \
    --image-size 256 --eval-seqs 4 --eval-frames 96 --eval-size 256 256
fi
if [ ! -f data15/vimeo/sep_trainlist.txt ]; then
  log "generating 15-frame long-cascade training clips"
  python -m deepvideocodec_tpu.cli.synth_data \
    --out data15 --clips 256 --clip-frames 15 --clip-size 192 \
    --images 2 --test-images 1 --eval-seqs 1 --eval-frames 2
fi
if [ ! -d checkpoints/intra_q6/params_export ]; then
  log "rebuilding checkpoints/intra_q6 from $INTRA_NPZ"
  python $REPO/scripts/npz_to_export.py $INTRA_NPZ checkpoints/intra_q6 \
    --kind intra -q 6
fi
rm -f .bootstrap.lock
echo R5CPU-DATA-DONE

# ---- 1. DVC / DCVC family training (identical args to campaign_r5.sh
# family(); train-only — evals belong to the TPU chain) ----
# --steps-per-epoch caps the epoch at FAM_STEPS steps (~25-45 s/step on
# this 1-core host; the full 58-step epoch x 10 epochs is a >6 h/family
# recipe that cannot land inside a round). MUST match campaign_r5.sh's
# FAM_ARGS exactly — epoch/resume math divides by the capped length.
FAM_STEPS=${FAM_STEPS:-24}
FAM_ARGS="-d data/vimeo --lambda 2048 --batch-size 8 --max-frames 3
  --patch-size 128 128 --num-workers 2 --test-batch-size 8
  --steps-per-epoch $FAM_STEPS --log-every 8 --name r5"
train_family() {  # $1 = dvc|dcvc
  local m=$1
  if [ ! -d checkpoints/${m}_a/2048.0/params_export ]; then
    log "$m phase A: 4 epochs MSE (stage frame_mse)"
    python -m deepvideocodec_tpu.cli.train -m $m $FAM_ARGS \
      --checkpoint checkpoints/${m}_a/2048.0 --start-epoch 20 -e 24
  fi
  if [ ! -d checkpoints/${m}_b/2048.0/params_export ]; then
    log "$m phase B: 4 epochs e2e RD"
    python -m deepvideocodec_tpu.cli.train -m $m $FAM_ARGS \
      --init-from checkpoints/${m}_a/2048.0 \
      --checkpoint checkpoints/${m}_b/2048.0 --start-epoch 44 -e 48
  fi
  if [ ! -d checkpoints/${m}_c/2048.0/params_export ]; then
    log "$m phase C: 2 epochs e2e_intra (frozen repaired-intra I-frame)"
    python -m deepvideocodec_tpu.cli.train -m $m $FAM_ARGS \
      --init-from checkpoints/${m}_b/2048.0 \
      --checkpoint checkpoints/${m}_c/2048.0 --start-epoch 50 -e 52 \
      -q 6 --intra-checkpoint $INTRA_NPZ
  fi
  python $REPO/scripts/export_weights.py checkpoints/${m}_c/2048.0 \
    $REPO/ckpts/${m}_2048.npz --model $m
  echo R5CPU-$(echo $m | tr a-z A-Z)-DONE
}

touch .families_cpu.lock
train_family dvc
train_family dcvc
rm -f .families_cpu.lock
echo ALL-R5CPU-DONE
