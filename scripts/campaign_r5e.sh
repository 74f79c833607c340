#!/bin/bash
# Round-5 part E: DVC / DCVC trained RD points, standalone.
#
# VERDICT r4 "missing #3" — the last capability-parity item closable in
# this environment. campaign_r5.sh only reaches its family() phase
# after the mf9 long-cascades; this chain runs the families directly,
# TPU-backed, gated on the speed probes finishing (ORCH-DONE in
# /root/orchestrator.out) so it never pollutes probe timings. Shares
# checkpoint dirs/guards with campaign_r5.sh family() — whichever runs
# first wins.
#
#   nohup bash scripts/campaign_r5e.sh > /root/campaign_r5e.out 2>&1 &
#   echo $! > /tmp/r5e.pid
#
# Markers: R5E-DVC-DONE, R5E-DCVC-DONE, ALL-R5E-DONE.
set -euo pipefail
trap 'echo "R5E-FAILED: ${BASH_COMMAND} (line $LINENO)"' ERR

REPO=/root/repo
WORK=/root/campaign
mkdir -p "$WORK"
export JAX_COMPILATION_CACHE_DIR=$REPO/.jax_cache
export PYTHONPATH=/root/.axon_site:$REPO
cd "$WORK"

log() { echo "[r5e $(date +%H:%M:%S)] $*"; }

FRAMES=${EVAL_FRAMES:-96}
INTRA_NPZ=$REPO/ckpts/intra_q6_r4d.npz
NSEQ=${EVAL_SEQS_N:-4}
done_eval() { JAX_PLATFORMS=cpu python $REPO/scripts/check_results.py \
  "$1" --expect "$NSEQ" --clean; }

# gate: don't start TPU work while the speed probes are measuring
while ! grep -q "ORCH-DONE" /root/orchestrator.out 2>/dev/null; do
  if [ -f /tmp/orch.pid ] && ! kill -0 "$(cat /tmp/orch.pid)" 2>/dev/null; then
    log "orchestrator dead; proceeding"
    break
  fi
  sleep 60
done
log "starting families"

# Args MUST match campaign_r5.sh family() exactly (resume math divides
# by the capped epoch length).
FAM_STEPS=${FAM_STEPS:-24}
FAM_ARGS="-d data/vimeo --lambda 2048 --batch-size 8 --max-frames 3
  --patch-size 128 128 --num-workers 2 --test-batch-size 8
  --steps-per-epoch $FAM_STEPS --log-every 8 --name r5"
family() {  # $1 = dvc|dcvc
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
  if [ ! -f $REPO/ckpts/${m}_2048.npz ]; then
    python $REPO/scripts/export_weights.py checkpoints/${m}_c/2048.0 \
      $REPO/ckpts/${m}_2048.npz --model $m
  fi
  for gop in 8 32; do
    if ! done_eval results/${m}_2048_gop${gop}_f${FRAMES}/q6.json; then
      log "eval $m gop=$gop ($FRAMES frames)"
      python -m deepvideocodec_tpu.cli.evaluate -m $m \
        --frames-root data/eval -q 6 --gop $gop --frames $FRAMES \
        --checkpoint checkpoints/${m}_c/2048.0 \
        --intra-checkpoint $INTRA_NPZ \
        --results-dir results/${m}_2048_gop${gop}_f${FRAMES} \
        --cache-dir cache/${m}_2048_gop${gop}_f${FRAMES} \
        --streams 4 --per-frame
    fi
  done
  echo R5E-$(echo $m | tr a-z A-Z)-DONE
}
family dvc
family dcvc

python $REPO/scripts/rd_report.py $WORK || echo R5E-REPORT-FAILED
echo ALL-R5E-DONE
