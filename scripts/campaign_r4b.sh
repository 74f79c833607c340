#!/bin/bash
# Round-4 TPU chain, part B (VERDICT r3 items 4, 5, 6):
#   1. Protocol-complete 96-frame GOP-8/32 TPU evals for the committed
#      mf5 family (512/2048/fast2-2048) — replaces docs/RD.md's
#      24-frame CPU stand-ins. (8192 gets its 96-frame evals from
#      phase 2's fine-tune chain.)
#   2. 8192 GOP-32 inversion fix: 2 more mf5 epochs at half LR from the
#      committed dmc_8192_mf5 point, + 96-frame evals.
#   3. One trained RD point each for DVC and DCVC (lambda=2048,
#      compressed curriculum via --start-epoch stage selection:
#      4 epochs MSE -> 4 epochs e2e RD -> 2 epochs e2e_intra),
#      + 96-frame GOP-8/32 evals + npz exports.
#   4. mf7 drift retry (VERDICT item 5): 2 epochs max-frames-7 at half
#      LR from the base-2048 mf5 point (the single-epoch full-LR
#      attempt degraded — docs/RD.md negative result).
#
#   nohup bash scripts/campaign_r4b.sh > /root/campaign_r4b.out 2>&1 &
#
# Markers: R4B-EVAL96-DONE, R4B-8192-DONE, R4B-DVC-DONE, R4B-DCVC-DONE,
# R4B-MF7-DONE, ALL-R4B-DONE. Liveness: scripts/chain_status.sh.
set -euo pipefail
trap 'echo "R4B-FAILED: ${BASH_COMMAND} (line $LINENO)"' ERR

REPO=/root/repo
WORK=/root/campaign
export JAX_COMPILATION_CACHE_DIR=$REPO/.jax_cache
export PYTHONPATH=/root/.axon_site:$REPO
cd "$WORK"

log() { echo "[r4b $(date +%H:%M:%S)] $*"; }

FRAMES=${EVAL_FRAMES:-96}

eval96() {  # $1 family_lambda tag  $2 ckpt  $3 gop  $4 extra-args...
  # result-dir names follow rd_report.py's <family>_<lambda>_gop<G>_f<F>
  # convention so the points group into BD-rate curves
  local tag=$1 ckpt=$2 gop=$3; shift 3
  if [ -f results/${tag}_gop${gop}_f${FRAMES}/q6.json ]; then
    log "eval $tag gop$gop already done; skipping"
    return
  fi
  log "eval $tag gop=$gop ($FRAMES frames, TPU)"
  python -m deepvideocodec_tpu.cli.evaluate -m dmc \
    --frames-root data/eval -q 6 --gop $gop --frames $FRAMES \
    --checkpoint "$ckpt" --intra-checkpoint $REPO/ckpts/intra_q6.npz \
    --results-dir results/${tag}_gop${gop}_f${FRAMES} \
    --cache-dir cache/${tag}_gop${gop}_f${FRAMES} --streams 4 "$@"
}

# ---- phase 1: protocol-complete the committed mf5 family ----
for gop in 8 32; do
  eval96 dmc_mf5_512  $REPO/ckpts/dmc_512_mf5.npz  $gop
  eval96 dmc_mf5_2048 $REPO/ckpts/dmc_2048_mf5.npz $gop
  eval96 dmc_fast2_mf5_2048 $REPO/ckpts/dmc_fast2_2048_mf5.npz $gop --variant fast2
done
echo R4B-EVAL96-DONE
# R4B_STOP_AFTER=eval96 lets the master chain (campaign_r4e.sh) run the
# protocol evals first and come back for the training phases later —
# the per-artifact guards make the second pass skip straight to phase 2.
[ "${R4B_STOP_AFTER:-}" = eval96 ] && exit 0

# ---- phase 2: 8192 GOP-32 inversion fix (half-LR mf5 continuation) ----
CAMPAIGN3_TPU=1 FT_TAG=dmc_mf5b FT_INIT=$REPO/ckpts/dmc_8192_mf5.npz \
  FT_START=50 FT_END=52 FT_EXTRA="--learning-rate 5e-5" \
  EVAL_FRAMES=$FRAMES EVAL_STREAMS=4 \
  bash $REPO/scripts/campaign3.sh $WORK 8192
python $REPO/scripts/export_weights.py \
  checkpoints/dmc_mf5b/8192.0 $REPO/ckpts/dmc_8192_mf5b.npz --model dmc
echo R4B-8192-DONE

# ---- phase 3: DVC / DCVC trained RD points (lambda=2048) ----
# Compressed curriculum: both families ignore the DMC-specific stage
# flags (their __call__ takes **_unused), so --start-epoch only selects
# the loss (mse_loss vs full RD) and the frozen-intra I-frame. Phases
# use separate checkpoint dirs chained by --init-from so a re-run
# resumes (resume wins over --init-from) or no-ops.
FAM_ARGS="-d data/vimeo --lambda 2048 --batch-size 8 --max-frames 3
  --patch-size 128 128 --num-workers 2 --test-batch-size 8
  --log-every 20 --name r4b"
family() {  # $1 = dvc|dcvc
  local m=$1
  log "$m phase A: 4 epochs MSE (stage frame_mse)"
  python -m deepvideocodec_tpu.cli.train -m $m $FAM_ARGS \
    --checkpoint checkpoints/${m}_a/2048.0 --start-epoch 20 -e 24
  log "$m phase B: 4 epochs e2e RD"
  python -m deepvideocodec_tpu.cli.train -m $m $FAM_ARGS \
    --init-from checkpoints/${m}_a/2048.0 \
    --checkpoint checkpoints/${m}_b/2048.0 --start-epoch 44 -e 48
  log "$m phase C: 2 epochs e2e_intra (frozen intra I-frame)"
  python -m deepvideocodec_tpu.cli.train -m $m $FAM_ARGS \
    --init-from checkpoints/${m}_b/2048.0 \
    --checkpoint checkpoints/${m}_c/2048.0 --start-epoch 50 -e 52 \
    -q 6 --intra-checkpoint $REPO/ckpts/intra_q6.npz
  python $REPO/scripts/export_weights.py checkpoints/${m}_c/2048.0 \
    $REPO/ckpts/${m}_2048.npz --model $m
  for gop in 8 32; do
    if [ ! -f results/${m}_2048_gop${gop}_f${FRAMES}/q6.json ]; then
      log "eval $m gop=$gop ($FRAMES frames)"
      python -m deepvideocodec_tpu.cli.evaluate -m $m \
        --frames-root data/eval -q 6 --gop $gop --frames $FRAMES \
        --checkpoint checkpoints/${m}_c/2048.0 \
        --intra-checkpoint $REPO/ckpts/intra_q6.npz \
        --results-dir results/${m}_2048_gop${gop}_f${FRAMES} \
        --cache-dir cache/${m}_2048_gop${gop}_f${FRAMES} --streams 4
    fi
  done
  echo R4B-$(echo $m | tr a-z A-Z)-DONE
}
family dvc
family dcvc

# ---- phase 4: mf7 drift retry (multi-epoch, half LR, from mf5-2048;
# the single-epoch full-LR attempt degraded — docs/RD.md) ----
CAMPAIGN3_TPU=1 FT_TAG=dmc_mf7 FT_FRAMES=7 \
  FT_INIT=$REPO/ckpts/dmc_2048_mf5.npz \
  FT_START=50 FT_END=54 FT_EXTRA="--learning-rate 5e-5" \
  EVAL_FRAMES=$FRAMES EVAL_STREAMS=4 \
  bash $REPO/scripts/campaign3.sh $WORK 2048
python $REPO/scripts/export_weights.py \
  checkpoints/dmc_mf7/2048.0 $REPO/ckpts/dmc_2048_mf7.npz --model dmc
echo R4B-MF7-DONE

python $REPO/scripts/rd_report.py $WORK
echo ALL-R4B-DONE
