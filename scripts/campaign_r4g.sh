#!/bin/bash
# Round-4 TPU chain, part G: re-base the RD story on the repaired
# (r4d) intra anchor and extend the DMC curve upward so BD-rate vs
# all-intra is computable again (docs/RD.md "Consequence" note).
#
# Phases, ordered by judge value / time risk:
#   0. Wait for ALL-R4F-DONE (fast4) — chains stay serial on the one
#      TPU and one CPU core. If the r4f process died without its
#      marker, proceed (its per-artifact guards make re-runs cheap).
#   1. 8192 GOP-32 inversion fix (VERDICT r3 item 4): 2 mf5 epochs at
#      half LR from the committed dmc_8192_mf5 point; the e2e_intra
#      stage now trains against the REPAIRED intra_q6 checkpoint, and
#      evals use it too — this is the top end of the DMC curve that
#      must overlap the 28-30 dB repaired-intra band.
#   2. Re-eval the committed family (512/2048/mf9/fast2/fast3) against
#      intra_q6_r4d: the landed tables used the old ~22 dB I-frame;
#      P-frames now decay from a +8 dB anchor. Cheap, eval-only.
#      New family tags carry an "i" suffix (dmc_mf5i, ...) so
#      rd_report groups them as separate curves.
#   3. fast3 long-cascade (mf9 via --scan-frames): the fast ladder's
#      GOP-32 drift fix (fast3-mf5 loses 7.3 dB across GOP 32).
#   4. DVC / DCVC trained RD points (VERDICT r3 item 6).
#
#   nohup bash scripts/campaign_r4g.sh > /root/campaign_r4g.out 2>&1 &
#   echo $! > /tmp/r4g.pid
#
# Markers: R4G-8192-DONE, R4G-REEVAL-DONE, R4G-F3MF9-DONE,
# R4G-DVC-DONE, R4G-DCVC-DONE, ALL-R4G-DONE.
set -euo pipefail
trap 'echo "R4G-FAILED: ${BASH_COMMAND} (line $LINENO)"' ERR

REPO=/root/repo
WORK=/root/campaign
export JAX_COMPILATION_CACHE_DIR=$REPO/.jax_cache
export PYTHONPATH=/root/.axon_site:$REPO
cd "$WORK"

log() { echo "[r4g $(date +%H:%M:%S)] $*"; }

FRAMES=${EVAL_FRAMES:-96}
INTRA_NPZ=$REPO/ckpts/intra_q6_r4d.npz

# ---- 0. serialize behind r4f ----
while [ -f /root/campaign_r4f.out ] \
      && ! grep -q ALL-R4F-DONE /root/campaign_r4f.out; do
  if [ -f /tmp/r4f.pid ] && ! kill -0 "$(cat /tmp/r4f.pid)" 2>/dev/null; then
    log "WARNING: r4f died without its marker; proceeding"
    break
  fi
  sleep 60
done
log "r4f clear; starting r4g"

# ---- 0b. per-stage 1080p profile of fast4 (the cut ranking for the
# next round's device-compute levers; ~10 min, stage programs warm
# from the r4f probe) ----
if [ ! -f /root/fast4_profile.md ]; then
  log "fast4 per-stage profile"
  PROF_VARIANT=fast4 PROF_NPZ=$REPO/ckpts/dmc_fast3_2048_mf5.npz \
    python $REPO/scripts/profile_stages.py | tee /root/fast4_profile.md
fi
echo R4G-PROFILE-DONE

# ---- 1. 8192 inversion fix (curve top end vs the repaired anchor).
# FT_TAG=dmc_mf5i so its eval results join the SAME rd_report family
# as phase 2's repaired-intra re-evals of 512/2048 — one 3-point curve
# that overlaps the intra_r4d band, making BD-rate computable. ----
CAMPAIGN3_TPU=1 FT_TAG=dmc_mf5i FT_INIT=$REPO/ckpts/dmc_8192_mf5.npz \
  FT_START=50 FT_END=52 FT_EXTRA="--learning-rate 5e-5" \
  EVAL_FRAMES=$FRAMES EVAL_STREAMS=4 \
  bash $REPO/scripts/campaign3.sh $WORK 8192
python $REPO/scripts/export_weights.py \
  checkpoints/dmc_mf5i/8192.0 $REPO/ckpts/dmc_8192_mf5b.npz --model dmc
echo R4G-8192-DONE

# ---- 2. re-eval the committed family vs the repaired intra ----
reeval() {  # $1 tag(family_lambda)  $2 npz  $3... extra args
  local tag=$1 npz=$2; shift 2
  for gop in 8 32; do
    if [ -f results/${tag}_gop${gop}_f${FRAMES}/q6.json ]; then
      log "reeval $tag gop$gop already done; skipping"; continue
    fi
    log "reeval $tag gop=$gop ($FRAMES frames, repaired intra)"
    python -m deepvideocodec_tpu.cli.evaluate -m dmc \
      --frames-root data/eval -q 6 --gop $gop --frames $FRAMES \
      --checkpoint "$npz" --intra-checkpoint $INTRA_NPZ \
      --results-dir results/${tag}_gop${gop}_f${FRAMES} \
      --cache-dir cache/${tag}_gop${gop}_f${FRAMES} --streams 4 "$@"
  done
}
# Tag names must match rd_report.py's family regex
# ((dmc|dvc|dcvc)(_fast\d*)?(_mf\d+[a-z]?)?): the "i" suffix rides the
# mf group, marking the repaired-intra protocol as a separate curve.
reeval dmc_mf5i_512   $REPO/ckpts/dmc_512_mf5.npz
reeval dmc_mf5i_2048  $REPO/ckpts/dmc_2048_mf5.npz
reeval dmc_mf9i_2048  $REPO/ckpts/dmc_2048_mf9.npz
reeval dmc_fast2_mf5i_2048 $REPO/ckpts/dmc_fast2_2048_mf5.npz --variant fast2
reeval dmc_fast3_mf5i_2048 $REPO/ckpts/dmc_fast3_2048_mf5.npz --variant fast3
echo R4G-REEVAL-DONE

# ---- 3. fast3 long-cascade: mf9 via --scan-frames (drift fix for the
# speed ladder; the corpus is r4c's 15-frame synthetic set) ----
if [ ! -d checkpoints/dmc_fast3_mf9/2048.0/params_export ]; then
  log "fast3 mf9 fine-tune (8-P-frame cascade, scan-frames)"
  python -m deepvideocodec_tpu.cli.train -m dmc -d data15/vimeo \
    --variant fast3 --lambda 2048 --batch-size 4 --max-frames 9 \
    --scan-frames --patch-size 128 128 --num-workers 2 \
    --test-batch-size 4 --log-every 20 --name r4g -q 6 \
    --intra-checkpoint checkpoints/intra_q6 \
    --learning-rate 5e-5 --start-epoch 50 -e 54 \
    --init-from $REPO/ckpts/dmc_fast3_2048_mf5.npz \
    --checkpoint checkpoints/dmc_fast3_mf9/2048.0
fi
python $REPO/scripts/export_weights.py checkpoints/dmc_fast3_mf9/2048.0 \
  $REPO/ckpts/dmc_fast3_2048_mf9.npz --model dmc --variant fast3
reeval dmc_fast3_mf9i_2048 checkpoints/dmc_fast3_mf9/2048.0 --variant fast3
echo R4G-F3MF9-DONE

# ---- 4. DVC / DCVC trained RD points (r4b phase-3 recipe, repaired
# intra). Compressed curriculum: --start-epoch selects the loss stage;
# separate checkpoint dirs chained by --init-from so re-runs resume. ----
FAM_ARGS="-d data/vimeo --lambda 2048 --batch-size 8 --max-frames 3
  --patch-size 128 128 --num-workers 2 --test-batch-size 8
  --log-every 20 --name r4g"
family() {  # $1 = dvc|dcvc
  local m=$1
  log "$m phase A: 4 epochs MSE (stage frame_mse)"
  python -m deepvideocodec_tpu.cli.train -m $m $FAM_ARGS \
    --checkpoint checkpoints/${m}_a/2048.0 --start-epoch 20 -e 24
  log "$m phase B: 4 epochs e2e RD"
  python -m deepvideocodec_tpu.cli.train -m $m $FAM_ARGS \
    --init-from checkpoints/${m}_a/2048.0 \
    --checkpoint checkpoints/${m}_b/2048.0 --start-epoch 44 -e 48
  log "$m phase C: 2 epochs e2e_intra (frozen repaired-intra I-frame)"
  python -m deepvideocodec_tpu.cli.train -m $m $FAM_ARGS \
    --init-from checkpoints/${m}_b/2048.0 \
    --checkpoint checkpoints/${m}_c/2048.0 --start-epoch 50 -e 52 \
    -q 6 --intra-checkpoint $INTRA_NPZ
  python $REPO/scripts/export_weights.py checkpoints/${m}_c/2048.0 \
    $REPO/ckpts/${m}_2048.npz --model $m
  for gop in 8 32; do
    if [ ! -f results/${m}_2048_gop${gop}_f${FRAMES}/q6.json ]; then
      log "eval $m gop=$gop ($FRAMES frames)"
      python -m deepvideocodec_tpu.cli.evaluate -m $m \
        --frames-root data/eval -q 6 --gop $gop --frames $FRAMES \
        --checkpoint checkpoints/${m}_c/2048.0 \
        --intra-checkpoint $INTRA_NPZ \
        --results-dir results/${m}_2048_gop${gop}_f${FRAMES} \
        --cache-dir cache/${m}_2048_gop${gop}_f${FRAMES} --streams 4
    fi
  done
  echo R4G-$(echo $m | tr a-z A-Z)-DONE
}
family dvc
family dcvc

python $REPO/scripts/rd_report.py $WORK
echo ALL-R4G-DONE
