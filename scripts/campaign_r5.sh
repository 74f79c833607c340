#!/bin/bash
# Round-5 opening chain. Self-bootstrapping against a wiped VM (two
# resets happened in round 4: only /root/repo + committed ckpts/*.npz
# survive). Every phase is per-artifact guarded; re-runs are cheap.
#
# Value-ordered phases:
#   0. corpora (data/, data15/ — seed-0, bit-identical to the wiped
#      trees) + rebuild checkpoints/intra_q6 from the committed
#      repaired-anchor npz (campaign3.sh hardcodes that path).
#   1. lambda=16384 mf5 fine-tune from the r4g 8192 point — extends the
#      DMC curve top past 28 dB so it overlaps the repaired-intra band
#      (q4 starts at 27.99) and rd_report's BD-rate vs all-intra is
#      computable again (docs/RD.md "BD-rate remains n/a by 0.27 dB").
#   2. r4g phase-2 re-eval leftovers not covered by campaign_r4h.sh:
#      mf9 both GOPs, fast2 both GOPs, fast3 GOP-8 (repaired anchor,
#      "i"-suffix family tags so rd_report groups them per protocol).
#   3. fast4 mf9 long-cascade (--scan-frames): the shipped bench
#      default's GOP-32 drift fix; then fast3 mf9 (r4g phase 3).
#   4. DVC / DCVC trained RD points (r4g phase 4 recipe).
#   5. rd_report.
#
#   nohup bash scripts/campaign_r5.sh > /root/campaign_r5.out 2>&1 &
#   echo $! > /tmp/r5.pid
#
# Markers: R5-DATA-DONE, R5-16384-DONE, R5-REEVAL-DONE, R5-F4MF9-DONE,
# R5-F3MF9-DONE, R5-DVC-DONE, R5-DCVC-DONE, ALL-R5-DONE.
set -euo pipefail
trap 'echo "R5-FAILED: ${BASH_COMMAND} (line $LINENO)"' ERR

REPO=/root/repo
WORK=/root/campaign
mkdir -p "$WORK"
export JAX_COMPILATION_CACHE_DIR=$REPO/.jax_cache
export PYTHONPATH=/root/.axon_site:$REPO
cd "$WORK"

log() { echo "[r5 $(date +%H:%M:%S)] $*"; }

FRAMES=${EVAL_FRAMES:-96}
INTRA_NPZ=$REPO/ckpts/intra_q6_r4d.npz
NSEQ=${EVAL_SEQS_N:-4}   # eval corpus size — completeness guards

# done() — completeness guard (not existence: evaluate appends one
# record per sequence, so a killed run leaves a partial q6.json that an
# existence guard would skip forever). Deletes partials for clean re-run.
done_eval() { JAX_PLATFORMS=cpu python $REPO/scripts/check_results.py \
  "$1" --expect "$NSEQ" --clean; }

# ---- 0a. gate on a REAL jax client probe (port-open is not proof of
# life: the relay died once in a zombie state where 8083 accepted TCP
# but clients hung in backend init) ----
until timeout 120 python -c \
    "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones(()))))" \
    >/dev/null 2>&1; do
  log "relay not answering a jax client; sleeping 120s"
  sleep 120
done
log "relay alive; bootstrapping"

# ---- 0b. corpora (seed-0 regen is bit-identical to the wiped trees) ----
# The CPU chain (campaign_r5_cpu.sh) may be mid-generation when the
# relay wakes this chain up — wait for its bootstrap lock, don't race.
while [ -f .bootstrap.lock ]; do
  log "CPU chain holds .bootstrap.lock (corpora in progress); waiting"
  sleep 60
done
if [ ! -f data/vimeo/sep_trainlist.txt ]; then
  log "generating base synthetic corpus (train clips + images + eval)"
  JAX_PLATFORMS=cpu python -m deepvideocodec_tpu.cli.synth_data \
    --out data --clips ${CLIPS:-512} --clip-size 192 --images 400 \
    --image-size 256 --eval-seqs 4 --eval-frames 96 --eval-size 256 256
fi
if [ ! -f data15/vimeo/sep_trainlist.txt ]; then
  log "generating 15-frame long-cascade training clips"
  JAX_PLATFORMS=cpu python -m deepvideocodec_tpu.cli.synth_data \
    --out data15 --clips 256 --clip-frames 15 --clip-size 192 \
    --images 2 --test-images 1 --eval-seqs 1 --eval-frames 2
fi
# campaign3.sh / train chains hardcode checkpoints/intra_q6 — rebuild
# it from the committed REPAIRED (r4d) anchor export.
if [ ! -d checkpoints/intra_q6/params_export ]; then
  log "rebuilding checkpoints/intra_q6 from $INTRA_NPZ"
  python $REPO/scripts/npz_to_export.py $INTRA_NPZ checkpoints/intra_q6 \
    --kind intra -q 6
fi
echo R5-DATA-DONE

# ---- 1. lambda=16384: DMC curve top end into the anchor band ----
# Guard train+eval+export together on BOTH evals being complete (the
# campaign3 train is internally guarded, but its evals/export were not —
# ADVICE r4 low: the old guard closed before the invocation, a no-op).
if done_eval results/dmc_mf5i_16384_gop8_f${FRAMES}/q6.json && \
   done_eval results/dmc_mf5i_16384_gop32_f${FRAMES}/q6.json && \
   [ -f $REPO/ckpts/dmc_16384_mf5.npz ]; then
  log "lambda=16384 point already landed; skipping"
else
  log "lambda=16384 mf5 fine-tune (2 epochs half-LR from 8192b)"
  CAMPAIGN3_TPU=1 FT_TAG=dmc_mf5i FT_INIT=$REPO/ckpts/dmc_8192_mf5b.npz \
    FT_START=50 FT_END=52 FT_EXTRA="--learning-rate 5e-5" \
    EVAL_FRAMES=$FRAMES EVAL_STREAMS=4 \
    bash $REPO/scripts/campaign3.sh $WORK 16384
  python $REPO/scripts/export_weights.py \
    checkpoints/dmc_mf5i/16384.0 $REPO/ckpts/dmc_16384_mf5.npz --model dmc
fi
echo R5-16384-DONE

# ---- 2. repaired-anchor re-eval leftovers (r4g phase 2 minus what
# campaign_r4h.sh already landed; same per-artifact guards) ----
reeval() {  # $1 tag  $2 npz  $3 gop  $4... extra args
  local tag=$1 npz=$2 gop=$3; shift 3
  if done_eval results/${tag}_gop${gop}_f${FRAMES}/q6.json; then
    log "reeval $tag gop$gop already done; skipping"
  else
    log "reeval $tag gop=$gop ($FRAMES frames, repaired intra)"
    python -m deepvideocodec_tpu.cli.evaluate -m dmc \
      --frames-root data/eval -q 6 --gop $gop --frames $FRAMES \
      --checkpoint "$npz" --intra-checkpoint $INTRA_NPZ \
      --results-dir results/${tag}_gop${gop}_f${FRAMES} \
      --cache-dir cache/${tag}_gop${gop}_f${FRAMES} --streams 4 "$@"
  fi
}
reeval dmc_mf5i_2048  $REPO/ckpts/dmc_2048_mf5.npz 8
reeval dmc_mf5i_2048  $REPO/ckpts/dmc_2048_mf5.npz 32
reeval dmc_mf5i_512   $REPO/ckpts/dmc_512_mf5.npz  32
reeval dmc_mf9i_2048  $REPO/ckpts/dmc_2048_mf9.npz 8
reeval dmc_mf9i_2048  $REPO/ckpts/dmc_2048_mf9.npz 32
reeval dmc_fast2_mf5i_2048 $REPO/ckpts/dmc_fast2_2048_mf5.npz 8  --variant fast2
reeval dmc_fast2_mf5i_2048 $REPO/ckpts/dmc_fast2_2048_mf5.npz 32 --variant fast2
reeval dmc_fast3_mf5i_2048 $REPO/ckpts/dmc_fast3_2048_mf5.npz 8  --variant fast3
reeval dmc_fast3_mf5i_2048 $REPO/ckpts/dmc_fast3_2048_mf5.npz 32 --variant fast3
echo R5-REEVAL-DONE

# ---- 3. long-cascade drift fixes for the speed ladder ----
f_mf9() {  # $1 variant  $2 init-npz
  local v=$1 init=$2
  if [ ! -d checkpoints/dmc_${v}_mf9/2048.0/params_export ]; then
    log "$v mf9 fine-tune (8-P-frame cascade, scan-frames)"
    python -m deepvideocodec_tpu.cli.train -m dmc -d data15/vimeo \
      --variant $v --lambda 2048 --batch-size 4 --max-frames 9 \
      --scan-frames --patch-size 128 128 --num-workers 2 \
      --test-batch-size 4 --log-every 20 --name r5 -q 6 \
      --intra-checkpoint checkpoints/intra_q6 \
      --learning-rate 5e-5 --start-epoch 50 -e 54 \
      --init-from $init --checkpoint checkpoints/dmc_${v}_mf9/2048.0
  fi
  python $REPO/scripts/export_weights.py checkpoints/dmc_${v}_mf9/2048.0 \
    $REPO/ckpts/dmc_${v}_2048_mf9.npz --model dmc --variant $v
  reeval dmc_${v}_mf9i_2048 checkpoints/dmc_${v}_mf9/2048.0 8  --variant $v
  reeval dmc_${v}_mf9i_2048 checkpoints/dmc_${v}_mf9/2048.0 32 --variant $v
}
f_mf9 fast4 $REPO/ckpts/dmc_fast4_2048_mf5.npz
echo R5-F4MF9-DONE
f_mf9 fast3 $REPO/ckpts/dmc_fast3_2048_mf5.npz
echo R5-F3MF9-DONE

# ---- 4. DVC / DCVC trained RD points (r4g phase-4 recipe) ----
# FAM_STEPS must stay identical to campaign_r5_cpu.sh's (the CPU chain
# may have trained or part-trained these dirs; resume math divides by
# the capped epoch length).
FAM_STEPS=${FAM_STEPS:-24}
FAM_ARGS="-d data/vimeo --lambda 2048 --batch-size 8 --max-frames 3
  --patch-size 128 128 --num-workers 2 --test-batch-size 8
  --steps-per-epoch $FAM_STEPS --log-every 8 --name r5"
family() {  # $1 = dvc|dcvc
  local m=$1
  # campaign_r5_cpu.sh trains these same dirs on XLA:CPU while the
  # relay is down; wait for its lock rather than double-training (its
  # phases auto-resume, so whichever chain gets there first wins).
  while [ -f .families_cpu.lock ]; do
    log "CPU chain training dvc/dcvc (.families_cpu.lock); waiting 10 min"
    sleep 600
  done
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
  for gop in 8 32; do
    if ! done_eval results/${m}_2048_gop${gop}_f${FRAMES}/q6.json; then
      log "eval $m gop=$gop ($FRAMES frames)"
      python -m deepvideocodec_tpu.cli.evaluate -m $m \
        --frames-root data/eval -q 6 --gop $gop --frames $FRAMES \
        --checkpoint checkpoints/${m}_c/2048.0 \
        --intra-checkpoint $INTRA_NPZ \
        --results-dir results/${m}_2048_gop${gop}_f${FRAMES} \
        --cache-dir cache/${m}_2048_gop${gop}_f${FRAMES} --streams 4
    fi
  done
  echo R5-$(echo $m | tr a-z A-Z)-DONE
}
family dvc
family dcvc

python $REPO/scripts/rd_report.py $WORK || echo R5-REPORT-FAILED
echo ALL-R5-DONE
