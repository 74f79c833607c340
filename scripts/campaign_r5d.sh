#!/bin/bash
# Round-5 part D: make the headline BD-rate computable on a WIDE overlap.
#
# After the 16384 point landed at GOP-8 0.4790/27.94, the DMC curve top
# still misses the repaired anchor bottom (q4 = 0.5542/27.99) by 0.05 dB
# — BD-rate vs all-intra stays n/a. Two-sided fix, both cheap on TPU:
#
#   1. lambda=32768 mf5 fine-tune from the 16384 export (same topology:
#      the train program is already in the XLA cache, zero compile) +
#      96f evals + export — pushes the DMC curve top past 28 dB.
#   2. intra q3 (n=96,m=128, lambda=436) from scratch, 18 epochs, +
#      GOP-1 96f eval + export — extends the ANCHOR band downward
#      (~26 dB) so the overlap is wide instead of razor-thin.
#   3. intra q2 (lambda=228) warm-started from q3 (same arch), 12
#      epochs + eval + export — reaches toward the GOP-32 curve band
#      (~24 dB) where BD-rate was never computable vs the repaired
#      anchor.
#   4. rd_report.
#
# Gated on R5C-PROBES-DONE (keeps the link quiet for the fast5/fast6
# speed probes); runs CONCURRENTLY with r5c's fast5 fine-tune after
# that — acceptable: RD numbers are timing-independent, and the 32768
# program is cached while fast5's is compiling.
#
#   nohup bash scripts/campaign_r5d.sh > /root/campaign_r5d.out 2>&1 &
#   echo $! > /tmp/r5d.pid
#
# Markers: R5D-32768-DONE, R5D-Q3-DONE, R5D-Q2-DONE, ALL-R5D-DONE.
set -euo pipefail
trap 'echo "R5D-FAILED: ${BASH_COMMAND} (line $LINENO)"' ERR

REPO=/root/repo
WORK=/root/campaign
mkdir -p "$WORK"
export JAX_COMPILATION_CACHE_DIR=$REPO/.jax_cache
export PYTHONPATH=/root/.axon_site:$REPO
cd "$WORK"

log() { echo "[r5d $(date +%H:%M:%S)] $*"; }

FRAMES=${EVAL_FRAMES:-96}
NSEQ=${EVAL_SEQS_N:-4}
done_eval() { JAX_PLATFORMS=cpu python $REPO/scripts/check_results.py \
  "$1" --expect "$NSEQ" --clean; }

# ---- 0. wait for the speed probes (timing-sensitive) to finish ----
while ! grep -q "R5C-PROBES-DONE" /root/campaign_r5c.out 2>/dev/null; do
  # if the r5c chain is dead AND the probes never landed, don't wait
  # forever — the RD work is higher value than probe cleanliness
  if [ -f /tmp/r5c.pid ] && ! kill -0 "$(cat /tmp/r5c.pid)" 2>/dev/null; then
    log "r5c chain dead; proceeding without the probe gate"
    break
  fi
  sleep 60
done
log "starting r5d"

# ---- 1. lambda=32768 ----
if done_eval results/dmc_mf5i_32768_gop8_f${FRAMES}/q6.json && \
   done_eval results/dmc_mf5i_32768_gop32_f${FRAMES}/q6.json; then
  log "32768 point already landed; skipping"
else
  log "lambda=32768 mf5 fine-tune (2 epochs half-LR from 16384)"
  CAMPAIGN3_TPU=1 FT_TAG=dmc_mf5i FT_INIT=$REPO/ckpts/dmc_16384_mf5.npz \
    FT_START=50 FT_END=52 FT_EXTRA="--learning-rate 5e-5" \
    EVAL_FRAMES=$FRAMES EVAL_STREAMS=4 \
    bash $REPO/scripts/campaign3.sh $WORK 32768
fi
if [ ! -f $REPO/ckpts/dmc_32768_mf5.npz ]; then
  python $REPO/scripts/export_weights.py \
    checkpoints/dmc_mf5i/32768.0 $REPO/ckpts/dmc_32768_mf5.npz --model dmc
fi
echo R5D-32768-DONE

# ---- 2/3. intra q3 from scratch, then q2 warm-started from it ----
intra_point() {  # $1 q  $2 epochs  $3 init-npz-or-empty
  local q=$1 epochs=$2 init=${3:-}
  if [ ! -d checkpoints/intra_q$q/params_export ]; then
    local init_args=""
    [ -n "$init" ] && init_args="--init-from $init"
    log "training intra q$q ($epochs epochs${init:+, warm from $(basename $init)})"
    python -m deepvideocodec_tpu.cli.train_intra -d data/images -q $q \
      --batch-size 8 -e $epochs --num-workers 2 --name r5 $init_args \
      --checkpoint checkpoints/intra_q$q
  fi
  if [ ! -f $REPO/ckpts/intra_q$q.npz ]; then
    python $REPO/scripts/export_weights.py checkpoints/intra_q$q \
      $REPO/ckpts/intra_q$q.npz --model intra --quality $q
  fi
  if done_eval results/intra_r5/q$q.json; then
    log "intra q$q eval already complete; skipping"
  else
    log "evaluating intra q$q (GOP 1, $FRAMES frames)"
    python -m deepvideocodec_tpu.cli.evaluate -m intra --gop 1 \
      --frames-root data/eval -q $q \
      --intra-checkpoint 'checkpoints/intra_q{q}' \
      --results-dir results/intra_r5 --cache-dir cache/intra_r5 \
      --streams 4 --frames $FRAMES
  fi
}
intra_point 3 18
echo R5D-Q3-DONE
intra_point 2 12 $REPO/ckpts/intra_q3.npz
echo R5D-Q2-DONE

python $REPO/scripts/rd_report.py $WORK || echo R5D-REPORT-FAILED
echo ALL-R5D-DONE
