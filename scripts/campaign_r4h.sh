#!/bin/bash
# Round-4 part H: post-reboot salvage chain. The 2026-08-19 ~21:40 VM
# reset wiped /root/campaign (checkpoints, results, eval corpus) and
# every chain log; all trained npz exports survived in ckpts/. This
# chain re-lands the eval-only remainder of r4g phase 2 against the
# regenerated seed-0 eval corpus (cli/synth_data.py write_eval_sequences
# seeds the eval tree independently of the train clips, so the corpus
# is bit-identical to the wiped one) plus the round-5-queue fast4
# per-stage profile, now that the window is clean.
#
# Phases (per-artifact guarded, re-run safe):
#   0. wait for the cache-warming bench (pid file) to exit
#   1. fast4 per-stage 1080p profile (stage programs warm from bench)
#   2. re-evals vs the repaired intra anchor, highest RD value first:
#      2048 GOP-8 (completes the 3-point GOP-8 dmc_mf5i curve),
#      2048 GOP-32, 512 GOP-32, then fast3 GOP-32.
#
#   nohup bash scripts/campaign_r4h.sh > /root/campaign_r4h.out 2>&1 &
#   echo $! > /tmp/r4h.pid
#
# Markers: R4H-PROFILE-DONE, R4H-REEVAL-<tag>-gop<g>-DONE, ALL-R4H-DONE.
set -euo pipefail
trap 'echo "R4H-FAILED: ${BASH_COMMAND} (line $LINENO)"' ERR

REPO=/root/repo
WORK=/root/campaign
export JAX_COMPILATION_CACHE_DIR=$REPO/.jax_cache
export PYTHONPATH=/root/.axon_site:$REPO
cd "$WORK"

log() { echo "[r4h $(date +%H:%M:%S)] $*"; }

FRAMES=${EVAL_FRAMES:-96}
INTRA_NPZ=$REPO/ckpts/intra_q6_r4d.npz

# ---- 0. serialize behind the warming bench ----
if [ -f /tmp/bench.pid ]; then
  while kill -0 "$(cat /tmp/bench.pid)" 2>/dev/null; do sleep 20; done
fi
log "bench clear; starting r4h"

# ---- 1. fast4 per-stage profile (clean window; trained fast4 npz) ----
if [ ! -f /root/fast4_profile.md ]; then
  log "fast4 per-stage profile"
  PROF_VARIANT=fast4 PROF_NPZ=$REPO/ckpts/dmc_fast4_2048_mf5.npz \
    python $REPO/scripts/profile_stages.py | tee /root/fast4_profile.md
fi
echo R4H-PROFILE-DONE

# ---- 2. repaired-anchor re-evals (r4g phase 2 remainder) ----
reeval1() {  # $1 tag  $2 npz  $3 gop  $4... extra args
  local tag=$1 npz=$2 gop=$3; shift 3
  if [ -f results/${tag}_gop${gop}_f${FRAMES}/q6.json ]; then
    log "reeval $tag gop$gop already done; skipping"
  else
    log "reeval $tag gop=$gop ($FRAMES frames, repaired intra)"
    python -m deepvideocodec_tpu.cli.evaluate -m dmc \
      --frames-root data/eval -q 6 --gop $gop --frames $FRAMES \
      --checkpoint "$npz" --intra-checkpoint $INTRA_NPZ \
      --results-dir results/${tag}_gop${gop}_f${FRAMES} \
      --cache-dir cache/${tag}_gop${gop}_f${FRAMES} --streams 4 "$@"
  fi
  echo R4H-REEVAL-${tag}-gop${gop}-DONE
}
reeval1 dmc_mf5i_2048 $REPO/ckpts/dmc_2048_mf5.npz 8
reeval1 dmc_mf5i_2048 $REPO/ckpts/dmc_2048_mf5.npz 32
reeval1 dmc_mf5i_512  $REPO/ckpts/dmc_512_mf5.npz  32
reeval1 dmc_fast3_mf5i_2048 $REPO/ckpts/dmc_fast3_2048_mf5.npz 32 --variant fast3

python $REPO/scripts/rd_report.py $WORK || echo R4H-REPORT-FAILED
echo ALL-R4H-DONE
