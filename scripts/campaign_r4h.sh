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
#   0. gate on relay health with a REAL jax client probe (2026-08-19:
#      the relay died in a zombie state where port 8083 accepts TCP but
#      every client hangs in backend init — a /dev/tcp check passes)
#   1. re-evals vs the repaired intra anchor, highest RD value first:
#      2048 GOP-8 (completes the 3-point GOP-8 dmc_mf5i curve),
#      2048 GOP-32, 512 GOP-32, then fast3 GOP-32.
#   2. fast4 per-stage 1080p profile (stage programs warm from bench;
#      non-fatal — its RTT guard aborts on a degraded link)
#
#   nohup bash scripts/campaign_r4h.sh > /root/campaign_r4h.out 2>&1 &
#   echo $! > /tmp/r4h.pid
#
# Markers: R4H-REEVAL-<tag>-gop<g>-DONE, R4H-PROFILE-DONE, ALL-R4H-DONE.
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

# ---- 0. serialize behind the warming bench, then gate on a REAL
# client probe: a TCP connect to 8083 is not proof of life ----
if [ -f /tmp/bench.pid ]; then
  while kill -0 "$(cat /tmp/bench.pid)" 2>/dev/null; do sleep 20; done
fi
until timeout 120 python -c \
    "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones(()))))" \
    >/dev/null 2>&1; do
  log "relay not answering a jax client; sleeping 120s"
  sleep 120
done
log "relay alive (client probe ok); starting r4h"

# ---- 1. repaired-anchor re-evals (r4g phase 2 remainder) ----
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

# ---- 2. fast4 per-stage profile (non-fatal: its RTT guard aborts on
# a degraded link, and a degraded link often precedes relay death) ----
if [ ! -f /root/fast4_profile.md ]; then
  log "fast4 per-stage profile"
  PROF_VARIANT=fast4 PROF_NPZ=$REPO/ckpts/dmc_fast4_2048_mf5.npz \
    python $REPO/scripts/profile_stages.py > /root/fast4_profile.md 2>&1 \
    && echo R4H-PROFILE-DONE \
    || { echo "R4H-PROFILE-ABORTED: $(tail -n 1 /root/fast4_profile.md)";
         rm -f /root/fast4_profile.md; }
fi
echo ALL-R4H-DONE
