#!/bin/bash
# Round-4 master chain: serialize the remaining TPU work in value order
# on the single chip / single CPU core.
#
#   1. 15-frame corpus gen for r4c, nice'd in the BACKGROUND (pure CPU)
#      while phase 2 owns the TPU.
#   2. r4b phase 1 only (R4B_STOP_AFTER=eval96): 96-frame GOP-8/32
#      protocol evals of the committed mf5 family — pure evals of
#      committed ckpts, zero training risk (VERDICT r3 item 4).
#   3. r4c: mf9/mf15 long-cascade drift fine-tunes — the GOP-32 RD
#      headline (VERDICT r3 item 5).
#   4. r4d: intra-ladder fidelity repair (VERDICT r3 item 2).
#   5. r4b the rest: 8192 inversion fix, DVC/DCVC trained points, mf7
#      (items 4/6) — everything resumable if the round ends first.
#
#   nohup bash scripts/campaign_r4e.sh > /root/campaign_r4e.out 2>&1 &
#   echo $! > /tmp/r4e.pid     # kill $(cat /tmp/r4e.pid) before the
#                              # round-end clean bench
#
# Liveness: scripts/chain_status.sh. Marker: ALL-R4E-DONE.
set -euo pipefail
trap 'echo "R4E-FAILED: ${BASH_COMMAND} (line $LINENO)"' ERR

REPO=/root/repo
WORK=/root/campaign
export JAX_COMPILATION_CACHE_DIR=$REPO/.jax_cache
export PYTHONPATH=/root/.axon_site:$REPO
cd "$WORK"

log() { echo "[r4e $(date +%H:%M:%S)] $*"; }

# ---- 1. background 15-frame corpus (r4c's guard path) ----
if [ ! -f data15/vimeo/sep_trainlist.txt ]; then
  log "generating 15-frame corpus in the background (nice 19)"
  ( nice -n 19 python -m deepvideocodec_tpu.cli.synth_data --out data15.tmp \
      --clips ${CLIPS:-256} --clip-frames 15 --clip-size 192 \
      --images 2 --test-images 1 --eval-seqs 1 --eval-frames 2 \
      && rm -rf data15 && mv data15.tmp data15 \
      && log "15-frame corpus ready" ) &
  GEN_PID=$!
else
  GEN_PID=
fi

# ---- 2. protocol evals of the committed family ----
R4B_STOP_AFTER=eval96 bash $REPO/scripts/campaign_r4b.sh

# ---- 3. long-cascade drift fine-tunes ----
[ -n "$GEN_PID" ] && { log "waiting for corpus gen"; wait $GEN_PID; }
bash $REPO/scripts/campaign_r4c.sh

# ---- 4. intra ladder fidelity repair ----
bash $REPO/scripts/campaign_r4d.sh "$WORK"

# ---- 5. the rest of r4b (evals skip via guards) ----
bash $REPO/scripts/campaign_r4b.sh

echo ALL-R4E-DONE
