#!/bin/bash
# Round-4 TPU chain, part C: long-cascade drift fine-tunes.
#
# The 96-frame GOP-32 protocol evals show drift far beyond the mf5
# training cascade is the binding RD constraint (fast3-mf5: 24.21 dB at
# GOP 8 vs 16.89 at GOP 32). The 7-frame training clips cap
# --max-frames at 7; this chain generates a 15-frame synthetic corpus
# (same generator/seed family, --clip-frames 15) and fine-tunes the
# base-2048 mf5 point with an 8-P-frame cascade (mf9), then a 14-P-frame
# cascade (mf15) chained from it, evaluating each at GOP 8/32 x 96
# frames. Reference anchor for the knob: --max-frames
# (/root/reference/dmc/train.py:485, train.sh:9).
#
#   nohup bash scripts/campaign_r4c.sh > /root/campaign_r4c.out 2>&1 &
#
# Markers: R4C-DATA-DONE, R4C-MF9-DONE, R4C-MF15-DONE, ALL-R4C-DONE.
set -euo pipefail
trap 'echo "R4C-FAILED: ${BASH_COMMAND} (line $LINENO)"' ERR

REPO=/root/repo
WORK=/root/campaign
export JAX_COMPILATION_CACHE_DIR=$REPO/.jax_cache
export PYTHONPATH=/root/.axon_site:$REPO
cd "$WORK"

log() { echo "[r4c $(date +%H:%M:%S)] $*"; }

FRAMES=${EVAL_FRAMES:-96}

# ---- 15-frame training corpus (image/eval trees kept minimal: the
# intra corpus and eval sequences already exist under data/) ----
if [ ! -f data15/vimeo/sep_trainlist.txt ]; then
  log "generating 15-frame synthetic training clips"
  python -m deepvideocodec_tpu.cli.synth_data --out data15 \
    --clips ${CLIPS:-256} --clip-frames 15 --clip-size 192 \
    --images 2 --test-images 1 --eval-seqs 1 --eval-frames 2
fi
echo R4C-DATA-DONE

ft_long() {  # $1 = max-frames, $2 = init (npz or ckpt dir), $3 = epochs-end
  local mf=$1 init=$2 end=$3
  python -m deepvideocodec_tpu.cli.train -m dmc -d data15/vimeo \
    --lambda 2048 --batch-size 4 --max-frames $mf \
    --patch-size 128 128 --num-workers 2 --test-batch-size 4 \
    --log-every 20 --name r4c -q 6 \
    --intra-checkpoint checkpoints/intra_q6 \
    --learning-rate 5e-5 --start-epoch 50 -e $end \
    --init-from "$init" --checkpoint checkpoints/dmc_mf$mf/2048.0
  python $REPO/scripts/export_weights.py checkpoints/dmc_mf$mf/2048.0 \
    $REPO/ckpts/dmc_2048_mf$mf.npz --model dmc
}

eval_long() {  # $1 = tag (family_lambda), $2 = ckpt dir
  for gop in 8 32; do
    if [ ! -f results/$1_gop${gop}_f$FRAMES/q6.json ]; then
      log "eval $1 gop=$gop ($FRAMES frames)"
      python -m deepvideocodec_tpu.cli.evaluate -m dmc \
        --frames-root data/eval -q 6 --gop $gop --frames $FRAMES \
        --checkpoint "$2" --intra-checkpoint $REPO/ckpts/intra_q6.npz \
        --results-dir results/$1_gop${gop}_f$FRAMES \
        --cache-dir cache/$1_gop${gop}_f$FRAMES --streams 4
    fi
  done
}

# ---- mf9: 4 epochs at half LR from the mf5-2048 point ----
log "mf9 fine-tune (8-P-frame cascade)"
ft_long 9 $REPO/ckpts/dmc_2048_mf5.npz 54
eval_long dmc_mf9_2048 checkpoints/dmc_mf9/2048.0
echo R4C-MF9-DONE

# ---- intra-ladder fidelity repair first: cheaper + more certain than
# the mf15 trace/compile (campaign_r4e.sh's own r4d call no-ops after
# this via the train-resume and per-q eval guards) ----
bash $REPO/scripts/campaign_r4d.sh "$WORK"

# ---- mf15: 2 epochs chained from the finished mf9 point ----
log "mf15 fine-tune (14-P-frame cascade, chained from mf9)"
ft_long 15 checkpoints/dmc_mf9/2048.0 52
eval_long dmc_mf15_2048 checkpoints/dmc_mf15/2048.0
echo R4C-MF15-DONE

python $REPO/scripts/rd_report.py $WORK
echo ALL-R4C-DONE
