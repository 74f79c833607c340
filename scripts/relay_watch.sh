#!/bin/bash
# Poll the axon TPU relay; the moment it answers, run the trained-weights
# TPU bench queue (docs/NEXT.md item 1) and drop the results where the
# round can pick them up. Detach with:
#   nohup bash scripts/relay_watch.sh > /root/campaign/relay_watch.out 2>&1 &
set -u
cd /root/repo
while true; do
  if timeout 3 bash -c 'echo > /dev/tcp/127.0.0.1/8083' 2>/dev/null; then
    echo "[relay_watch $(date +%T)] RELAY UP — running trained bench queue"
    touch /tmp/RELAY_UP
    export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
    timeout 3600 python bench.py > /root/campaign/bench_r3_fast.json 2>/root/campaign/bench_r3_fast.log
    echo "[relay_watch] fast: $(cat /root/campaign/bench_r3_fast.json)"
    BENCH_VARIANT=base BENCH_NPZ=ckpts/dmc_2048.npz timeout 3600 python bench.py \
      > /root/campaign/bench_r3_base2048.json 2>/root/campaign/bench_r3_base2048.log
    echo "[relay_watch] base-2048: $(cat /root/campaign/bench_r3_base2048.json)"
    echo "[relay_watch] queue done"
    exit 0
  fi
  sleep 60
done
