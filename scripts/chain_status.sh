#!/bin/bash
# Campaign-chain liveness check (round-3 verdict item 7: the r3b chain
# died silently mid-round and nobody noticed for hours).
#
#   bash scripts/chain_status.sh [logfile ...]
#
# With no args, scans the default chain-log locations. For each log it
# reports: RUNNING (a python/bash process still has the log open),
# DONE (terminal marker present), or DEAD (no process, no terminal
# marker) — plus the last marker and last line so a stall is visible
# in one command. Exit status 1 if any chain is DEAD.
set -u

LOGS=("$@")
if [ ${#LOGS[@]} -eq 0 ]; then
  for f in /root/campaign*.out /tmp/campaign*.out /root/repo/campaign*.out; do
    [ -f "$f" ] && LOGS+=("$f")
  done
fi
if [ ${#LOGS[@]} -eq 0 ]; then
  echo "no chain logs found"
  exit 0
fi

rc=0
for log in "${LOGS[@]}"; do
  last_marker=$(grep -Eo '(ALL-[A-Z0-9-]*DONE|[A-Z0-9]+-[A-Z0-9-]*(DONE|FAILED))' "$log" | tail -1)
  last_line=$(tail -1 "$log" | cut -c1-120)
  # a process is "attached" if some live pid has the log as an open fd
  attached=""
  for fd in /proc/[0-9]*/fd/*; do
    [ "$(readlink "$fd" 2>/dev/null)" = "$log" ] && attached=yes && break
  done
  if [ -n "$attached" ]; then
    state=RUNNING
  elif [[ "${last_marker:-}" == ALL-* ]]; then
    state=DONE
  else
    state=DEAD
    rc=1
  fi
  printf '%-8s %s\n' "$state" "$log"
  printf '         last marker: %s\n' "${last_marker:-<none>}"
  printf '         last line:   %s\n' "$last_line"
done
exit $rc
