#!/bin/bash
# Kill a process and all of its descendants by walking /proc — no pattern
# matching (pkill -f can match the caller's own command line). Usage:
#   bash scripts/kill_tree.sh <pid> [signal]
set -u
sig=${2:-TERM}
children() {
  local pid=$1 c
  for c in $(cat /proc/"$pid"/task/*/children 2>/dev/null); do
    children "$c"
    echo "$c"
  done
}
root=$1
[ -d /proc/"$root" ] || { echo "pid $root not running"; exit 0; }
for p in $(children "$root") "$root"; do
  kill -"$sig" "$p" 2>/dev/null && echo "killed $p"
done
