#!/bin/bash
# Wait for a calm co-tenant window (steal + runq low), then exec the given
# command.  Usage: scripts_dev_calm_run.sh <max_steal_ticks_per_15s> <max_wait_s> cmd...
MAX_STEAL=${1:-100}; MAX_WAIT=${2:-3600}; shift 2
waited=0
while true; do
  s1=$(awk '/^cpu /{print $9}' /proc/stat)
  sleep 15
  s2=$(awk '/^cpu /{print $9}' /proc/stat)
  d=$((s2-s1))
  load=$(awk '{print int($1)}' /proc/loadavg)
  echo "[calm_run] steal/15s=$d load=$load waited=${waited}s" >&2
  if [ "$d" -le "$MAX_STEAL" ] && [ "$load" -le 2 ]; then
    echo "[calm_run] window open -> $*" >&2
    exec "$@"
  fi
  waited=$((waited+15))
  if [ "$waited" -ge "$MAX_WAIT" ]; then
    echo "[calm_run] gave up after ${waited}s -> running anyway: $*" >&2
    exec "$@"
  fi
  sleep 15; waited=$((waited+15))
done
