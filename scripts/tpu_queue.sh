#!/usr/bin/env bash
# Sequential TPU job queue.  One real chip -> strictly one training process
# at a time (round-2 postmortem: two concurrent runs starved each other and
# produced zero epochs).  Jobs are files logs/queue/NN_name.job containing a
# bash command; they run in lexicographic order; new jobs dropped into the
# directory are picked up after the current one finishes.
#
# Artifacts per job: logs/queue/NN_name.out (stdout+stderr, faulthandler
# tracebacks included), logs/queue/NN_name.rc (exit code + timestamps).
set -u
QDIR="/root/repo/logs/queue"
mkdir -p "$QDIR"
echo "$$" > "$QDIR/daemon.pid"
IDLE=0
while true; do
  job=$(ls "$QDIR"/*.job 2>/dev/null | sort | head -n1 || true)
  if [ -z "${job:-}" ]; then
    IDLE=$((IDLE + 1))
    # exit after ~30 min with an empty queue so we never outlive the round
    if [ "$IDLE" -ge 180 ]; then echo "queue idle timeout, exiting"; break; fi
    sleep 10
    continue
  fi
  IDLE=0
  name=$(basename "$job" .job)
  mv "$job" "$QDIR/$name.running"
  echo "=== $(date -u +%FT%TZ) start $name ===" >> "$QDIR/$name.out"
  bash "$QDIR/$name.running" >> "$QDIR/$name.out" 2>&1
  rc=$?
  echo "rc=$rc end=$(date -u +%FT%TZ)" > "$QDIR/$name.rc"
  echo "=== $(date -u +%FT%TZ) end $name rc=$rc ===" >> "$QDIR/$name.out"
  mv "$QDIR/$name.running" "$QDIR/$name.done"
done
