#!/bin/bash
# Kill a process (by pid file) if free space on / drops below a floor.
# Usage: tools/disk_guard.sh <pidfile> [floor_gb]
# A big NND probe that outruns its slice model fills the device in under a
# minute (round-17 ENOSPC post-mortem); this is the last-resort backstop so
# a runaway never takes the box's tmpdir down with it.
PIDFILE="$1"; FLOOR_GB="${2:-6}"
while sleep 20; do
  PID=$(cat "$PIDFILE" 2>/dev/null) || exit 0
  kill -0 "$PID" 2>/dev/null || exit 0
  FREE_GB=$(df -BG --output=avail / | tail -1 | tr -dc '0-9')
  if [ "$FREE_GB" -lt "$FLOOR_GB" ]; then
    echo "[disk-guard] free=${FREE_GB}G < ${FLOOR_GB}G — killing $PID" >&2
    kill -9 "$PID"
    exit 1
  fi
done
