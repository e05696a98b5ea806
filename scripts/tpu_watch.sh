#!/bin/bash
# Tunnel-recovery watcher: probe the axon relay every PERIOD seconds
# (cheap TCP first, then a real tiny-program probe) and, on recovery, run
# the round-3 measurement queue (scripts/run_tpu_queue.sh) exactly once.
# Log: /tmp/tpu_watch.log.  PID: /tmp/tpu_watch.pid (kill by pid, never by
# pattern).  Usage: bash scripts/tpu_watch.sh [period_s] [queue_start_idx]
set -u
cd "$(dirname "$0")/.."
PERIOD=${1:-300}
QSTART=${2:-0}
echo $$ > /tmp/tpu_watch.pid
log() { echo "[$(date -u +%FT%TZ)] $*" >> /tmp/tpu_watch.log; }

log "watcher start (period=${PERIOD}s, queue start index=$QSTART)"
while true; do
  if python scripts/tpu_probe.py --tcp-only >> /tmp/tpu_watch.log 2>&1; then
    log "relay ports open — full probe"
    if python scripts/tpu_probe.py --deadline 180 >> /tmp/tpu_watch.log 2>&1; then
      log "tunnel healthy — running measurement queue"
      bash scripts/run_tpu_queue.sh "$QSTART" >> /tmp/tpu_watch.log 2>&1
      log "queue finished"
      break
    fi
    log "ports open but tiny program failed; backing off"
  fi
  sleep "$PERIOD"
done
rm -f /tmp/tpu_watch.pid
log "watcher exit"
