#!/bin/bash
# Round-5 follow-up chip queue: waits for the MAIN r5 queue (chip_queue_r5.sh)
# to exit so two clients never contend on the relay mid-measurement, then runs
# the jobs defined AFTER the main queue launched:
#   F  dispatch_probe --arms single,dprefetch — the one-ahead threaded-upload
#      feed path (Trainer device_prefetch knob) vs the async per-batch loop
#      that won round F of the A/B (193.5 img/s)
#
# Start detached:  setsid nohup bash tools/chip_queue_r5b.sh >/tmp/chip_queue_r5b.out 2>&1 &
# Stop BY PID:     kill $(cat /tmp/chip_queue_r5b.pid)
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/artifacts/r5_chip_queue"
mkdir -p "$OUT"
echo $$ > /tmp/chip_queue_r5b.pid
cd "$REPO"

log() { echo "$(date -u '+%F %T') $*" >> "$OUT/STATUS.txt"; }
log "r5b queue started pid $$"

# Wait for the main queue to finish so two clients never contend on the
# relay mid-measurement. Two races handled (review finding r5):
#  * started BEFORE the main queue wrote its pid file -> grace-poll for the
#    file for up to 10 min instead of proceeding immediately;
#  * stale pid file whose PID was recycled by some unrelated long-lived
#    process -> cap the liveness wait at 6 h, then proceed rather than
#    hang forever (the probe loop below still serializes on the relay).
MAIN_PID=""
for _ in $(seq 1 60); do
    MAIN_PID="$(cat /tmp/chip_queue_r5.pid 2>/dev/null || echo '')"
    [ -n "$MAIN_PID" ] && break
    sleep 10
done
WAITED=0
while [ -n "$MAIN_PID" ] && kill -0 "$MAIN_PID" 2>/dev/null \
        && [ "$WAITED" -lt 21600 ]; do
    sleep 120; WAITED=$((WAITED + 120))
done
log "r5b: main queue gone (or wait capped at ${WAITED}s); proceeding"

probe() {
    timeout 45 python -c "import jax; print(len(jax.devices()))" \
        > /dev/null 2>&1
}

run_job() {
    local name="$1" tmo="$2"; shift 2
    [ -f "$OUT/$name.done" ] && return 0
    log "start $name: $*"
    timeout "$tmo" "$@" > "$OUT/$name.log" 2> "$OUT/$name.err"
    local rc=$?
    log "end $name rc=$rc"
    if [ "$rc" -eq 0 ]; then touch "$OUT/$name.done"; return 0; fi
    return 1
}

while :; do
    if probe; then
        log "relay UP (r5b)"
        run_job dprefetch_probe 1500 \
            env PROBE_BUDGET_S=1200 python tools/dispatch_probe.py \
                --batch 64 --dtype bfloat16 --steps 24 \
                --arms single,dprefetch
        if [ -f "$OUT/dprefetch_probe.done" ]; then
            log "r5b ALL DONE; exiting"; exit 0
        fi
        log "r5b job failed; re-probing in 4 min"
    else
        log "relay down (r5b); sleeping 4 min"
    fi
    sleep 240
done
