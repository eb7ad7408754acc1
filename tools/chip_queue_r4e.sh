#!/bin/bash
# Session-5 chip-job queue (same pattern as tools/chip_queue.sh): the relay
# went down mid-session (2026-08-20, during the dispatch_probe re-run), so
# the remaining chip jobs wait behind a probe loop and persist artifacts
# into artifacts/r4_chip_queue/ for a later session to harvest.
#
# Jobs:
#   F  tools/dispatch_probe.py with the double-buffered scanned arm
#      (scan4+dbuf) — completes the steps_per_dispatch A/B (PERF.md
#      round-4 host-loop section; single/scan4 arms already measured:
#      214.5 vs 151.8 img/s)
#   G  train_entry chip drive of --steps-per-dispatch 2 (2 epochs, 32px
#      synthetic) — the real-CLI feature drive on hardware
#
# Start detached:  setsid nohup bash tools/chip_queue_r4e.sh >/tmp/chip_queue_r4e.out 2>&1 &
# Stop BY PID:     kill $(cat /tmp/chip_queue_r4e.pid)   (never pkill -f)
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/artifacts/r4_chip_queue"
mkdir -p "$OUT"
echo $$ > /tmp/chip_queue_r4e.pid
cd "$REPO"

log() { echo "$(date -u '+%F %T') $*" >> "$OUT/STATUS.txt"; }
log "r4e queue started pid $$"

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

all_done() {
    for j in dispatch_probe_dbuf drive_spd2; do
        [ -f "$OUT/$j.done" ] || return 1
    done
    return 0
}

while ! all_done; do
    if probe; then
        log "relay up"
        run_job dispatch_probe_dbuf 1800 \
            python tools/dispatch_probe.py --batch 64 --dtype bfloat16 \
            --steps 24 --chunk 4
        rm -rf /tmp/r4e_drive
        [ -d /tmp/vcub5 ] || python -c "
from gan_codes_tpu.data.synthetic import make_synthetic_cub
make_synthetic_cub('/tmp/vcub5', n_train=8, n_test=4, image_size=48)"
        run_job drive_spd2 1800 \
            python -m gan_codes_tpu.train_entry --data /tmp/vcub5 \
            --image-size 32 --batch-size 4 --epochs 2 \
            --steps-per-dispatch 2 --images /tmp/r4e_drive/images \
            --weights /tmp/r4e_drive/weights
    else
        log "relay down; sleeping 240s"
    fi
    all_done || sleep 240
done
log "r4e queue complete"
