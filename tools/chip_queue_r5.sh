#!/bin/bash
# Round-5 detached TPU chip-job queue (same pattern as tools/chip_queue.sh:
# probe the relay every 4 min, run priority jobs in order, persist every
# artifact under artifacts/r5_chip_queue/ so any later session can harvest).
#
# Priority order (VERDICT r4 "Next round"):
#   A  dispatch_probe (fixed: budget guard + shared scan compile) — closes
#      the input-pipeline overlap question (#2); quick with the warm cache
#   B  lazy_gp_ab — the gp_interval 1-vs-4 twin-quality runs that decide
#      whether the ~713 img/s lazy arm becomes the headline (#1)
#   C  trace_step on today's tree -> artifacts/trace_r5 (fresh WALL basis, #3)
#   D  fp32_lane_ab — interleaved paired re-power of the +2.1% claim (#5)
#   E  bench.py — fresh audit-trail entry + cache re-warm for the driver run
#
# Start detached:  setsid nohup bash tools/chip_queue_r5.sh >/tmp/chip_queue_r5.out 2>&1 &
# Stop BY PID:     kill $(cat /tmp/chip_queue_r5.pid)   (never pkill -f)
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/artifacts/r5_chip_queue"
mkdir -p "$OUT"
echo $$ > /tmp/chip_queue_r5.pid
cd "$REPO"

log() { echo "$(date -u '+%F %T') $*" >> "$OUT/STATUS.txt"; }
log "r5 queue started pid $$"

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
    for j in dispatch_probe lazy_gp_ab trace_r5 fp32_lane_ab bench; do
        [ -f "$OUT/$j.done" ] || return 1
    done
    return 0
}

while :; do
    if probe; then
        log "relay UP"
        run_job dispatch_probe 1800 \
            env PROBE_BUDGET_S=1500 python tools/dispatch_probe.py \
                --batch 64 --dtype bfloat16 --steps 24 --chunk 4
        run_job lazy_gp_ab 6600 \
            env LAZY_AB_BUDGET_S=6000 python tools/lazy_gp_ab.py
        run_job trace_r5 1500 \
            python tools/trace_step.py --vmem-kib 65536 \
                --out "$REPO/artifacts/trace_r5"
        run_job fp32_lane_ab 2700 \
            env FP32AB_BUDGET_S=2400 python tools/fp32_lane_ab.py \
                --rounds 5 --iters 20
        run_job bench 2700 env BENCH_BUDGET_S=2400 python bench.py
        if all_done; then log "ALL JOBS DONE; queue exiting"; exit 0; fi
        log "some jobs failed; re-probing in 4 min"
    else
        log "relay down; sleeping 4 min"
    fi
    sleep 240
done
