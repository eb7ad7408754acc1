#!/bin/bash
# Detached TPU chip-job queue (ROADMAP round-5 bootstrap).
#
# The TPU relay was down for all of round 4 (28h+ outage). This queue probes
# the relay every 4 minutes and, the moment it answers, runs the priority
# jobs in order, persisting every artifact into artifacts/r4_chip_queue/
# (STATUS.txt first) so a later session can harvest results even if this
# process dies. Jobs are idempotent: a .done marker skips completed ones.
#
# Priority order (ROADMAP):
#   A  trimmed lane/imgpad A/B at bf16-bs128 (pre-warms bench's compile
#      cache: its arms include bench.py's three bf16 headline candidates)
#   B  bench.py (the driver-format headline JSON)
#   C  fp32-bs24 A/B (the reference operating point)
#   D  --image-pad 16 device trace (on-device width verification)
#   E  remaining lane arms (pad64/pad128 unfavorable roofline points)
#
# Start detached:  setsid nohup bash tools/chip_queue.sh >/tmp/chip_queue.out 2>&1 &
# Stop BY PID:     kill $(cat /tmp/chip_queue.pid)   (never pkill -f)
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/artifacts/r4_chip_queue"
mkdir -p "$OUT"
echo $$ > /tmp/chip_queue.pid
cd "$REPO"

log() { echo "$(date -u '+%F %T') $*" >> "$OUT/STATUS.txt"; }
log "queue started pid $$"

probe() {
    # Subprocess probe with a hard kill (bench.py:113-134 rationale: the
    # in-process plugin init can hang ~25 min; a live relay answers in s).
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
    for j in ab_bf16 bench ab_fp32 trace_imgpad ab_extra; do
        [ -f "$OUT/$j.done" ] || return 1
    done
    return 0
}

while :; do
    if probe; then
        log "relay UP"
        # A: baseline + imgpad16/32 + pad128min64_gd + combined (5 arms)
        run_job ab_bf16 10800 python tools/lanepad_ab.py \
            --points bf16_bs128 --pads 0,128:64 --towers gd --iters 10
        # B: the headline bench (compile cache warmed by A)
        run_job bench 3600 env BENCH_BUDGET_S=3300 python bench.py
        # C: the reference operating point
        run_job ab_fp32 10800 python tools/lanepad_ab.py \
            --points fp32_bs24 --pads 0,128:64 --towers gd --iters 10
        # D: verify on-device conv widths under --image-pad 16
        run_job trace_imgpad 3600 python tools/trace_step.py \
            --image-pad 16 --vmem-kib 65536 --out "$OUT/trace_imgpad16"
        # E: the pre-registered-unfavorable lane arms, for the full sweep
        run_job ab_extra 10800 python tools/lanepad_ab.py \
            --points bf16_bs128 --pads 64,128 --towers d,gd --iters 10
        if all_done; then log "ALL JOBS DONE; queue exiting"; exit 0; fi
        log "some jobs failed; reprobing in 240s"
    fi
    sleep 240
done
