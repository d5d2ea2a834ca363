#!/bin/bash
# Round-3 TPU experiment queue. Waits for tools/tpu_poll.sh to signal the
# axon tunnel is back (/tmp/tpu_up.flag), then runs the queued measurements
# in dependency order, logging everything under /tmp/tpu_queue/.
#
#  1. smoke     — bench.py at B=256: compiles the CURRENT fused kernel
#                 (double-buffered scratch + bf16_vpu threading) on the real
#                 chip, runs the on-device parity self-test + realistic
#                 gate. A Mosaic crash here means revert 70ac7cd.
#  2. micro     — tools/microbench_kernel.py (V1/V2/W calibrate the VPU's
#                 bf16 element rate; I vs L re-checks pipelining).
#  3. bf16 A/B  — full bench at pallas_bf16_vpu = 0 / 1 / 2, each
#                 quality-co-gated (self-test + realistic scene in-run).
#  4. bucket    — tools/probe_bucket.py (re-decide pallas_span_bucket).
#  5. roofline  — tools/roofline.py (refresh BASELINE.md numbers).
#
# Run detached:  bash tools/tpu_queue.sh &
set -u
OUT=/tmp/tpu_queue
mkdir -p "$OUT"
: > "$OUT/status"
log() { echo "$(date +%H:%M:%S) $*" >> "$OUT/status"; }

while [ ! -f /tmp/tpu_up.flag ]; do sleep 60; done
log "tunnel up — starting queue"

cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

log "1 smoke start"
timeout 2400 env BENCH_BATCH=256 BENCH_REPS=1 python bench.py \
    > "$OUT/01_smoke.json" 2> "$OUT/01_smoke.err"
rc=$?
log "1 smoke rc=$rc"
if [ $rc -ne 0 ]; then
  log "SMOKE FAILED — queue halted (suspect 70ac7cd double-buffer on Mosaic)"
  exit 1
fi

# headline bench at the DEFAULT config first: if the tunnel returns late
# in the round this is the one artifact that must exist (it doubles as
# the bf16=0 arm of the A/B)
log "2 bench-default start"
timeout 3000 python bench.py \
    > "$OUT/02_bench_default.json" 2> "$OUT/02_bench_default.err"
log "2 bench-default rc=$?"

for L in 1 2; do
  log "3 bf16=$L start"
  timeout 3000 env BENCH_BF16_VPU=$L python bench.py \
      > "$OUT/03_bf16_$L.json" 2> "$OUT/03_bf16_$L.err"
  log "3 bf16=$L rc=$?"
done

log "2b micro start"
timeout 3000 python tools/microbench_kernel.py \
    > "$OUT/02_micro.out" 2>&1
log "2b micro rc=$?"

log "4 bucket start"
timeout 3000 python tools/probe_bucket.py > "$OUT/04_bucket.out" 2>&1
log "4 bucket rc=$?"

log "5 roofline start"
timeout 3000 python tools/roofline.py > "$OUT/05_roofline.out" 2>&1
log "5 roofline rc=$?"

log "6 refine-profile start"
timeout 3000 python tools/profile_refine.py > "$OUT/06_profile.out" 2>&1
log "6 refine-profile rc=$?"

log "queue done"
