#!/bin/bash
# Round-4 TPU experiment queue. Waits for tools/tpu_poll.sh to signal the
# axon tunnel is back (/tmp/tpu_up.flag), then runs the queued measurements
# in dependency order, logging everything under /tmp/tpu_queue_r4/.
#
#  1. smoke      — bench.py at B=256, single block, no control: compiles
#                  the DEFAULT fused kernel on the real chip and runs the
#                  on-device parity self-test + realistic gate. (The
#                  non-default roll_hoist variant is compiled and gated in
#                  step 2 as the bench control arm.) NOTE: this queue ran
#                  to completion in round 4 while pallas_roll_hoist
#                  defaulted to True; the default has since flipped to
#                  per-block (BASELINE.md round 4) and BOTH arms passed
#                  on-chip post-flip.
#  1b. bf16-smoke— non-interpret compile of the bf16_vpu=2 kernel (ADVICE
#                  r3 #3: that class verifies on CPU, fails on Mosaic).
#  2. bench      — full self-calibrating bench: 4 blocks, median+IQR,
#                  in-run r3-kernel control arm -> head_vs_control is the
#                  tunnel-invariant number for the roll-hoist claim.
#  3. spmd       — tools/tpu_spmd_ondevice.py: shard_map+psum+Pallas and
#                  expand_distributed ON the chip (VERDICT r3 missing #1).
#  4. micro      — tools/microbench_kernel.py: R (hoist) vs S/T (no-roll)
#                  decide the round-5 kernel direction; W re-measured with
#                  the fixed bf16 reduce (ADVICE r3 #2).
#  5. 4k         — tools/tpu_4k_run.py: 8-cam 4096x3072 full-CLI run,
#                  wall/phase/memory/quality (VERDICT r3 weak #7).
#  6. roofline   — refresh BASELINE.md numbers for the hoisted kernel.
#
# Run detached:  bash tools/tpu_queue.sh &
set -u
OUT=/tmp/tpu_queue_r4
mkdir -p "$OUT"
: > "$OUT/status"
log() { echo "$(date +%H:%M:%S) $*" >> "$OUT/status"; }

while [ ! -f /tmp/tpu_up.flag ]; do sleep 60; done
log "tunnel up — starting queue"

cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

log "1 smoke start"
timeout 2400 env BENCH_BATCH=256 BENCH_REPS=1 BENCH_BLOCKS=1 \
    BENCH_CONTROL=0 python bench.py \
    > "$OUT/01_smoke.json" 2> "$OUT/01_smoke.err"
rc=$?
log "1 smoke rc=$rc"
if [ $rc -ne 0 ]; then
  log "SMOKE FAILED — suspect pallas_roll_hoist on Mosaic; queue halted"
  exit 1
fi

log "1b bf16=2 lowering smoke start"
timeout 1800 env BENCH_BATCH=256 BENCH_REPS=1 BENCH_BLOCKS=1 \
    BENCH_CONTROL=0 BENCH_REALISTIC=0 BENCH_BF16_VPU=2 python bench.py \
    > "$OUT/01b_bf16_2.json" 2> "$OUT/01b_bf16_2.err"
log "1b bf16=2 rc=$?"

log "2 bench start"
timeout 3600 python bench.py \
    > "$OUT/02_bench.json" 2> "$OUT/02_bench.err"
log "2 bench rc=$?"

log "3 spmd-on-device start"
timeout 3000 python tools/tpu_spmd_ondevice.py \
    > "$OUT/03_spmd.out" 2> "$OUT/03_spmd.err"
log "3 spmd rc=$?"

log "4 micro start"
timeout 3000 python tools/microbench_kernel.py \
    > "$OUT/04_micro.out" 2>&1
log "4 micro rc=$?"

log "5 4k start"
timeout 5400 python tools/tpu_4k_run.py --rounds 24 \
    > "$OUT/05_4k.json" 2> "$OUT/05_4k.err"
log "5 4k rc=$?"

log "6 roofline start"
timeout 3000 python tools/roofline.py > "$OUT/06_roofline.out" 2>&1
log "6 roofline rc=$?"

log "queue done"
