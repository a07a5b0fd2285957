#!/bin/bash
# Round-4 TPU chain C: trimmed ablation ledger (scan-default build) -> VPU mix
# probe -> full-model benches (most decision-relevant first).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
echo "=== [1/3] trimmed pass ledger $(date) ==="
timeout 10800 python tools/pass_ledger.py --tokens clip,fneg,ehalf,dub,w,boundary,q,gbc,gadt,dh
echo "=== [2/3] VPU mix probe $(date) ==="
timeout 2400 python tools/probe_vpu.py mix
echo "=== [3/3] full-model benches $(date) ==="
LOG=docs/experiments/bench_r04_chain.jsonl
run() {
  tag="$1"; shift
  echo "=== bench $tag $(date) ===" >&2
  out=$(env "$@" timeout 3600 python bench.py 2>/dev/null | tail -1)
  echo "{\"tag\": \"$tag\", \"result\": $out}" | tee -a "$LOG"
}
run auto_b64            BENCH_TAU=auto
run forced128_b64       BENCH_TAU=128
run sustained_b64       BENCH_TAU=auto BENCH_MODE=sustained BENCH_STEPS=300 BENCH_EPOCHS=3
run infer_b64           BENCH_TAU=auto BENCH_MODE=infer
for b in 128 256 32; do
  run auto_b$b          BENCH_TAU=auto BENCH_BATCH=$b BENCH_BREAKDOWN=0
done
for b in 128 256 32; do
  run forced128_b$b     BENCH_TAU=128  BENCH_BATCH=$b BENCH_BREAKDOWN=0
done
echo "=== chain C done $(date) ==="
