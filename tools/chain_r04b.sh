#!/bin/bash
# Round-4 TPU chain B: full-model in-chain A/Bs after the kernel decisions.
# Usage: tools/chain_r04b.sh [sweep]   -- 'sweep' adds the batch sweep
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
LOG=docs/experiments/bench_r04_chain.jsonl
run() {  # run <tag> <env...>
  tag="$1"; shift
  echo "=== bench $tag $(date) ===" >&2
  out=$(env "$@" timeout 3600 python bench.py 2>/dev/null | tail -1)
  echo "{\"tag\": \"$tag\", \"result\": $out}" | tee -a "$LOG"
}
run auto_b64            BENCH_TAU=auto
run forced128_b64       BENCH_TAU=128
if [ "$1" == "sweep" ]; then
  for b in 32 128 256; do
    run auto_b$b        BENCH_TAU=auto BENCH_BATCH=$b BENCH_BREAKDOWN=0
    run forced128_b$b   BENCH_TAU=128  BENCH_BATCH=$b BENCH_BREAKDOWN=0
  done
  run infer_b64         BENCH_TAU=auto BENCH_MODE=infer
  run sustained_b64     BENCH_TAU=auto BENCH_MODE=sustained BENCH_STEPS=300 BENCH_EPOCHS=3
fi
echo "=== chain B done $(date) ==="
