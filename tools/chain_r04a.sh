#!/bin/bash
# Round-4 TPU chain A: on-chip kernel validation -> pass ledger -> VPU mix probe.
# Strictly sequential (ONE TPU process at a time; see memory tpu-env-quirks).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
echo "=== [1/3] on-chip kernel tests $(date) ==="
MEDMAMBA_TPU_TESTS=1 timeout 5400 python -m pytest tests/test_pallas_tpu.py -q -x 2>&1 | tail -8
rc=${PIPESTATUS[0]}
if [ "$rc" != "0" ]; then echo "ON-CHIP TESTS FAILED rc=$rc -- stopping chain"; exit 1; fi
echo "=== [2/3] pass ledger $(date) ==="
timeout 21600 python tools/pass_ledger.py
echo "=== [3/3] VPU mix probe $(date) ==="
timeout 2400 python tools/probe_vpu.py mix
echo "=== chain A done $(date) ==="
