"""Micro-benchmark of the fused selective-scan kernel per VSSM stage shape.

Usage: python tools/bench_kernel.py [fwd|grad] [batch]
Prints per-stage kernel time using the fori_loop difference-timing harness
(amortizes the remote-tunnel dispatch latency).
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from medmamba_tpu.ops.pallas_scan import selective_scan_pallas  # noqa: E402

# (d_inner, L) per VSSM-T stage at 224x224
STAGES = [(96, 3136), (192, 784), (384, 196), (768, 49)]


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    stages = STAGES
    if len(sys.argv) > 3:  # single-stage mode: bench_kernel.py fwd 64 0
        stages = [STAGES[int(sys.argv[3])]]
    n, g = 16, 4
    rng = np.random.default_rng(0)

    for d_inner, l in stages:
        d = 4 * d_inner
        u = jnp.asarray(rng.standard_normal((batch, d, l)).astype(np.float32))
        delta = jnp.asarray(
            (0.1 * rng.standard_normal((batch, d, l))).astype(np.float32))
        A = jnp.asarray(-np.exp(
            rng.standard_normal((d, n)).astype(np.float32) * 0.5))
        B = jnp.asarray(rng.standard_normal((batch, g, n, l)).astype(np.float32))
        C = jnp.asarray(rng.standard_normal((batch, g, n, l)).astype(np.float32))
        D = jnp.asarray(rng.standard_normal((d,)).astype(np.float32))
        bias = jnp.asarray((0.1 * rng.standard_normal((d,))).astype(np.float32))

        if mode == "fwd":
            def one(x, ops):
                dlt, A_, B_, C_, D_, bs = ops
                return selective_scan_pallas(
                    x, dlt, A_, B_, C_, D_, delta_bias=bs, delta_softplus=True)
        else:
            def one(x, ops):
                dlt, A_, B_, C_, D_, bs = ops
                def loss(xx):
                    y = selective_scan_pallas(
                        xx, dlt, A_, B_, C_, D_, delta_bias=bs,
                        delta_softplus=True)
                    return jnp.sum(y * y)
                return jax.grad(loss)(x)

        @jax.jit
        def run_n(x, ops, k):
            def body(i, xx):
                return one(xx, ops) * 1e-3  # bounded magnitudes, chained deps
            return jax.lax.fori_loop(0, k, body, x)

        ops = (delta, A, B, C, D, bias)
        x = u
        x = run_n(x, ops, 2)
        float(jnp.sum(x))  # sync
        t0 = time.perf_counter()
        x = run_n(x, ops, 2)
        float(jnp.sum(x))
        t2 = time.perf_counter() - t0
        t0 = time.perf_counter()
        x = run_n(x, ops, 12)
        float(jnp.sum(x))
        t12 = time.perf_counter() - t0
        per = (t12 - t2) / 10
        elems = batch * d * n * l
        print(f"stage d_inner={d_inner:4d} L={l:5d}: {per*1000:8.2f} ms/call "
              f"({elems/per/1e9:7.2f} Gelem/s)")


if __name__ == "__main__":
    main()
