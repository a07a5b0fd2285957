"""Probe: raw VPU elementwise throughput in a Pallas kernel (fp32 vs bf16).

Measures el-ops/s for K chained multiply-adds over a VMEM-resident block,
with the grid streaming a large array. Decides whether the scan kernel's
~1 ms per full-cube op is a hard issue-rate wall or an implementation gap.
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(k_ops, mode):
    def kern(x_ref, o_ref):
        x = x_ref[...]
        if mode == "chain":  # serial dependency: latency-bound
            acc = x
            for _ in range(k_ops):
                acc = acc * 1.000001 + 0.0000001
            o_ref[...] = acc
        elif mode == "mul":  # pure muls: exactly k_ops instructions
            acc = x
            for _ in range(k_ops):
                acc = acc * 1.000001
            o_ref[...] = acc
        elif mode == "mul8":  # 8 independent mul chains
            chains = [x + float(i) for i in range(8)]
            for _ in range(k_ops // 8):
                chains = [c * 1.000001 for c in chains]
            acc = chains[0]
            for c in chains[1:]:
                acc = acc + c
            o_ref[...] = acc
        elif mode == "par4":  # 4 independent chains: ILP available
            a, b, c, d = x, x + 1.0, x + 2.0, x + 3.0
            for _ in range(k_ops // 4):
                a = a * 1.000001 + 1e-7
                b = b * 1.000001 + 1e-7
                c = c * 1.000001 + 1e-7
                d = d * 1.000001 + 1e-7
            o_ref[...] = a + b + c + d
        elif mode == "exp":  # exp in the chain: is exp really free?
            acc = x
            for _ in range(k_ops):
                acc = jnp.exp(acc * 1e-6)
            o_ref[...] = acc
        elif mode == "mix":
            # VERDICT r3 #8: falsification probe of the 1.8-2.0 T el-ops/s
            # fp32 anchor under the SCAN KERNEL'S ACTUAL MIX -- interleaved
            # exp + mul/add + clip + select on (8,128)-tiled fp32 with ~10
            # live buffers (the SSD kernel keeps ~11 cubes live), instead of
            # a clean single-chain. One iteration = 15 el-ops mirroring the
            # forward's decay/factor/contraction passes (g, clip, E, F, w,
            # G+, h_all, select, fma).
            lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
            a, b = x, x * 1.1 + 1.0
            live = [x + float(i) * 0.1 for i in range(6)]
            for _ in range(k_ops // 15):
                g = a * b                                      # 1
                g = jnp.minimum(jnp.maximum(g, -80.0), 80.0)   # 2
                E = jnp.exp(g * 1e-6)                          # 2 (mul+exp)
                F = jnp.exp(-1e-6 * g)                         # 2
                w = F * live[0]                                # 1
                G = w + live[1]                                # 1
                h = E * (G + F * live[2])                      # 3
                sel = jnp.where(lane < 64, h, E)               # 1
                a = sel * 1.000001 + 1e-7                      # 2 (fma)
                b = b * 0.999999                               # 1
                live = live[1:] + [h * 1e-3]                   # (counted 0)
            acc = a + b
            for c in live:
                acc = acc + c * 1e-6
            o_ref[...] = acc
    return kern


def bench(dtype, k_ops, mode, rows=8 * 2048, cols=512, blk_rows=512):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((rows, cols)),
                    dtype=dtype)
    grid = (rows // blk_rows,)
    f = pl.pallas_call(
        make_kernel(k_ops, mode),
        grid=grid,
        in_specs=[pl.BlockSpec((blk_rows, cols), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((blk_rows, cols), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, cols), dtype),
    )

    @jax.jit
    def run_n(x, n):
        def body(i, acc):
            return f(acc)
        return jax.lax.fori_loop(0, n, body, x)

    y = run_n(x, 2); float(jnp.sum(y[:1]))
    t0 = time.perf_counter(); y = run_n(x, 20); float(jnp.sum(y[:1]))
    t3 = time.perf_counter() - t0
    t0 = time.perf_counter(); y = run_n(x, 520); float(jnp.sum(y[:1]))
    t13 = time.perf_counter() - t0
    per_call = (t13 - t3) / 500
    els = rows * cols
    # each mul+add = 2 el-ops; chain does k_ops of those
    if mode == "mix":
        ops = els * (k_ops // 15) * 15  # 15 counted el-ops per iteration
    else:
        ops = els * k_ops * (2 if mode in ("chain", "par4") else 1)
    return per_call, ops / per_call / 1e12


def main():
    modes = sys.argv[1].split(",") if len(sys.argv) > 1 else (
        "mul", "mul8", "chain", "exp")
    for mode in modes:
        for dtype in ((jnp.float32,) if mode == "mix"
                      else (jnp.float32, jnp.bfloat16)):
            for k in (16, 64) if mode != "mix" else (60, 150):
                t, tops = bench(dtype, k, mode)
                print(f"{mode:6s} {dtype.__name__:9s} k={k:3d}: "
                      f"{t*1e3:7.3f} ms/call  {tops:6.2f} T el-ops/s")


if __name__ == "__main__":
    main()
