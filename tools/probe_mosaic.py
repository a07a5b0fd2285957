"""Probe which small-tensor relayout ops Mosaic accepts on this backend.

Each probe is a minimal pallas kernel exercising one candidate primitive for
moving (N, nseg) segment data into/out of a fused 128-lane layout. Run on the
real TPU; prints OK/FAIL per probe. Results drive the compact-boundary design
in ops/pallas_scan.py.
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, x, out_shape):
    try:
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        y.block_until_ready()
        print(f"{name}: OK")
        return np.asarray(y)
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"{name}: FAIL {msg}")
        return None


B, D, N, R = 8, 16, 16, 8
x4 = jnp.asarray(np.random.default_rng(0).standard_normal(
    (B, D, N, R)).astype(np.float32))
xw = jnp.asarray(np.random.default_rng(1).standard_normal(
    (B, D, N * R)).astype(np.float32))

run("merge (B,D,N,R)->(B,D,N*R)",
    lambda i, o: o.__setitem__(slice(None), i[:].reshape(B, D, N * R)),
    x4, (B, D, N * R))

run("split (B,D,N*R)->(B,D,N,R)",
    lambda i, o: o.__setitem__(slice(None), i[:].reshape(B, D, N, R)),
    xw, (B, D, N, R))

run("swapaxes minor (B,D,N,R)->(B,D,R,N)",
    lambda i, o: o.__setitem__(slice(None), jnp.swapaxes(i[:], -1, -2)),
    x4, (B, D, R, N))

run("leading collapse (B,D,N,R)->(B*D*N,R)",
    lambda i, o: o.__setitem__(slice(None), i[:].reshape(B * D * N, R)),
    x4, (B * D * N, R))

run("leading collapse to sublane (B,D,N,R)->(B,D*N,R)",
    lambda i, o: o.__setitem__(slice(None), i[:].reshape(B, D * N, R)),
    x4, (B, D * N, R))


def mm_kernel(i, o):
    p = (jax.lax.broadcasted_iota(jnp.int32, (R, N * R), 1) % R
         == jax.lax.broadcasted_iota(jnp.int32, (R, N * R), 0)
         ).astype(jnp.float32)
    x2 = i[:].reshape(-1, R)
    o[:] = jax.lax.dot_general(
        x2, p, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(B, D, N, N * R)


run("matmul lhs minor-8 (.,R)@(R,128)", mm_kernel, x4, (B, D, N, N * R))

run("strided lane slice (B,D,N*R)[..., R-1::R]",
    lambda i, o: o.__setitem__(slice(None), i[:, :, R - 1::R]),
    xw, (B, D, N))

run("lane slice+index (B,D,N*R)->reshape idx",
    lambda i, o: o.__setitem__(slice(None), i[:].reshape(B, D, N, R)[..., 0]),
    xw, (B, D, N))


def rep_kernel(i, o):
    o[:] = pltpu.repeat(i[:, :, :, 0], R, axis=2)


run("pltpu.repeat lanes (B,D,N)->(B,D,N*R)", rep_kernel, x4, (B, D, N * R))


def bcast_kernel(i, o):
    v = i[:, :, :, 0]                       # (B, D, N)
    o[:] = jnp.broadcast_to(v[..., None], (B, D, N, R)).reshape(B, D, N * R)


run("broadcast+merge (B,D,N,1)->(B,D,N*R)", bcast_kernel, x4, (B, D, N * R))


def mv_kernel(i, o):
    o[:] = jnp.moveaxis(i[:], -1, 0)


run("moveaxis minor->leading (B,D,N,R)->(R,B,D,N)", mv_kernel, x4,
    (R, B, D, N))


def dg_kernel(i, o):
    # contract the leading R dim of a 4D stack against (T, R): -> (B,D,N,T)
    stack = jnp.moveaxis(i[:], -1, 0)            # (R, B, D, N)
    T = 128
    pick = (jax.lax.broadcasted_iota(jnp.int32, (R, T), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (R, T), 1) // 16
            ).astype(jnp.float32)
    o[:] = jax.lax.dot_general(
        stack, pick, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


run("dot_general 4D-lhs contract leading (R,B,D,N)x(R,T)", dg_kernel, x4,
    (B, D, N, 128))


def stack_kernel(i, o):
    pieces = [i[:, :, :, j] * (j + 1.0) for j in range(R)]
    o[:] = jnp.stack(pieces, axis=0)


run("minor-index slices + stack axis0", stack_kernel, x4, (R, B, D, N))


def seq_scan_kernel(i, o):
    # the actual intended pattern: leading-indexed sequential recurrence
    stack = jnp.moveaxis(i[:], -1, 0)            # (R, B, D, N)
    h = stack[0]
    outs = [h]
    for j in range(1, R):
        h = h * 0.5 + stack[j]
        outs.append(h)
    o[:] = jnp.stack(outs, axis=0)


run("leading-indexed sequential recurrence", seq_scan_kernel, x4, (R, B, D, N))
