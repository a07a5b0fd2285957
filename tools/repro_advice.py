"""Repro for ADVICE high: dA/dbias/dD accumulation with nd>1 on real TPU."""
import os
os.environ["MEDMAMBA_SCAN_CUBE_BUDGET_BWD"] = str(128 * 1024)  # force nd>1
import numpy as np
import jax
import jax.numpy as jnp

from medmamba_tpu.ops.pallas_scan import selective_scan_pallas
from medmamba_tpu.ops.selective_scan import selective_scan_assoc

rng = np.random.default_rng(0)
import sys
g = int(sys.argv[1]) if len(sys.argv) > 1 else 4
b, d, n, l = int(os.environ.get("RB", "2")), 64, 16, 256
u = rng.standard_normal((b, d, l)).astype(np.float32)
delta = (0.3 * rng.standard_normal((b, d, l))).astype(np.float32)
A = -np.exp(rng.standard_normal((d, n)).astype(np.float32) * 0.5)
B = rng.standard_normal((b, g, n, l)).astype(np.float32)
C = rng.standard_normal((b, g, n, l)).astype(np.float32)
D = rng.standard_normal((d,)).astype(np.float32)
bias = (0.1 * rng.standard_normal((d,))).astype(np.float32)

args = tuple(jnp.asarray(x) for x in (u, delta, A, B, C, D, bias))
gyw = jnp.asarray(rng.standard_normal(u.shape).astype(np.float32))


def loss(fn):
    def f(a):
        y = fn(a[0], a[1], a[2], a[3], a[4], a[5], delta_bias=a[6],
               delta_softplus=True)
        return jnp.sum(y * gyw)
    return f


g_p = jax.grad(loss(selective_scan_pallas))(args)
g_a = jax.grad(loss(selective_scan_assoc))(args)
for name, gp, ga in zip(["du", "ddt", "dA", "dB", "dC", "dD", "dbias"],
                        g_p, g_a):
    gp, ga = np.asarray(gp), np.asarray(ga)
    scale = np.abs(ga).max() + 1e-6
    err = np.abs(gp - ga).max() / scale
    print(f"{name}: rel err {err:.2e} {'FAIL' if err > 1e-3 else 'ok'}")
