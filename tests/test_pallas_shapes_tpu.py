"""Shape-robustness sweep for the fused scan kernel -- TPU only.

Run with: MEDMAMBA_TPU_TESTS=1 python -m pytest tests/test_pallas_shapes_tpu.py -q
Covers batch sizes not divisible by the batch block, L edge cases (1, exact
chunk, chunk+1), small/large d_state, single-group and odd channel counts.
"""
import numpy as np
import pytest
import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="Pallas selective-scan kernel requires a TPU backend")

from medmamba_tpu.ops.pallas_scan import selective_scan_pallas  # noqa: E402
from tests.oracle import selective_scan_oracle  # noqa: E402


CASES = [
    # (b, d, n, g, l)
    (3, 64, 16, 4, 130),   # batch not divisible by 8/4/2
    (1, 32, 16, 1, 128),   # single group, single batch
    (2, 64, 8, 4, 1),      # L=1
    (2, 64, 8, 4, 129),    # chunk boundary + 1
    (5, 48, 16, 4, 64),    # dpg=12 (not 8-aligned), odd batch
    (2, 64, 32, 2, 96),    # larger d_state
]


@pytest.mark.parametrize("b,d,n,g,l", CASES)
def test_pallas_shape_sweep(b, d, n, g, l):
    rng = np.random.default_rng(hash((b, d, n, g, l)) % 2**32)
    u = rng.standard_normal((b, d, l)).astype(np.float32)
    delta = (0.3 * rng.standard_normal((b, d, l))).astype(np.float32)
    A = -np.exp(rng.standard_normal((d, n)).astype(np.float32) * 0.5)
    B = rng.standard_normal((b, g, n, l)).astype(np.float32)
    C = rng.standard_normal((b, g, n, l)).astype(np.float32)
    D = rng.standard_normal((d,)).astype(np.float32)
    bias = (0.1 * rng.standard_normal((d,))).astype(np.float32)
    y_ref = selective_scan_oracle(u, delta, A, B, C, D, bias,
                                  delta_softplus=True)
    y = selective_scan_pallas(u, delta, A, B, C, D, delta_bias=bias,
                              delta_softplus=True)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-3, atol=3e-3)
