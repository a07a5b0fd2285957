"""Sequence-parallel selective scan (ops/seq_parallel.py) on the virtual mesh.

L sharded over 8 devices must reproduce the single-device scan exactly
(same math, the boundary combine is exact), including gradients through the
shard_map/all_gather/stitch path, and the replicated final state.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from medmamba_tpu.ops.selective_scan import selective_scan_assoc
from medmamba_tpu.ops.seq_parallel import selective_scan_seq_parallel


def _mk(rng, b=2, d=8, n=4, l=128, g=2):
    return (rng.standard_normal((b, d, l)).astype(np.float32),
            (0.3 * rng.standard_normal((b, d, l))).astype(np.float32),
            -np.exp(rng.standard_normal((d, n)).astype(np.float32) * 0.5),
            rng.standard_normal((b, g, n, l)).astype(np.float32),
            rng.standard_normal((b, g, n, l)).astype(np.float32),
            rng.standard_normal((d,)).astype(np.float32),
            (0.1 * rng.standard_normal((d,))).astype(np.float32))


@pytest.fixture
def seq_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.asarray(jax.devices()[:8]), ("seq",))


def test_seq_parallel_matches_single_device(seq_mesh):
    rng = np.random.default_rng(0)
    u, delta, A, B, C, D, bias = _mk(rng)
    y_ref, h_ref = selective_scan_assoc(u, delta, A, B, C, D,
                                        delta_bias=bias, delta_softplus=True,
                                        return_last_state=True)

    sh = NamedSharding(seq_mesh, P(None, None, "seq"))
    sh4 = NamedSharding(seq_mesh, P(None, None, None, "seq"))
    args = (jax.device_put(u, sh), jax.device_put(delta, sh), jnp.asarray(A),
            jax.device_put(B, sh4), jax.device_put(C, sh4), jnp.asarray(D),
            jnp.asarray(bias))

    @jax.jit
    def f(a):
        return selective_scan_seq_parallel(
            a[0], a[1], a[2], a[3], a[4], a[5], delta_bias=a[6],
            delta_softplus=True, mesh=seq_mesh, seq_axis="seq",
            impl="assoc", return_last_state=True)

    y, h = f(args)
    assert y.sharding.spec == P(None, None, "seq"), y.sharding
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               rtol=1e-4, atol=1e-5)


def test_seq_parallel_gradients_match(seq_mesh):
    rng = np.random.default_rng(1)
    u, delta, A, B, C, D, bias = _mk(rng, l=64)
    sh = NamedSharding(seq_mesh, P(None, None, "seq"))
    sh4 = NamedSharding(seq_mesh, P(None, None, None, "seq"))
    args = (jax.device_put(u, sh), jax.device_put(delta, sh), jnp.asarray(A),
            jax.device_put(B, sh4), jax.device_put(C, sh4), jnp.asarray(D),
            jnp.asarray(bias))

    g_sp = jax.jit(jax.grad(lambda a: jnp.sum(selective_scan_seq_parallel(
        a[0], a[1], a[2], a[3], a[4], a[5], delta_bias=a[6],
        delta_softplus=True, mesh=seq_mesh, seq_axis="seq",
        impl="assoc") ** 2)))(args)
    g_ref = jax.grad(lambda a: jnp.sum(selective_scan_assoc(
        a[0], a[1], a[2], a[3], a[4], a[5], delta_bias=a[6],
        delta_softplus=True) ** 2))(tuple(
            jnp.asarray(x) for x in (u, delta, A, B, C, D, bias)))
    for name, got, ref in zip("u delta A B C D bias".split(), g_sp, g_ref):
        scale = np.abs(np.asarray(ref)).max() + 1e-6
        err = np.abs(np.asarray(got) - np.asarray(ref)).max() / scale
        assert err < 1e-4, (name, err)


def test_seq_parallel_long_sequence_underflow_is_benign(seq_mesh):
    """Strong decay over a long sharded sequence: the linear-space cumprod
    underflows to exactly 0 (fully-decayed state) and the stitched result
    still matches the single-device scan."""
    rng = np.random.default_rng(2)
    u, delta, A, B, C, D, bias = _mk(rng, d=8, l=512)
    delta = np.abs(delta) + 2.0        # big dt -> decay products vanish
    A = A * 10.0
    y_ref = selective_scan_assoc(u, delta, A, B, C, D, delta_bias=bias,
                                 delta_softplus=True)
    sh = NamedSharding(seq_mesh, P(None, None, "seq"))
    sh4 = NamedSharding(seq_mesh, P(None, None, None, "seq"))
    y = jax.jit(lambda a: selective_scan_seq_parallel(
        a[0], a[1], a[2], a[3], a[4], a[5], delta_bias=a[6],
        delta_softplus=True, mesh=seq_mesh, seq_axis="seq", impl="assoc"))(
            (jax.device_put(u, sh), jax.device_put(delta, sh),
             jnp.asarray(A), jax.device_put(B, sh4), jax.device_put(C, sh4),
             jnp.asarray(D), jnp.asarray(bias)))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)
