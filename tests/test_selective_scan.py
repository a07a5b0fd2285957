import numpy as np
import pytest
import jax
import jax.numpy as jnp
import os

from medmamba_tpu.ops.selective_scan import selective_scan, selective_scan_assoc, selective_scan_seq
from medmamba_tpu.ops.cross_scan import cross_scan, cross_merge
from tests.oracle import selective_scan_oracle, cross_scan_oracle


def _make_inputs(rng, b=2, d=8, n=4, l=33, g=4, dtype=np.float32):
    u = rng.standard_normal((b, d, l)).astype(dtype)
    delta = (0.3 * rng.standard_normal((b, d, l))).astype(dtype)
    A = -np.exp(rng.standard_normal((d, n)).astype(dtype) * 0.5)
    B = rng.standard_normal((b, g, n, l)).astype(dtype)
    C = rng.standard_normal((b, g, n, l)).astype(dtype)
    D = rng.standard_normal((d,)).astype(dtype)
    bias = (0.1 * rng.standard_normal((d,))).astype(dtype)
    return u, delta, A, B, C, D, bias


@pytest.mark.parametrize("impl", ["seq", "assoc"])
@pytest.mark.parametrize("g,l", [(4, 33), (1, 49), (4, 64)])
def test_scan_matches_oracle(impl, g, l):
    rng = np.random.default_rng(0)
    u, delta, A, B, C, D, bias = _make_inputs(rng, g=g, l=l)
    y_ref = selective_scan_oracle(u, delta, A, B, C, D, bias, delta_softplus=True)
    y = selective_scan(u, delta, A, B, C, D, delta_bias=bias, delta_softplus=True, impl=impl)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-4, atol=2e-4)


def test_scan_no_bias_no_softplus_no_D():
    rng = np.random.default_rng(1)
    u, delta, A, B, C, _, _ = _make_inputs(rng)
    delta = np.abs(delta) + 1e-2  # keep positive when not softplussed
    y_ref = selective_scan_oracle(u, delta, A, B, C)
    for impl in ("seq", "assoc"):
        y = selective_scan(u, delta, A, B, C, impl=impl)
        np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-4, atol=2e-4)


def test_scan_last_state():
    rng = np.random.default_rng(2)
    u, delta, A, B, C, D, bias = _make_inputs(rng, l=17)
    y1, h1 = selective_scan_seq(u, delta, A, B, C, D, bias, True, return_last_state=True)
    y2, h2 = selective_scan_assoc(u, delta, A, B, C, D, bias, True, return_last_state=True)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-4, atol=1e-5)


def test_scan_gradients_agree():
    rng = np.random.default_rng(3)
    u, delta, A, B, C, D, bias = _make_inputs(rng, b=1, d=4, l=19)

    def loss(impl):
        def f(args):
            u_, dt_, A_, B_, C_, D_, bias_ = args
            y = selective_scan(u_, dt_, A_, B_, C_, D_, delta_bias=bias_,
                               delta_softplus=True, impl=impl)
            return jnp.sum(y * y)
        return f

    args = tuple(jnp.asarray(a) for a in (u, delta, A, B, C, D, bias))
    g_seq = jax.grad(loss("seq"))(args)
    g_assoc = jax.grad(loss("assoc"))(args)
    for gs, ga in zip(g_seq, g_assoc):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(ga), rtol=2e-3, atol=2e-4)


def test_cross_scan_matches_oracle():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
    xs = np.asarray(cross_scan(jnp.asarray(x)))
    np.testing.assert_array_equal(xs, cross_scan_oracle(x))


def test_cross_merge_roundtrip():
    """cross_merge(cross_scan(x)) must equal 4*x flattened row-major."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 6, 4, 3)).astype(np.float32)
    xs = cross_scan(jnp.asarray(x))
    merged = cross_merge(xs, h=6, w=4)
    expected = 4.0 * np.transpose(x, (0, 3, 1, 2)).reshape(2, 3, 24)
    np.testing.assert_allclose(np.asarray(merged), expected, rtol=1e-6, atol=1e-6)


def test_pallas_interpret_mode_on_cpu():
    """The Pallas kernel logic runs under the interpreter off-TPU, so the
    fused path is testable without hardware (fwd + grad vs oracle)."""
    from medmamba_tpu.ops.pallas_scan import selective_scan_pallas
    rng = np.random.default_rng(7)
    u, delta, A, B, C, D, bias = _make_inputs(rng, b=1, d=8, n=4, l=20, g=2)
    y_ref = selective_scan_oracle(u, delta, A, B, C, D, bias,
                                  delta_softplus=True)
    y = selective_scan_pallas(u, delta, A, B, C, D, delta_bias=bias,
                              delta_softplus=True)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-3, atol=3e-3)

    def loss(args):
        u_, dt_, A_, B_, C_, D_, bias_ = args
        y = selective_scan_pallas(u_, dt_, A_, B_, C_, D_, delta_bias=bias_,
                                  delta_softplus=True)
        return jnp.sum(y * y)

    args = tuple(jnp.asarray(a) for a in (u, delta, A, B, C, D, bias))
    g_p = jax.grad(loss)(args)
    g_a = jax.grad(lambda a: jnp.sum(selective_scan_assoc(
        a[0], a[1], a[2], a[3], a[4], a[5], delta_bias=a[6],
        delta_softplus=True) ** 2))(args)
    for gp, ga in zip(g_p, g_a):
        scale = np.abs(np.asarray(ga)).max() + 1e-6
        assert np.abs(np.asarray(gp) - np.asarray(ga)).max() / scale < 2e-3


def _mk(rng, b=2, d=16, n=8, l=96, g=4):
    return (rng.standard_normal((b, d, l)).astype(np.float32),
            (0.3 * rng.standard_normal((b, d, l))).astype(np.float32),
            -np.exp(rng.standard_normal((d, n)).astype(np.float32) * 0.5),
            rng.standard_normal((b, g, n, l)).astype(np.float32),
            rng.standard_normal((b, g, n, l)).astype(np.float32),
            rng.standard_normal((d,)).astype(np.float32),
            (0.1 * rng.standard_normal((d,))).astype(np.float32))


@pytest.mark.parametrize("impl", ["seq", "assoc", "pallas"])
def test_reverse_dirs_matches_explicit_flips(impl):
    """reverse_dirs (native reverse scans in the Pallas kernel; explicit
    flips elsewhere) must equal flip-scan-unflip for every impl."""
    from medmamba_tpu.ops.selective_scan import _flip_group_seqs, _flip_y

    rng = np.random.default_rng(7)
    u, delta, A, B, C, D, bias = _mk(rng)
    flags = (False, True, True, False)

    uf, df, Bf, Cf = _flip_group_seqs(jnp.asarray(u), jnp.asarray(delta),
                                      jnp.asarray(B), jnp.asarray(C), flags)
    y_ref = np.asarray(_flip_y(
        selective_scan_assoc(uf, df, A, Bf, Cf, D, delta_bias=bias,
                             delta_softplus=True), 4, flags))

    y = selective_scan(u, delta, A, B, C, D, delta_bias=bias,
                       delta_softplus=True, impl=impl, reverse_dirs=flags)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-3, atol=3e-3)


@pytest.mark.parametrize("l,b", [(49, 4), (20, 4)])
def test_pallas_batch_packing_matches_unpacked(l, b):
    """Short-L batch packing (several batch elements per 128-lane chunk with
    in-kernel reset masks) must match the unpacked kernel: fwd, grads, and
    reverse direction."""
    from medmamba_tpu.ops.pallas_scan import selective_scan_pallas

    rng = np.random.default_rng(11)
    u, delta, A, B, C, D, bias = _make_inputs(rng, b=b, d=8, n=4, l=l, g=2)
    args = tuple(jnp.asarray(a) for a in (u, delta, A, B, C, D, bias))

    def run(rev):
        def loss(a):
            y = selective_scan_pallas(
                a[0], a[1], a[2], a[3], a[4], a[5], delta_bias=a[6],
                delta_softplus=True, reverse_dirs=(rev, rev))
            return jnp.sum(y * jnp.cos(y)), y
        (_, y), grads = jax.value_and_grad(loss, has_aux=True)(args)
        return y, grads

    for rev in (False, True):
        os.environ.pop("MEDMAMBA_SCAN_PACK", None)
        y_p, g_p = run(rev)
        os.environ["MEDMAMBA_SCAN_PACK"] = "0"
        try:
            y_u, g_u = run(rev)
        finally:
            os.environ.pop("MEDMAMBA_SCAN_PACK", None)
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_u),
                                   rtol=1e-4, atol=1e-4)
        for gp, gu in zip(g_p, g_u):
            scale = np.abs(np.asarray(gu)).max() + 1e-6
            assert np.abs(np.asarray(gp) - np.asarray(gu)).max() / scale \
                < 1e-3, f"rev={rev}"


def test_pallas_bf16_cube_mode_tolerance():
    """MEDMAMBA_SCAN_COMPUTE=bfloat16 (opt-in): full-cube factor tensors in
    bf16, fp32 exponents/boundary states/accumulations. Documented accuracy:
    ~1e-2 relative vs the fp32 core."""
    from medmamba_tpu.ops.pallas_scan import selective_scan_pallas

    rng = np.random.default_rng(13)
    u, delta, A, B, C, D, bias = _make_inputs(rng, b=2, d=8, n=4, l=40, g=2)
    y_ref = selective_scan_oracle(u, delta, A, B, C, D, bias,
                                  delta_softplus=True)
    os.environ["MEDMAMBA_SCAN_COMPUTE"] = "bfloat16"
    try:
        y = np.asarray(selective_scan_pallas(
            u, delta, A, B, C, D, delta_bias=bias, delta_softplus=True))
    finally:
        os.environ.pop("MEDMAMBA_SCAN_COMPUTE", None)
    scale = np.abs(y_ref).max()
    assert np.abs(y - y_ref).max() / scale < 2e-2


@pytest.mark.parametrize("l,b,rev", [(256, 2, False), (256, 2, True),
                                     (49, 4, False), (49, 4, True)])
def test_pallas_compact_boundary_matches_assoc(l, b, rev, monkeypatch):
    """Round-3 compact segment-boundary machinery (static nseg-step loop on
    per-segment (Bb, Db, N) tensors instead of tau-replicated doubling scans
    over cubes) forced on at nseg>1: fwd + all grads, both directions,
    unpacked (L=256) and packed short-L (L=49)."""
    from medmamba_tpu.ops.pallas_scan import selective_scan_pallas
    monkeypatch.setenv("MEDMAMBA_SCAN_BOUNDARY", "compact")

    rng = np.random.default_rng(17)
    u, delta, A, B, C, D, bias = _make_inputs(rng, b=b, d=8, n=4, l=l, g=2)
    args = tuple(jnp.asarray(a) for a in (u, delta, A, B, C, D, bias))
    gyw = jnp.asarray(rng.standard_normal(u.shape).astype(np.float32))

    def loss(fn):
        def f(a):
            y = fn(a[0], a[1], a[2], a[3], a[4], a[5], delta_bias=a[6],
                   delta_softplus=True, reverse_dirs=(rev, rev))
            return jnp.sum(y * gyw)
        return f

    g_p = jax.grad(loss(selective_scan_pallas))(args)
    monkeypatch.delenv("MEDMAMBA_SCAN_BOUNDARY")
    g_a = jax.grad(loss(
        lambda *a, **k: selective_scan(*a, impl="assoc", **k)))(args)
    for name, gp, ga in zip(["du", "ddt", "dA", "dB", "dC", "dD", "dbias"],
                            g_p, g_a):
        gp, ga = np.asarray(gp), np.asarray(ga)
        scale = np.abs(ga).max() + 1e-6
        assert np.abs(gp - ga).max() / scale < 1e-3, name


def test_pallas_tau_chunk_fast_path_exact_in_range(monkeypatch):
    """tau=128 (= chunk): one segment per chunk, so the boundary machinery
    degenerates to a free lane-broadcast (the nseg==1 compact fast path).
    Exact only while |A * seg_sum(dt)| <= 2*CLIP = 160 per 128-step segment
    -- trained-magnitude dt; the host-side selector guards this. Here the
    magnitudes are kept in range and fwd + grads must match assoc on a
    multi-chunk L."""
    from medmamba_tpu.ops.pallas_scan import selective_scan_pallas
    monkeypatch.setenv("MEDMAMBA_SCAN_TAU", "128")

    rng = np.random.default_rng(19)
    b, d, n, g, l = 2, 8, 4, 2, 384
    u = rng.standard_normal((b, d, l)).astype(np.float32)
    delta = (0.01 * rng.standard_normal((b, d, l))).astype(np.float32)
    A = -np.exp(rng.standard_normal((d, n))).astype(np.float32)
    B = rng.standard_normal((b, g, n, l)).astype(np.float32)
    C = rng.standard_normal((b, g, n, l)).astype(np.float32)
    D = rng.standard_normal((d,)).astype(np.float32)
    bias = np.full((d,), -4.0, np.float32)  # dt ~ softplus(-4) ~ 0.018/step
    args = tuple(jnp.asarray(a) for a in (u, delta, A, B, C, D, bias))
    gyw = jnp.asarray(rng.standard_normal(u.shape).astype(np.float32))

    def loss(fn):
        def f(a):
            y = fn(a[0], a[1], a[2], a[3], a[4], a[5], delta_bias=a[6],
                   delta_softplus=True)
            return jnp.sum(y * gyw)
        return f

    g_p = jax.grad(loss(selective_scan_pallas))(args)
    monkeypatch.delenv("MEDMAMBA_SCAN_TAU")
    g_a = jax.grad(loss(selective_scan_assoc))(args)
    for name, gp, ga in zip(["du", "ddt", "dA", "dB", "dC", "dD", "dbias"],
                            g_p, g_a):
        gp, ga = np.asarray(gp), np.asarray(ga)
        scale = np.abs(ga).max() + 1e-6
        assert np.abs(gp - ga).max() / scale < 1e-4, name


def test_cross_scan_noflip_roundtrip():
    """flip=False cross_scan + a manual per-direction reversal reproduces the
    flipped cross_scan exactly; merge with flipped=False matches the default
    merge of flipped outputs."""
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 3)).astype(np.float32))
    xs_flip = np.asarray(cross_scan(x, flip=True))
    xs_noflip = np.asarray(cross_scan(x, flip=False))
    np.testing.assert_array_equal(xs_noflip[:, 2:], xs_noflip[:, :2])
    np.testing.assert_array_equal(xs_flip[:, 2:], xs_noflip[:, 2:][..., ::-1])

    ys = rng.standard_normal((2, 4, 3, 24)).astype(np.float32)
    merged_flipped = np.asarray(cross_merge(jnp.asarray(ys), 4, 6))
    ys_buffer = ys.copy()
    ys_buffer[:, 2:] = ys_buffer[:, 2:][..., ::-1]  # pre-unflipped outputs
    merged_buffer = np.asarray(
        cross_merge(jnp.asarray(ys_buffer), 4, 6, flipped=False))
    np.testing.assert_allclose(merged_buffer, merged_flipped, atol=1e-6)


def test_pallas_sorted_mixed_dirs_single_launch_matches_assoc():
    """The SS2D direction layout (False, False, True, True) runs as ONE
    Pallas launch with per-group reverse branches; it must match the
    explicit flip-scan-unflip reference, forward and gradients."""
    from medmamba_tpu.ops.selective_scan import _flip_group_seqs, _flip_y
    rng = np.random.default_rng(21)
    # l not a multiple of the chunk: exercises the pad-mask branch per group
    u, delta, A, B, C, D, bias = _mk(rng, b=2, d=16, n=8, l=200)
    flags = (False, False, True, True)
    args = tuple(jnp.asarray(a) for a in (u, delta, A, B, C, D, bias))

    def ref(a):
        uf, df, Bf, Cf = _flip_group_seqs(a[0], a[1], a[3], a[4], flags)
        y = selective_scan_assoc(uf, df, a[2], Bf, Cf, a[5], delta_bias=a[6],
                                 delta_softplus=True)
        return _flip_y(y, 4, flags)

    def fused(a):
        return selective_scan(a[0], a[1], a[2], a[3], a[4], a[5],
                              delta_bias=a[6], delta_softplus=True,
                              impl="pallas", reverse_dirs=flags)

    np.testing.assert_allclose(np.asarray(fused(args)), np.asarray(ref(args)),
                               rtol=1e-3, atol=3e-3)
    gyw = jnp.asarray(rng.standard_normal(u.shape).astype(np.float32))
    g_f = jax.grad(lambda a: jnp.sum(fused(a) * gyw))(args)
    g_r = jax.grad(lambda a: jnp.sum(ref(a) * gyw))(args)
    for name, gf, gr in zip(["du", "ddt", "dA", "dB", "dC", "dD", "dbias"],
                            g_f, g_r):
        scale = np.abs(np.asarray(gr)).max() + 1e-6
        assert np.abs(np.asarray(gf) - np.asarray(gr)).max() / scale < 2e-3, \
            name


@pytest.mark.parametrize("l", [96, 49])
def test_pallas_shared_u_tile_matches_materialized(l):
    """u_tile=2 (scan group k reads u group k % 2 through the kernel index
    maps) must match passing the duplicated u explicitly -- fwd and grads,
    including the packed short-L path (l=49)."""
    rng = np.random.default_rng(22)
    _, delta, A, B, C, D, bias = _mk(rng, b=4, d=16, n=8, l=l)
    u_half = rng.standard_normal((4, 8, l)).astype(np.float32)
    flags = (False, False, True, True)
    args = tuple(jnp.asarray(a) for a in
                 (u_half, delta, A, B, C, D, bias))

    def tiled(a):
        return selective_scan(a[0], a[1], a[2], a[3], a[4], a[5],
                              delta_bias=a[6], delta_softplus=True,
                              impl="pallas", reverse_dirs=flags, u_tile=2)

    def materialized(a):
        u_full = jnp.concatenate([a[0], a[0]], axis=1)
        return selective_scan(u_full, a[1], a[2], a[3], a[4], a[5],
                              delta_bias=a[6], delta_softplus=True,
                              impl="pallas", reverse_dirs=flags)

    np.testing.assert_allclose(np.asarray(tiled(args)),
                               np.asarray(materialized(args)),
                               rtol=1e-5, atol=1e-5)
    gyw = jnp.asarray(rng.standard_normal((4, 16, l)).astype(np.float32))
    g_t = jax.grad(lambda a: jnp.sum(tiled(a) * gyw))(args)
    g_m = jax.grad(lambda a: jnp.sum(materialized(a) * gyw))(args)
    for name, gt, gm in zip(["du", "ddt", "dA", "dB", "dC", "dD", "dbias"],
                            g_t, g_m):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gm),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_pallas_out_dtype_bf16_bit_identical_to_external_cast():
    """out_dtype=bf16 (kernel emits the block dtype) must equal computing
    fp32 then casting -- the values pass through one identical rounding
    either way. Cotangent dtypes follow the bf16 inputs in both cases."""
    rng = np.random.default_rng(31)
    u, delta, A, B, C, D, bias = _mk(rng, b=2, d=16, n=8, l=96)
    ub = jnp.asarray(u).astype(jnp.bfloat16)
    db = jnp.asarray(delta).astype(jnp.bfloat16)
    Bb_ = jnp.asarray(B).astype(jnp.bfloat16)
    Cb = jnp.asarray(C).astype(jnp.bfloat16)
    args = (ub, db, jnp.asarray(A), Bb_, Cb, jnp.asarray(D),
            jnp.asarray(bias))

    def direct(a):
        return selective_scan(a[0], a[1], a[2], a[3], a[4], a[5],
                              delta_bias=a[6], delta_softplus=True,
                              impl="pallas", out_dtype=jnp.bfloat16)

    def cast_after(a):
        y = selective_scan(a[0], a[1], a[2], a[3], a[4], a[5],
                           delta_bias=a[6], delta_softplus=True,
                           impl="pallas")
        return y.astype(jnp.bfloat16)

    y_d, y_c = direct(args), cast_after(args)
    assert y_d.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(y_d, np.float32),
                                  np.asarray(y_c, np.float32))
    gyw = jnp.asarray(rng.standard_normal((2, 16, 96)).astype(np.float32))
    g_d = jax.grad(lambda a: jnp.sum(direct(a).astype(jnp.float32) * gyw))(
        args)
    g_c = jax.grad(lambda a: jnp.sum(cast_after(a).astype(jnp.float32)
                                     * gyw))(args)
    for name, gd, gc in zip(["du", "ddt", "dA", "dB", "dC", "dD", "dbias"],
                            g_d, g_c):
        assert gd.dtype == gc.dtype, name
        # same math, one rounding point moved inside the kernel: tiny diffs
        np.testing.assert_allclose(np.asarray(gd, np.float32),
                                   np.asarray(gc, np.float32),
                                   rtol=2e-2, atol=1e-3, err_msg=name)


@pytest.mark.parametrize("impl", ["assoc", "pallas"])
def test_valid_len_prepadded_matches_unpadded(impl):
    """Pre-padded arrays + valid_len must equal scanning the unpadded arrays
    (the wrapper's own padding), forward and reverse directions, fwd + grad."""
    rng = np.random.default_rng(41)
    l, lp = 200, 256
    u, delta, A, B, C, D, bias = _mk(rng, b=2, d=16, n=8, l=l)

    def padl(x):
        return jnp.pad(jnp.asarray(x), ((0, 0),) * (x.ndim - 1)
                       + ((0, lp - l),))

    flags = (False, False, True, True)
    args_p = (padl(u), padl(delta), jnp.asarray(A), padl(B), padl(C),
              jnp.asarray(D), jnp.asarray(bias))
    args_u = tuple(jnp.asarray(a) for a in (u, delta, A, B, C, D, bias))

    def padded(a):
        y = selective_scan(a[0], a[1], a[2], a[3], a[4], a[5],
                           delta_bias=a[6], delta_softplus=True, impl=impl,
                           reverse_dirs=flags, valid_len=l)
        return y[..., :l]

    def unpadded(a):
        return selective_scan(a[0], a[1], a[2], a[3], a[4], a[5],
                              delta_bias=a[6], delta_softplus=True,
                              impl=impl, reverse_dirs=flags)

    np.testing.assert_allclose(np.asarray(padded(args_p)),
                               np.asarray(unpadded(args_u)),
                               rtol=1e-5, atol=1e-5)
    gyw = jnp.asarray(rng.standard_normal((2, 16, l)).astype(np.float32))
    g_p = jax.grad(lambda a: jnp.sum(padded(a) * gyw))(args_p)
    g_u = jax.grad(lambda a: jnp.sum(unpadded(a) * gyw))(args_u)
    for name, gp, gu in zip(["du", "ddt", "dA", "dB", "dC", "dD", "dbias"],
                            g_p, g_u):
        gp = np.asarray(gp)
        if gp.ndim and gp.shape[-1] == lp:
            # pad-position cotangents must be exactly zero
            np.testing.assert_array_equal(gp[..., l:], 0.0)
            gp = gp[..., :l]
        np.testing.assert_allclose(gp, np.asarray(gu), rtol=1e-4,
                                   atol=1e-5, err_msg=name)


def test_valid_len_hillis_fallback(monkeypatch):
    """The hillis fallback kernel realizes reverse_dirs by flipping, which
    moves the pad to the sequence FRONT for flagged groups: valid_len must
    force dt = 0 there BEFORE the flip (regression: the recursion used to
    drop valid_len entirely)."""
    from medmamba_tpu.ops.pallas_scan import selective_scan_pallas
    from medmamba_tpu.ops.selective_scan import _flip_group_seqs, _flip_y
    monkeypatch.setenv("MEDMAMBA_SCAN_KERNEL", "hillis")

    rng = np.random.default_rng(51)
    l, lp = 200, 256
    u, delta, A, B, C, D, bias = _mk(rng, b=2, d=16, n=8, l=l)

    def padl(x):
        return jnp.pad(jnp.asarray(x), ((0, 0),) * (x.ndim - 1)
                       + ((0, lp - l),))

    flags = (False, False, True, True)
    y_h = selective_scan_pallas(
        padl(u), padl(delta), jnp.asarray(A), padl(B), padl(C),
        jnp.asarray(D), delta_bias=jnp.asarray(bias), delta_softplus=True,
        reverse_dirs=flags, valid_len=l)[..., :l]
    uf, df, Bf, Cf = _flip_group_seqs(jnp.asarray(u), jnp.asarray(delta),
                                      jnp.asarray(B), jnp.asarray(C), flags)
    y_r = _flip_y(selective_scan_assoc(uf, df, A, Bf, Cf, D, delta_bias=bias,
                                       delta_softplus=True), 4, flags)
    np.testing.assert_allclose(np.asarray(y_h), np.asarray(y_r),
                               rtol=1e-3, atol=3e-3)


def test_pallas_out_dtype_respected_on_interleaved_directions():
    """The arbitrarily-interleaved reverse_dirs pattern takes the two-call
    split path inside selective_scan_pallas; it must forward out_dtype so
    the documented dtype contract holds there too (round-3 review finding)."""
    rng = np.random.default_rng(37)
    u, delta, A, B, C, D, bias = _mk(rng, b=2, d=16, n=8, l=96, g=4)
    args = tuple(jnp.asarray(a) for a in (u, delta, A, B, C, D, bias))
    interleaved = (False, True, False, True)  # not a False-prefix pattern

    y = selective_scan(args[0], args[1], args[2], args[3], args[4], args[5],
                       delta_bias=args[6], delta_softplus=True,
                       impl="pallas", reverse_dirs=interleaved,
                       out_dtype=jnp.bfloat16)
    assert y.dtype == jnp.bfloat16
    y32 = selective_scan(args[0], args[1], args[2], args[3], args[4],
                         args[5], delta_bias=args[6], delta_softplus=True,
                         impl="pallas", reverse_dirs=interleaved)
    assert y32.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(y, np.float32),
                                  np.asarray(y32.astype(jnp.bfloat16),
                                             np.float32))


def test_pallas_n_split_partials_sum_to_full():
    """The mixed-tau n-split (SS2D "nsplit" spec) runs the kernel twice over
    disjoint state-dim subsets and adds the partial y's. With equal tau on
    both parts the sum must match the full-N call to fp32 reduction-order
    tolerance (y = sum_n C_n h_n; D*u injected into exactly one part), and
    gradients must flow through the split. Kernel-level companion of
    tests/test_tau_select.py::test_nsplit_model_matches_unsplit."""
    from medmamba_tpu.ops.pallas_scan import selective_scan_pallas

    rng = np.random.default_rng(41)
    u, delta, A, B, C, D, bias = _mk(rng, b=2, d=16, n=8, l=96, g=2)
    args = tuple(jnp.asarray(a) for a in (u, delta, A, B, C, D, bias))
    perm = (5, 2, 7, 0, 3, 6, 1, 4)
    hi, lo = list(perm[:4]), list(perm[4:])

    def full(a):
        return selective_scan_pallas(a[0], a[1], a[2], a[3], a[4], a[5],
                                     delta_bias=a[6], delta_softplus=True,
                                     tau=16)

    def split(a):
        y = selective_scan_pallas(a[0], a[1], a[2][:, hi], a[3][:, :, hi],
                                  a[4][:, :, hi], a[5], delta_bias=a[6],
                                  delta_softplus=True, tau=16)
        return y + selective_scan_pallas(a[0], a[1], a[2][:, lo],
                                         a[3][:, :, lo], a[4][:, :, lo],
                                         None, delta_bias=a[6],
                                         delta_softplus=True, tau=16)

    y_full, y_split = full(args), split(args)
    scale = np.abs(np.asarray(y_full)).max()
    assert np.abs(np.asarray(y_split) - np.asarray(y_full)).max() / scale < 1e-5

    g_full = jax.grad(lambda a: jnp.sum(full(a) ** 2))(args)
    g_split = jax.grad(lambda a: jnp.sum(split(a) ** 2))(args)
    for gf, gs in zip(g_full, g_split):
        s = np.abs(np.asarray(gf)).max() + 1e-6
        assert np.abs(np.asarray(gs) - np.asarray(gf)).max() / s < 2e-4


def test_pallas_n_split_with_valid_len_and_reverse():
    """n-split x valid_len x mixed reverse dirs -- the exact combination the
    224-input model runs under an nsplit spec (chunk-padded L, one forward
    and one reversed pair). Partials at equal tau must sum to the full call."""
    from medmamba_tpu.ops.pallas_scan import selective_scan_pallas

    rng = np.random.default_rng(43)
    l, lp = 200, 256
    u, delta, A, B, C, D, bias = _mk(rng, b=2, d=16, n=8, l=lp, g=2)
    # zero the pad region of the injected streams like SS2D's pre-padding
    for x in (u, delta, B, C):
        x[..., l:] = 0.0
    args = tuple(jnp.asarray(a) for a in (u, delta, A, B, C, D, bias))
    flags, perm = (False, True), (6, 1, 4, 3, 0, 7, 2, 5)
    hi, lo = list(perm[:4]), list(perm[4:])

    def full(a):
        return selective_scan_pallas(a[0], a[1], a[2], a[3], a[4], a[5],
                                     delta_bias=a[6], delta_softplus=True,
                                     tau=16, reverse_dirs=flags, valid_len=l)

    def split(a):
        y = selective_scan_pallas(a[0], a[1], a[2][:, hi], a[3][:, :, hi],
                                  a[4][:, :, hi], a[5], delta_bias=a[6],
                                  delta_softplus=True, tau=16,
                                  reverse_dirs=flags, valid_len=l)
        return y + selective_scan_pallas(a[0], a[1], a[2][:, lo],
                                         a[3][:, :, lo], a[4][:, :, lo],
                                         None, delta_bias=a[6],
                                         delta_softplus=True, tau=16,
                                         reverse_dirs=flags, valid_len=l)

    y_full, y_split = full(args), split(args)
    scale = np.abs(np.asarray(y_full)).max()
    assert np.abs(np.asarray(y_split) - np.asarray(y_full)).max() / scale < 1e-5

    g_full = jax.grad(lambda a: jnp.sum(full(a)[..., :l] ** 2))(args)
    g_split = jax.grad(lambda a: jnp.sum(split(a)[..., :l] ** 2))(args)
    for gf, gs in zip(g_full, g_split):
        s = np.abs(np.asarray(gf)).max() + 1e-6
        assert np.abs(np.asarray(gs) - np.asarray(gf)).max() / s < 2e-4


def _two_launch_nsplit(a, perm, m, tau_hi, tau_lo, **kw):
    """Reference realization of an nsplit: one kernel launch per part."""
    from medmamba_tpu.ops.pallas_scan import selective_scan_pallas

    hi, lo = list(perm[:m]), list(perm[m:])
    y = selective_scan_pallas(a[0], a[1], a[2][:, hi], a[3][:, :, hi],
                              a[4][:, :, hi], a[5], delta_bias=a[6],
                              delta_softplus=True, tau=tau_hi, **kw)
    return y + selective_scan_pallas(
        a[0], a[1], a[2][:, lo], a[3][:, :, lo], a[4][:, :, lo], None,
        delta_bias=a[6], delta_softplus=True, tau=tau_lo, **kw).astype(y.dtype)


def _fused_nsplit(a, perm, m, tau_hi, tau_lo, **kw):
    """Fused realization: ONE launch, lanes permuted, tau=(m, tau_hi, tau_lo)."""
    from medmamba_tpu.ops.pallas_scan import selective_scan_pallas

    p = list(perm)
    return selective_scan_pallas(a[0], a[1], a[2][:, p], a[3][:, :, p],
                                 a[4][:, :, p], a[5], delta_bias=a[6],
                                 delta_softplus=True, tau=(m, tau_hi, tau_lo),
                                 **kw)


def _assert_close(ya, yb, tol, l=None):
    ya, yb = np.asarray(ya, np.float32), np.asarray(yb, np.float32)
    if l is not None:
        ya, yb = ya[..., :l], yb[..., :l]
    scale = np.abs(ya).max()
    assert np.abs(yb - ya).max() / scale < tol


def test_pallas_nsplit_fused_matches_two_launch():
    """The fused mixed-tau kernel (one launch, tau=(m, tau_hi, tau_lo),
    lanes pre-permuted) must match the two-launch realization it replaces
    and the assoc oracle, for outputs AND gradients."""
    rng = np.random.default_rng(47)
    u, delta, A, B, C, D, bias = _mk(rng, b=2, d=16, n=8, l=256, g=2)
    args = tuple(jnp.asarray(a) for a in (u, delta, A, B, C, D, bias))
    perm, m = (5, 2, 7, 0, 3, 6, 1, 4), 4

    y_two = _two_launch_nsplit(args, perm, m, 32, 16)
    y_fused = _fused_nsplit(args, perm, m, 32, 16)
    _assert_close(y_two, y_fused, 1e-5)
    y_oracle = selective_scan_assoc(*args[:6], delta_bias=args[6],
                                    delta_softplus=True)
    _assert_close(y_oracle, y_fused, 2e-4)

    g_two = jax.grad(lambda a: jnp.sum(
        _two_launch_nsplit(a, perm, m, 32, 16) ** 2))(args)
    g_fused = jax.grad(lambda a: jnp.sum(
        _fused_nsplit(a, perm, m, 32, 16) ** 2))(args)
    for gt, gf in zip(g_two, g_fused):
        s = np.abs(np.asarray(gt)).max() + 1e-6
        assert np.abs(np.asarray(gf) - np.asarray(gt)).max() / s < 2e-4


def test_pallas_nsplit_fused_valid_len_reverse():
    """Fused nsplit x valid_len x mixed reverse dirs -- the production
    combination (chunk-padded L, one forward and one reversed pair)."""
    rng = np.random.default_rng(48)
    l, lp = 200, 256
    u, delta, A, B, C, D, bias = _mk(rng, b=2, d=16, n=8, l=lp, g=2)
    for x in (u, delta, B, C):
        x[..., l:] = 0.0
    args = tuple(jnp.asarray(a) for a in (u, delta, A, B, C, D, bias))
    flags, perm, m = (False, True), (6, 1, 4, 3, 0, 7, 2, 5), 4
    kw = dict(reverse_dirs=flags, valid_len=l)

    y_two = _two_launch_nsplit(args, perm, m, 64, 16, **kw)
    y_fused = _fused_nsplit(args, perm, m, 64, 16, **kw)
    _assert_close(y_two, y_fused, 1e-5, l=l)

    g_two = jax.grad(lambda a: jnp.sum(
        _two_launch_nsplit(a, perm, m, 64, 16, **kw)[..., :l] ** 2))(args)
    g_fused = jax.grad(lambda a: jnp.sum(
        _fused_nsplit(a, perm, m, 64, 16, **kw)[..., :l] ** 2))(args)
    for gt, gf in zip(g_two, g_fused):
        s = np.abs(np.asarray(gt)).max() + 1e-6
        assert np.abs(np.asarray(gf) - np.asarray(gt)).max() / s < 2e-4


def test_pallas_nsplit_fused_packed_short_l():
    """Fused nsplit on the short-L batch-packed path (stage-4 shapes): the
    packing pitch snaps to tau_hi segments and both parts' reset masks
    decouple the packed elements."""
    rng = np.random.default_rng(49)
    u, delta, A, B, C, D, bias = _mk(rng, b=4, d=16, n=8, l=49, g=2)
    args = tuple(jnp.asarray(a) for a in (u, delta, A, B, C, D, bias))
    perm, m = (1, 4, 6, 2, 0, 3, 5, 7), 4

    y_fused = _fused_nsplit(args, perm, m, 32, 16)
    y_oracle = selective_scan_assoc(*args[:6], delta_bias=args[6],
                                    delta_softplus=True)
    _assert_close(y_oracle, y_fused, 2e-4)

    y_two = _two_launch_nsplit(args, perm, m, 32, 16)
    g_two = jax.grad(lambda a: jnp.sum(
        _two_launch_nsplit(a, perm, m, 32, 16) ** 2))(args)
    g_fused = jax.grad(lambda a: jnp.sum(
        _fused_nsplit(a, perm, m, 32, 16) ** 2))(args)
    _assert_close(y_two, y_fused, 1e-5)
    for gt, gf in zip(g_two, g_fused):
        s = np.abs(np.asarray(gt)).max() + 1e-6
        assert np.abs(np.asarray(gf) - np.asarray(gt)).max() / s < 2e-4


def test_pallas_nsplit_fused_bf16_out_dtype():
    """Fused nsplit with out_dtype=bf16 is bit-identical to casting the fp32
    fused output (the dtype-through contract)."""
    rng = np.random.default_rng(50)
    u, delta, A, B, C, D, bias = _mk(rng, b=2, d=16, n=8, l=128, g=2)
    args = tuple(jnp.asarray(a) for a in (u, delta, A, B, C, D, bias))
    perm, m = tuple(range(8)), 4

    y32 = _fused_nsplit(args, perm, m, 64, 32)
    y16 = _fused_nsplit(args, perm, m, 64, 32, out_dtype=jnp.bfloat16)
    assert y16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(y16, np.float32),
        np.asarray(y32.astype(jnp.bfloat16), np.float32))


@pytest.mark.parametrize("variant", ["col", "shift", "scan"])
def test_pallas_nseg2_boundary_variants_match_assoc(variant, monkeypatch):
    """The 2-segment boundary recurrence (tau = chunk/2 -- the production
    lo-part regime of the mixed-tau n-split) has three lowerings
    (MEDMAMBA_SCAN_NSEG2): col (per-segment column extracts, default),
    shift (fold + one shift + select), scan (the generic doubling
    machinery). All must match assoc -- fwd + grads, mixed reverse dirs,
    multi-chunk L with valid_len, and the packed short-L pitch==tau case."""
    from medmamba_tpu.ops.pallas_scan import selective_scan_pallas
    monkeypatch.setenv("MEDMAMBA_SCAN_NSEG2", variant)

    rng = np.random.default_rng(61)
    l, lp = 200, 256
    u, delta, A, B, C, D, bias = _mk(rng, b=2, d=16, n=8, l=lp, g=2)
    # keep |A|*seg_sum(dt) inside the clip budget at tau=64 (trained-
    # magnitude regime the selector guards; cf. the tau=128 fast-path test)
    delta *= 0.03
    bias[:] = -4.0
    for x in (u, delta, B, C):
        x[..., l:] = 0.0
    args = tuple(jnp.asarray(a) for a in (u, delta, A, B, C, D, bias))
    flags = (False, True)

    def fused(a):
        return selective_scan_pallas(a[0], a[1], a[2], a[3], a[4], a[5],
                                     delta_bias=a[6], delta_softplus=True,
                                     tau=64, reverse_dirs=flags, valid_len=l)

    def ref(a):
        from medmamba_tpu.ops.selective_scan import selective_scan
        return selective_scan(a[0], a[1], a[2], a[3], a[4], a[5],
                              delta_bias=a[6], delta_softplus=True,
                              impl="assoc", reverse_dirs=flags, valid_len=l)

    _assert_close(ref(args), fused(args), 1e-4, l=l)
    g_f = jax.grad(lambda a: jnp.sum(fused(a)[..., :l] ** 2))(args)
    g_r = jax.grad(lambda a: jnp.sum(ref(a)[..., :l] ** 2))(args)
    for name, gf, gr in zip(["du", "ddt", "dA", "dB", "dC", "dD", "dbias"],
                            g_f, g_r):
        s = np.abs(np.asarray(gr)).max() + 1e-6
        assert np.abs(np.asarray(gf) - np.asarray(gr)).max() / s < 2e-3, name

    # packed pitch == tau (stage-4 auto regime: L=49 at tau=64, 2 elements
    # per 128-lane chunk, every segment an element boundary)
    up, dp, Ap, Bp, Cp, Dp, bp = _mk(rng, b=4, d=16, n=8, l=49, g=2)
    dp *= 0.03
    bp[:] = -4.0
    argsp = tuple(jnp.asarray(a) for a in (up, dp, Ap, Bp, Cp, Dp, bp))

    def packed(a):
        return selective_scan_pallas(a[0], a[1], a[2], a[3], a[4], a[5],
                                     delta_bias=a[6], delta_softplus=True,
                                     tau=64, reverse_dirs=(False, True))

    y_p = packed(argsp)
    y_o = selective_scan(argsp[0], argsp[1], argsp[2], argsp[3], argsp[4],
                         argsp[5], delta_bias=argsp[6], delta_softplus=True,
                         impl="assoc", reverse_dirs=(False, True))
    _assert_close(y_o, y_p, 1e-4)
    g_p = jax.grad(lambda a: jnp.sum(packed(a) ** 2))(argsp)
    g_o = jax.grad(lambda a: jnp.sum(selective_scan(
        a[0], a[1], a[2], a[3], a[4], a[5], delta_bias=a[6],
        delta_softplus=True, impl="assoc",
        reverse_dirs=(False, True)) ** 2))(argsp)
    for name, gf, gr in zip(["du", "ddt", "dA", "dB", "dC", "dD", "dbias"],
                            g_p, g_o):
        s = np.abs(np.asarray(gr)).max() + 1e-6
        assert np.abs(np.asarray(gf) - np.asarray(gr)).max() / s < 2e-3, name


def test_nseg2_auto_policy(monkeypatch):
    """The measured auto policy (DESIGN round 4): generic scan lowering for
    the 2-segment boundary except the packed pitch==tau case, where the
    column form wins 32%; env forces either."""
    from medmamba_tpu.ops.pallas_scan import _nseg2_impl

    monkeypatch.delenv("MEDMAMBA_SCAN_NSEG2", raising=False)
    assert _nseg2_impl(None, 64) == "scan"      # unpacked
    assert _nseg2_impl(128, 64) == "scan"       # packed, pitch != tau
    assert _nseg2_impl(64, 64) == "col"         # packed, pitch == tau
    monkeypatch.setenv("MEDMAMBA_SCAN_NSEG2", "shift")
    assert _nseg2_impl(64, 64) == "shift"
    monkeypatch.setenv("MEDMAMBA_SCAN_NSEG2", "cols")  # typo'd value
    with pytest.raises(ValueError, match="MEDMAMBA_SCAN_NSEG2"):
        _nseg2_impl(64, 64)


def test_ablation_env_guard(monkeypatch):
    """User-facing CLIs refuse a leaked MEDMAMBA_SCAN_ABLATE (ADVICE r4):
    the stubs break numerics and are for ledger timing only."""
    from medmamba_tpu.ops.pallas_scan import guard_ablation_unset

    monkeypatch.delenv("MEDMAMBA_SCAN_ABLATE", raising=False)
    monkeypatch.delenv("MEDMAMBA_SCAN_ABLATE_OK", raising=False)
    guard_ablation_unset()                       # unset: fine
    monkeypatch.setenv("MEDMAMBA_SCAN_ABLATE", "ehalf")
    with pytest.raises(RuntimeError, match="MEDMAMBA_SCAN_ABLATE"):
        guard_ablation_unset()
    monkeypatch.setenv("MEDMAMBA_SCAN_ABLATE_OK", "1")
    guard_ablation_unset()                       # explicit opt-in
