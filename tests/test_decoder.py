import numpy as np
import jax
import jax.numpy as jnp

from medmamba_tpu.models.decoder import (FinalPatchExpand2D, PatchExpand2D,
                                         VSSMSeg)


def test_patch_expand_shapes():
    x = jnp.zeros((2, 4, 4, 16))
    m = PatchExpand2D()
    v = m.init(jax.random.key(0), x)
    assert m.apply(v, x).shape == (2, 8, 8, 8)
    f = FinalPatchExpand2D()
    vf = f.init(jax.random.key(0), x)
    assert f.apply(vf, x).shape == (2, 16, 16, 4)


def _ln(z, scale, bias, eps=1e-5):
    mu = z.mean(-1, keepdims=True)
    var = z.var(-1, keepdims=True)
    return (z - mu) / np.sqrt(var + eps) * scale + bias


def test_patch_expand_channel_to_space_order():
    """Numeric check of the '(p1 p2 c) -> (h p1) (w p2) c' placement against
    an independent einops computation (reference semantics, temp.py:224)."""
    import einops

    rng = np.random.default_rng(0)
    for cls, p in ((PatchExpand2D, 2), (FinalPatchExpand2D, 4)):
        c = 16
        x = rng.standard_normal((2, 3, 5, c)).astype(np.float32)
        m = cls()
        v = m.init(jax.random.key(0), jnp.asarray(x))
        y = np.asarray(m.apply(v, jnp.asarray(x)))

        k = np.asarray(v["params"]["expand"]["kernel"])          # (c, p*c)
        z = x @ k
        z = einops.rearrange(z, "b h w (p1 p2 c) -> b (h p1) (w p2) c",
                             p1=p, p2=p)
        expected = _ln(z, np.asarray(v["params"]["norm"]["scale"]),
                       np.asarray(v["params"]["norm"]["bias"]))
        np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-5)


def test_vssm_seg_forward():
    m = VSSMSeg(num_classes=3, depths=(1, 1), depths_decoder=(1, 1),
                dims=(8, 16), d_state=4, scan_impl="seq")
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((1, 32, 32, 3)).astype(np.float32))
    v = m.init({"params": jax.random.key(0)}, x, True)
    y = m.apply(v, x, True)
    assert y.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(y)).all()
