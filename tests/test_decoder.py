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


def test_patch_expand_channel_to_space_order():
    """Each output 2x2 block comes from one input pixel's channel groups."""
    x = jnp.arange(2 * 2 * 8, dtype=jnp.float32).reshape(1, 2, 2, 8)
    m = PatchExpand2D()
    v = m.init(jax.random.key(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 4, 4, 4)


def test_vssm_seg_forward():
    m = VSSMSeg(num_classes=3, depths=(1, 1), depths_decoder=(1, 1),
                dims=(8, 16), d_state=4, scan_impl="seq")
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((1, 32, 32, 3)).astype(np.float32))
    v = m.init({"params": jax.random.key(0)}, x, True)
    y = m.apply(v, x, True)
    assert y.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(y)).all()
