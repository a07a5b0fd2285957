import numpy as np
import jax
import jax.numpy as jnp

from medmamba_tpu.models.vit import VisionTransformer, vit_reshape_transform
from medmamba_tpu.models.swin import SwinTransformer
from medmamba_tpu.models.mobilenet import MobileNetV2, _make_divisible


def test_vit_tiny_forward():
    m = VisionTransformer(img_size=32, patch_size=8, embed_dim=32, depth=2,
                          num_heads=2, num_classes=7)
    x = jnp.zeros((2, 32, 32, 3))
    v = m.init({"params": jax.random.key(0)}, x, True)
    y = m.apply(v, x, True)
    assert y.shape == (2, 7)
    # reshape transform drops cls token
    tokens = jnp.zeros((2, 17, 32))
    assert vit_reshape_transform(tokens, grid=4).shape == (2, 4, 4, 32)


def test_swin_tiny_forward():
    m = SwinTransformer(patch_size=4, embed_dim=24, depths=(1, 1),
                        num_heads=(2, 4), window_size=4, num_classes=5)
    x = jnp.zeros((2, 32, 32, 3))
    v = m.init({"params": jax.random.key(0)}, x, True)
    y = m.apply(v, x, True)
    assert y.shape == (2, 5)


def test_swin_shifted_window_runs():
    # depths=(2,) gives one shifted block (shift_size=ws//2) on an 8x8 grid
    m = SwinTransformer(patch_size=4, embed_dim=16, depths=(2,),
                        num_heads=(2,), window_size=4, num_classes=3)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((1, 32, 32, 3)).astype(np.float32))
    v = m.init({"params": jax.random.key(0)}, x, True)
    y = m.apply(v, x, True)
    assert np.isfinite(np.asarray(y)).all()


def test_mobilenet_v2():
    assert _make_divisible(32 * 0.75) == 24
    m = MobileNetV2(num_classes=4, alpha=0.35)
    x = jnp.zeros((1, 32, 32, 3))
    v = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x)
    y = m.apply(v, x)
    assert y.shape == (1, 4)
    assert "batch_stats" in v
