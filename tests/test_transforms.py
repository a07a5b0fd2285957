import math

import numpy as np
import jax
import jax.numpy as jnp

from medmamba_tpu.data.transforms import (_rotate_nearest, _rotate_shear,
                                          normalize, preprocess,
                                          random_augment, resize)


def test_normalize_range():
    x = jnp.asarray(np.array([[[[0], [255]]]], np.uint8))
    y = normalize(x)
    np.testing.assert_allclose(np.asarray(y).ravel(), [-1.0, 1.0], atol=1e-6)


def test_resize_upsample_shape():
    x = jnp.zeros((2, 28, 28, 3))
    assert resize(x, 224).shape == (2, 224, 224, 3)
    assert resize(x, 28) is x  # no-op fast path


def test_rotate_identity_and_180():
    img = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((7, 7, 3)).astype(np.float32))
    out0 = _rotate_nearest(img, jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(out0), np.asarray(img))
    out180 = _rotate_nearest(img, jnp.float32(np.pi))
    np.testing.assert_allclose(np.asarray(out180),
                               np.asarray(img)[::-1, ::-1], atol=1e-5)


def test_shear_rotation_matches_exact_nearest():
    """The production 3-shear rotation (row-slice gathers; the per-pixel
    gather ran on the TPU scalar path at 32 ms/step) must agree with the
    exact inverse-map nearest rotation up to single-pixel resampling
    disagreements on a smooth image."""
    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([yy / h, xx / w, (yy + xx) / (h + w)], -1)
    px = 1.0 / h  # one-pixel step of the gradient
    for deg in (0.0, 4.0, -9.5, 9.9):
        a = math.radians(deg)
        exact = np.asarray(_rotate_nearest(jnp.asarray(img), jnp.float32(a)))
        shear = np.asarray(_rotate_shear(
            jnp.asarray(img)[None], jnp.asarray([a]), math.radians(10.0)))[0]
        d = np.abs(exact[8:-8, 8:-8] - shear[8:-8, 8:-8])
        assert d.max() <= px + 1e-6, (deg, d.max())
    # identity at angle 0 including borders
    out0 = np.asarray(_rotate_shear(jnp.asarray(img)[None],
                                    jnp.asarray([0.0]), math.radians(10.0)))[0]
    np.testing.assert_array_equal(out0, img)


def test_random_augment_flip_only():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 6, 6, 3)).astype(np.float32))
    y = np.asarray(random_augment(jax.random.key(0), x, max_rotate_deg=0.0))
    xn = np.asarray(x)
    flipped = 0
    for i in range(8):
        if np.allclose(y[i], xn[i]):
            continue
        assert np.allclose(y[i], xn[i, :, ::-1, :])
        flipped += 1
    assert 0 < flipped < 8  # some flipped, some not (p=0.5 over 8 samples)


def test_preprocess_deterministic_eval():
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.integers(0, 256, (2, 28, 28, 3), np.int64)
                       .astype(np.uint8))
    a = preprocess(jax.random.key(0), imgs, size=32, augment=False)
    b = preprocess(jax.random.key(1), imgs, size=32, augment=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape == (2, 32, 32, 3) and a.dtype == jnp.float32
