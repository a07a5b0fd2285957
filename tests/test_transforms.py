import numpy as np
import jax
import jax.numpy as jnp

from medmamba_tpu.data.transforms import (_rotate_nearest, normalize,
                                          preprocess, random_augment, resize)


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


def test_rotate_pallas_matches_exact_gather():
    """The Pallas rotate kernel (ops/rotate_pallas.py) vs the exact inverse-map
    gather: zero-angle and flip paths exact; small angles differ on <=~4% of
    pixels (the documented 2-pass separability approximation)."""
    from medmamba_tpu.ops.rotate_pallas import rotate_flip_pallas

    rng = np.random.default_rng(3)
    for size in (28, 48):
        x = jnp.asarray(rng.standard_normal((4, size, size, 3))
                        .astype(np.float32))
        angles = jnp.asarray(
            rng.uniform(-0.1745, 0.1745, (4,)).astype(np.float32))
        out = np.asarray(rotate_flip_pallas(
            x, angles, jnp.zeros(4, bool), max_rad=0.1745))
        ref = np.asarray(jax.vmap(_rotate_nearest)(x, angles))
        mism = (np.abs(out - ref) > 1e-6).any(-1).mean()
        assert mism <= 0.05, f"size={size}: {mism:.3f} of pixels differ"
        # flip + zero angle must be bit-exact
        out0 = np.asarray(rotate_flip_pallas(
            x, jnp.zeros(4), jnp.ones(4, bool), max_rad=0.1745))
        np.testing.assert_array_equal(out0, np.asarray(x)[:, :, ::-1, :])
