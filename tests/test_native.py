import os

import numpy as np
import pytest
from PIL import Image

from medmamba_tpu.data import native


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native lib not built")


@needs_native
def test_gather_matches_numpy():
    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, (20, 5, 5, 3), np.uint8)
    idx = np.array([3, 0, 19, 7])
    out = native.gather_u8(src, idx)
    np.testing.assert_array_equal(out, src[idx])


@needs_native
def test_decode_resize_matches_pil_within_1lsb(tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    for i, (h, w, ext) in enumerate([(37, 53, "png"), (64, 64, "jpg"),
                                     (100, 40, "png")]):
        arr = rng.integers(0, 256, (h, w, 3), np.uint8)
        p = str(tmp_path / f"x{i}.{ext}")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
    out = native.batch_decode_resize(paths, 32)
    assert out is not None and out.shape == (3, 32, 32, 3)
    # PNG round-trips losslessly: the triangle-filter resize must match PIL
    # BILINEAR within rounding.
    for i in (0, 2):
        pil = np.asarray(Image.open(paths[i]).resize((32, 32), Image.BILINEAR))
        assert np.abs(out[i].astype(int) - pil.astype(int)).max() <= 1


@needs_native
def test_decode_failure_falls_back(tmp_path):
    bad = str(tmp_path / "bad.png")
    with open(bad, "wb") as f:
        f.write(b"not an image")
    assert native.batch_decode_resize([bad], 32) is None


@needs_native
def test_grayscale_and_palette_png(tmp_path):
    g = str(tmp_path / "gray.png")
    Image.fromarray(np.arange(64, dtype=np.uint8).reshape(8, 8), "L").save(g)
    out = native.batch_decode_resize([g], 8)
    assert out is not None and out.shape == (1, 8, 8, 3)
    # gray promoted to identical RGB channels
    assert (out[0, :, :, 0] == out[0, :, :, 1]).all()
