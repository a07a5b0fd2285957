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


@needs_native
def test_fast_decode_close_to_exact_and_safe(tmp_path):
    """DCT-scaled JPEG decode (fast=True): close to the exact path on
    smooth content, bit-identical for PNGs and for JPEGs smaller than the
    target (scale stays 8/8), and never returns a smaller-than-target
    decode (the resize only ever downsamples)."""
    yy, xx = np.mgrid[0:300, 0:300]
    smooth = np.clip(120 + 60 * np.sin(xx / 40) + 50 * np.cos(yy / 33),
                     0, 255).astype(np.uint8)
    smooth = np.stack([smooth] * 3, -1)
    jpg = str(tmp_path / "s.jpg")
    Image.fromarray(smooth).save(jpg, quality=90)
    png = str(tmp_path / "s.png")
    Image.fromarray(smooth).save(png)
    small = str(tmp_path / "small.jpg")  # 20px < target: upscale case
    Image.fromarray(smooth[:20, :20]).save(small, quality=90)

    exact = native.batch_decode_resize([jpg, png, small], 64, fast=False)
    fast = native.batch_decode_resize([jpg, png, small], 64, fast=True)
    assert exact is not None and fast is not None
    # large jpeg: small deviation allowed
    d = np.abs(exact[0].astype(int) - fast[0].astype(int))
    assert d.mean() < 1.0 and d.max() <= 16, (d.mean(), d.max())
    # png: decode path untouched -> identical
    np.testing.assert_array_equal(exact[1], fast[1])
    # jpeg below target size: scale selection must stay at full resolution
    np.testing.assert_array_equal(exact[2], fast[2])


@needs_native
def test_fast_decode_env_default(monkeypatch, tmp_path):
    """fast=None follows MEDMAMBA_FAST_DECODE (the --fast_decode CLI flag)."""
    arr = np.full((100, 100, 3), 128, np.uint8)
    p = str(tmp_path / "f.jpg")
    Image.fromarray(arr).save(p, quality=90)
    monkeypatch.setenv("MEDMAMBA_FAST_DECODE", "1")
    a = native.batch_decode_resize([p], 32)
    monkeypatch.delenv("MEDMAMBA_FAST_DECODE")
    b = native.batch_decode_resize([p], 32, fast=True)
    np.testing.assert_array_equal(a, b)
