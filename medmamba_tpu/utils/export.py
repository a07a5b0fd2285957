"""Deployment export: the eval forward as a serialized StableHLO artifact.

The reference deploys by shipping the .pth + the whole Python/torch stack
(README.md:19, app_streamlit_demo.py); the TPU-native deployment story is an
ahead-of-time artifact: ``jax.export`` serializes the jitted forward --
weights baked in as constants, preprocessing fused in, optionally with a
symbolic (polymorphic) batch dimension -- which a serving runtime loads with
``jax.export.deserialize`` (or any StableHLO consumer) without the model
code, flax, or the checkpoint.

The exported program uses the portable XLA associative-scan path by default
(``scan_impl='assoc'``): the artifact then runs on any platform jax lowers
for (cpu/tpu), and round-trips in CPU tests. Pass ``scan_impl='pallas'`` to
bake the Mosaic kernel into a TPU-only artifact instead (faster scan, not
portable, requires ``--platforms tpu``).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_forward(model, variables, *, image_size: int = 224,
                   batch: Optional[int] = None,
                   input_size: Optional[int] = None,
                   platforms: Sequence[str] = ("cpu", "tpu"),
                   with_preprocess: bool = True,
                   scan_impl: str = "assoc") -> bytes:
    """Serialize the eval forward (uint8 images -> class probabilities).

    batch=None exports a symbolic batch dimension (any batch size at call
    time); an int pins it. ``with_preprocess`` fuses the training-recipe
    preprocessing (resize to ``image_size`` + 0.5/0.5 normalize) so the
    artifact consumes raw uint8 (B, input_size, input_size, 3) frames --
    ``input_size`` is the FIXED spatial size the artifact accepts (StableHLO
    pins it; default = image_size, i.e. pre-resized inputs); pass the camera
    / scanner resolution to bake the resize in too.
    """
    from medmamba_tpu.data.transforms import preprocess

    export_model = model.clone(scan_impl=scan_impl)
    in_size = input_size or image_size
    if not with_preprocess and in_size != image_size:
        raise ValueError("input_size != image_size requires the baked-in "
                         "preprocess (it performs the resize)")

    def fwd(images):
        if with_preprocess:
            x = preprocess(jax.random.key(0), images, size=image_size,
                           augment=False)
        else:
            x = images.astype(jnp.float32)
        return jax.nn.softmax(export_model.apply(variables, x, True), -1)

    if batch is None:
        (b,) = jax_export.symbolic_shape("b")
        bdim = b
    else:
        bdim = batch
    in_dtype = jnp.uint8 if with_preprocess else jnp.float32
    spec = jax.ShapeDtypeStruct((bdim, in_size, in_size, 3), in_dtype)
    exp = jax_export.export(jax.jit(fwd), platforms=list(platforms))(spec)
    return bytes(exp.serialize())


def load_exported(blob: bytes):
    """Deserialize an exported artifact; returns an object with .call(images)."""
    return jax_export.deserialize(blob)
