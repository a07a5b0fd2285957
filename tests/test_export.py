"""Deployment export (utils/export.py): StableHLO round-trip on CPU.

The artifact must reproduce the live eval forward exactly, with weights and
preprocessing baked in, across batch sizes when exported with a symbolic
batch dim -- no model code or checkpoint at load time.
"""
import numpy as np
import jax
import jax.numpy as jnp

from medmamba_tpu.models.vssm import VSSM
from medmamba_tpu.utils.export import export_forward, load_exported


def _tiny():
    model = VSSM(num_classes=3, depths=(1, 1), dims=(16, 32), d_state=4,
                 drop_path_rate=0.0, scan_impl="assoc")
    rng = jax.random.key(0)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init({"params": rng}, x, True)
    return model, {"params": variables["params"],
                   "batch_stats": variables.get("batch_stats", {})}


def _live_probs(model, variables, images_u8, size):
    from medmamba_tpu.data.transforms import preprocess

    x = preprocess(jax.random.key(0), jnp.asarray(images_u8), size=size,
                   augment=False)
    return np.asarray(jax.nn.softmax(model.apply(variables, x, True), -1))


def test_export_roundtrip_polymorphic_batch():
    model, variables = _tiny()
    blob = export_forward(model, variables, image_size=32,
                          platforms=("cpu",))
    assert isinstance(blob, bytes) and len(blob) > 1000
    exp = load_exported(blob)
    rng = np.random.default_rng(0)
    for b in (1, 3):  # symbolic batch: one artifact, any batch size
        imgs = rng.integers(0, 256, (b, 32, 32, 3), dtype=np.uint8)
        got = np.asarray(exp.call(jnp.asarray(imgs)))
        want = _live_probs(model, variables, imgs, 32)
        assert got.shape == (b, 3)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_export_fixed_batch_no_preprocess():
    model, variables = _tiny()
    blob = export_forward(model, variables, image_size=32, batch=2,
                          platforms=("cpu",), with_preprocess=False)
    exp = load_exported(blob)
    x = np.random.default_rng(1).standard_normal((2, 32, 32, 3)).astype(
        np.float32)
    got = np.asarray(exp.call(jnp.asarray(x)))
    want = np.asarray(jax.nn.softmax(
        model.apply(variables, jnp.asarray(x), True), -1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_export_cli(tmp_path, monkeypatch):
    """CLI surface: save a checkpoint, export via the CLI, load, run."""
    import optax
    from medmamba_tpu.cli.export import main as export_main
    from medmamba_tpu.models import registry
    from medmamba_tpu.train import checkpoint as ckpt
    from medmamba_tpu.train.trainer import TrainState

    model, variables = _tiny()
    tx = optax.sgd(0.1)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]), tx=tx,
                       apply_fn=model.apply)
    path = str(tmp_path / "ck")
    ckpt.save_checkpoint(path, state, epoch=1, best_acc=0.5, num_classes=3,
                         class_indices={"a": 0, "b": 1, "c": 2})
    ckpt.wait_for_saves()
    # the CLI builds create_model(size); point it at the tiny architecture
    # the checkpoint actually holds
    monkeypatch.setattr(registry, "create_model",
                        lambda size, num_classes, **kw: model)
    out = str(tmp_path / "m.shlo")
    export_main(["--checkpoint_path", path, "--out", out,
                 "--image_size", "32", "--batch", "2",
                 "--platforms", "cpu"])
    exp = load_exported(open(out, "rb").read())
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    probs = np.asarray(exp.call(jnp.asarray(imgs)))
    np.testing.assert_allclose(probs, _live_probs(model, variables, imgs, 32),
                               rtol=1e-5, atol=1e-6)


def test_export_raw_frame_input_size():
    """input_size > image_size: the artifact accepts raw frames at the
    scanner resolution and bakes the resize in (review finding: the
    'raw frames' promise needs the input spec to say so)."""
    model, variables = _tiny()
    blob = export_forward(model, variables, image_size=32, input_size=48,
                          batch=2, platforms=("cpu",))
    exp = load_exported(blob)
    imgs = np.random.default_rng(4).integers(0, 256, (2, 48, 48, 3),
                                             dtype=np.uint8)
    got = np.asarray(exp.call(jnp.asarray(imgs)))
    want = _live_probs(model, variables, imgs, 32)  # preprocess resizes
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    import pytest
    with pytest.raises(ValueError):
        export_forward(model, variables, image_size=32, input_size=48,
                       batch=2, platforms=("cpu",), with_preprocess=False)
