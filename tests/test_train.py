import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from medmamba_tpu.data.datasets import NpzDataset, is_npz_dir, open_dataset
from medmamba_tpu.data.loader import BatchLoader
from medmamba_tpu.models.vssm import VSSM
from medmamba_tpu.train import checkpoint as ckpt
from medmamba_tpu.train.trainer import (eval_step, init_state, make_optimizer,
                                        train_step)


def _write_npz(tmpdir, split="train", n=32, hw=16, classes=2, gray=False):
    rng = np.random.default_rng(0)
    if gray:
        imgs = rng.integers(0, 256, (n, hw, hw), dtype=np.uint8)
    else:
        imgs = rng.integers(0, 256, (n, hw, hw, 3), dtype=np.uint8)
    labels = rng.integers(0, classes, (n, 1)).astype(np.int64)
    # make the task learnable: class sets mean brightness
    imgs = (imgs // 2 + (labels[:, 0] * 120)[:, None, None]
            .reshape((n,) + (1,) * (imgs.ndim - 1))).astype(np.uint8)
    np.save(os.path.join(tmpdir, f"{split}_images.npy"), imgs)
    np.save(os.path.join(tmpdir, f"{split}_labels.npy"), labels)


def _tiny_model():
    return VSSM(num_classes=2, depths=(1, 1), dims=(8, 16), d_state=4,
                drop_path_rate=0.0, scan_impl="seq")


def test_npz_dataset_semantics(tmp_path):
    _write_npz(str(tmp_path), gray=True)
    assert is_npz_dir(str(tmp_path), "train")
    ds = NpzDataset(str(tmp_path), "train")
    imgs, labels = ds.get_batch(np.arange(4))
    assert imgs.shape == (4, 16, 16, 3)  # grayscale promoted to RGB
    assert imgs.dtype == np.uint8 and labels.dtype == np.int64
    assert ds.get_num_classes() == 2
    assert ds.get_class_to_idx() == {"class_0": 0, "class_1": 1}


def test_loader_shuffles_deterministically(tmp_path):
    _write_npz(str(tmp_path))
    ds = NpzDataset(str(tmp_path), "train")
    ld = BatchLoader(ds, batch_size=8, shuffle=True, seed=7)
    a = [lbl.tolist() for _, lbl in ld.epoch(0)]
    b = [lbl.tolist() for _, lbl in ld.epoch(0)]
    c = [lbl.tolist() for _, lbl in ld.epoch(1)]
    assert a == b
    assert a != c
    assert len(a) == 4


def test_train_loss_decreases_and_eval(tmp_path):
    _write_npz(str(tmp_path), n=48, hw=16)
    ds = NpzDataset(str(tmp_path), "train")
    model = _tiny_model()
    tx = make_optimizer(3e-3, npz_mode=True)
    state = init_state(model, jax.random.key(0), tx, input_shape=(1, 16, 16, 3))
    ld = BatchLoader(ds, batch_size=16, shuffle=True, seed=0)
    rng = jax.random.key(1)
    losses = []
    for epoch in range(6):
        for images, labels in ld.epoch(epoch):
            state, loss = train_step(state, jnp.asarray(images),
                                     jnp.asarray(labels), rng,
                                     augment=False, image_size=16)
            losses.append(float(loss))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    imgs, labels = ds.get_batch(np.arange(16))
    correct, logits = eval_step(state, jnp.asarray(imgs), jnp.asarray(labels),
                                image_size=16)
    assert logits.shape == (16, 2)
    assert 0 <= int(correct) <= 16


def test_checkpoint_roundtrip(tmp_path):
    model = _tiny_model()
    tx = make_optimizer(1e-3, npz_mode=False)
    state = init_state(model, jax.random.key(0), tx, input_shape=(1, 16, 16, 3))
    x = jnp.asarray(np.random.default_rng(0)
                    .integers(0, 255, (4, 16, 16, 3), np.int64).astype(np.uint8))
    y = jnp.asarray(np.zeros(4, np.int64))
    state, _ = train_step(state, x, y, jax.random.key(1), augment=False,
                          image_size=16)

    path = os.path.join(str(tmp_path), "ckpt_epoch_1")
    ckpt.save_checkpoint(path, state, epoch=1, best_acc=0.5, num_classes=2,
                         class_indices={"a": 0, "b": 1})
    state2 = init_state(model, jax.random.key(42), tx,
                        input_shape=(1, 16, 16, 3))
    state2, meta = ckpt.restore_checkpoint(path, state2)
    assert meta["epoch"] == 1 and meta["best_acc"] == 0.5
    assert meta["class_indices"] == {"a": 0, "b": 1}
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(state2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restore_params (inference-side consumer)
    tree, meta2 = ckpt.restore_params(path)
    assert meta2["num_classes"] == 2
    assert "params" in tree


def test_multistep_schedule():
    tx = make_optimizer(1.0, npz_mode=True, epoch_schedule=[2, 4],
                        steps_per_epoch=10)
    params = {"w": jnp.zeros((3,))}
    opt_state = tx.init(params)
    lrs = []
    grads = {"w": jnp.ones((3,))}
    for step in range(60):
        updates, opt_state = tx.update(grads, opt_state, params)
        lrs.append(float(-updates["w"][0]))
    # lr drops by ~10x after steps 20 and 40 (epoch milestones 2 and 4)
    assert lrs[0] / lrs[25] == pytest.approx(10.0, rel=0.05)
    assert lrs[0] / lrs[55] == pytest.approx(100.0, rel=0.05)


def test_folder_dataset(tmp_path):
    from PIL import Image
    for cls in ["cat", "dog"]:
        d = tmp_path / cls
        d.mkdir()
        for i in range(3):
            Image.fromarray(
                np.full((20, 20, 3), 100 + i, np.uint8)).save(d / f"{i}.png")
    ds, npz = open_dataset(str(tmp_path), "train", load_size=16)
    assert not npz
    assert ds.get_num_classes() == 2
    assert ds.get_class_to_idx() == {"cat": 0, "dog": 1}
    imgs, labels = ds.get_batch(np.array([0, 3]))
    assert imgs.shape == (2, 16, 16, 3)
    assert labels.tolist() == [0, 1]


def test_training_determinism(tmp_path):
    """Two runs with identical seeds produce bitwise-identical loss sequences
    (the analogue of the reference's set_seed determinism, train.py:21-29)."""
    _write_npz(str(tmp_path), n=32, hw=16)
    ds = NpzDataset(str(tmp_path), "train")

    def run():
        model = _tiny_model()
        tx = make_optimizer(1e-3, npz_mode=True)
        state = init_state(model, jax.random.key(0), tx,
                           input_shape=(1, 16, 16, 3))
        ld = BatchLoader(ds, batch_size=16, shuffle=True, seed=5)
        losses = []
        for images, labels in ld.epoch(0):
            state, loss = train_step(state, jnp.asarray(images),
                                     jnp.asarray(labels), jax.random.key(2),
                                     augment=True, image_size=16)
            losses.append(float(loss))
        return losses

    assert run() == run()


def test_checkpoint_saves_imagefolder_class_indices(tmp_path):
    """ImageFolder mode stores class_indices as idx -> NAME (the reference's
    train.py:142-146 layout); save_checkpoint used to int()-coerce the values
    and crash every ImageFolder best-checkpoint save (round-5 A/B finding)."""
    from medmamba_tpu.train import checkpoint as ckpt

    model = _tiny_model()
    tx = make_optimizer(1e-3, npz_mode=False)
    state = init_state(model, jax.random.key(0), tx,
                       input_shape=(1, 16, 16, 3))
    path = str(tmp_path / "ckpt_if")
    ckpt.save_checkpoint(path, state, epoch=1, best_acc=0.5, num_classes=2,
                         class_indices={0: "class_a", 1: "class_b"},
                         async_save=False)
    _, meta = ckpt.restore_params(path)
    assert meta["class_indices"] == {"0": "class_a", "1": "class_b"}
    # NPZ-style name -> idx still round-trips with int values
    ckpt.save_checkpoint(path, state, epoch=1, best_acc=0.5, num_classes=2,
                         class_indices={"class_a": 0, "class_b": 1},
                         async_save=False)
    _, meta = ckpt.restore_params(path)
    assert meta["class_indices"] == {"class_a": 0, "class_b": 1}
