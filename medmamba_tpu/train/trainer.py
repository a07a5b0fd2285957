"""Training core: TrainState, optimizer/schedule factory, jitted train/eval steps.

Capability parity with the reference trainer (train.py):
  * CrossEntropy loss (train.py:187)
  * AdamW -- NPZ mode: lr only (torch defaults => wd=0.01), ImageFolder mode:
    betas (0.9, 0.999), wd=1e-4 (train.py:189-192). Like the reference, no
    parameter grouping: weight decay applies to every parameter (the reference
    does not honor the _no_weight_decay flags, SURVEY §2.3).
  * MultiStepLR(milestones=[50,75], gamma=0.1), stepped per *epoch*, NPZ mode only
    (train.py:194-199, :290-291).

TPU-native design: one jitted ``train_step`` fuses on-device augmentation,
forward, loss, backward and the optimizer update; inputs arrive as uint8 host
batches and are sharded over the ``data`` mesh axis (gradients are reduced by
XLA psum over ICI -- no hand-written comm).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from medmamba_tpu.data.transforms import preprocess


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)

    @classmethod
    def create(cls, *, apply_fn, params, batch_stats, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params),
                   tx=tx, apply_fn=apply_fn)


def make_optimizer(lr: float, npz_mode: bool, epoch_schedule=None,
                   steps_per_epoch: int = 1) -> optax.GradientTransformation:
    """AdamW matching train.py:189-199 (incl. per-epoch MultiStepLR in NPZ mode)."""
    if epoch_schedule:
        boundaries = {int(m) * steps_per_epoch: 0.1 for m in epoch_schedule}
        schedule = optax.piecewise_constant_schedule(lr, boundaries)
    else:
        schedule = lr
    if npz_mode:
        return optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                           weight_decay=0.01)
    return optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-4)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over valid examples; label -1 marks padding (masked out).

    Padding appears when a partial final batch is padded up to the static batch
    size (avoids a second XLA compile) or up to the data-mesh divisor."""
    valid = labels >= 0
    safe = jnp.maximum(labels, 0)
    losses = optax.softmax_cross_entropy_with_integer_labels(logits, safe)
    return jnp.sum(losses * valid) / jnp.maximum(jnp.sum(valid), 1)


def jit_init_variables(model, rng: jax.Array, input_shape=(1, 224, 224, 3)):
    """model.init as ONE compiled program.

    Eager init dispatches thousands of tiny ops; on a remote-tunnelled TPU each
    pays a round trip, turning init into tens of minutes. Jitting makes it a
    single compile + single execution.
    """
    def init_fn(r):
        return model.init({"params": r, "dropout": jax.random.fold_in(r, 1)},
                          jnp.zeros(input_shape, jnp.float32), True)

    return jax.jit(init_fn)(rng)


def init_state(model, rng: jax.Array, tx, input_shape=(1, 224, 224, 3)):
    variables = jit_init_variables(model, rng, input_shape)
    return TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict()), tx=tx)


@functools.partial(jax.jit, static_argnames=("augment", "image_size"),
                   donate_argnames=("state",))
def train_step(state: TrainState, images: jnp.ndarray, labels: jnp.ndarray,
               rng: jax.Array, *, augment: bool = False,
               image_size: int = 224) -> Tuple[TrainState, jnp.ndarray]:
    """One fused step: on-device preprocess -> fwd -> CE -> bwd -> AdamW update."""
    rng = jax.random.fold_in(rng, state.step)
    k_aug, k_drop = jax.random.split(rng)
    x = preprocess(k_aug, images, size=image_size, augment=augment)
    # Padded rows (label -1) are masked out of the loss AND of the BatchNorm
    # batch statistics (the reference runs a smaller final batch instead).
    mask = labels >= 0

    def loss_fn(params):
        outs, updates = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            x, False, mask, rngs={"dropout": k_drop}, mutable=["batch_stats"])
        return cross_entropy(outs, labels), updates["batch_stats"]

    (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(step=state.step + 1, params=new_params,
                              batch_stats=new_stats, opt_state=new_opt)
    return new_state, loss


@functools.partial(jax.jit, static_argnames=("image_size",))
def eval_step(state: TrainState, images: jnp.ndarray, labels: jnp.ndarray,
              *, image_size: int = 224) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (num_correct, logits) on a batch (argmax-accuracy eval, train.py:293-304)."""
    x = preprocess(jax.random.key(0), images, size=image_size, augment=False)
    logits = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats}, x, True)
    correct = jnp.sum((jnp.argmax(logits, -1) == labels) & (labels >= 0))
    return correct, logits
