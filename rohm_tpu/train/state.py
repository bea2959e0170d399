"""Train state: params + AdamW optimizer state, as a flax struct pytree."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray  # int32 scalar
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params, opt_state=new_opt_state)


def create_train_state(
    params,
    lr: float = 1e-4,
    weight_decay: float = 0.0,
    frozen_mask=None,
) -> TrainState:
    """AdamW matching the reference optimizer (train loops use
    torch.optim.AdamW(lr, weight_decay); fp16 path is dead, fp16_util.py:149).

    frozen_mask: optional pytree of bools (True = trainable) implementing the
    TrajControl freeze (reference train_trajnet.py:167-175) by zeroing updates
    for frozen leaves.
    """
    tx = optax.adamw(lr, weight_decay=weight_decay)
    if frozen_mask is not None:
        tx = optax.chain(tx, optax.masked(optax.set_to_zero(), jax.tree.map(lambda m: not m, frozen_mask)))
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
    )


def trajcontrol_frozen_mask(params) -> Any:
    """True (= trainable) only for ControlNet-branch params.

    Mirrors the reference freeze of everything outside `controlnet.`
    (train_trajnet.py:167-175). Works on the flax params dict of TrajNet with
    trajcontrol=True, where the branch lives under a 'ControlNet_0' scope.
    """

    def mark(path, leaf):
        trainable = any("ControlNet" in str(p) for p in path)
        return trainable

    return jax.tree_util.tree_map_with_path(mark, params)
