"""Train state + jitted train step factory."""
from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp

from cosnet_tpu.train.losses import segmentation_pair_loss
from cosnet_tpu.train.optim import GroupedSGD, group_multipliers


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    momentum: Any
    multipliers: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, variables: dict, optimizer: GroupedSGD) -> "TrainState":
        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables["batch_stats"],
            momentum=optimizer.init(params),
            multipliers=group_multipliers(params),
            step=jnp.zeros((), jnp.int32),
        )

    @property
    def variables(self) -> dict:
        return {"params": self.params, "batch_stats": self.batch_stats}


def make_train_step(
    model,
    optimizer: GroupedSGD,
    ignore_counterpart_loss: bool = False,
    n_inputs: int = 4,
    alternating: bool = False,
) -> Callable:
    """Build the jit-able train step: forward (train mode, BN stats mutate) →
    dual-branch weighted-BCE+L1 loss → grads → grouped SGD update.

    ``n_inputs`` selects the model family's call signature (4 = raa, 3 = the
    depth-fusion ablations, 2 = the RGB-only co-attention nets). The step is
    pure; data-parallel execution comes from jitting it under a Mesh with the
    batch sharded on the 'data' axis (see cosnet_tpu/parallel).

    With ``alternating=True`` the step takes a 4th ``salient`` bool: on
    salient steps the encoder trains at 1×lr and the attention/depth/decoder
    heads are held (the reference's dead salient-object branch,
    ``train.py:166-169``: group0 ← lr, group1 ← 0 instead of 0.01×/10×).
    """

    def train_step(state: TrainState, batch: dict, lr, salient=False):
        def loss_fn(params):
            inputs = [batch["target"], batch["search_0"]]
            if n_inputs >= 3:
                inputs.append(batch["target_depth"])
            if n_inputs >= 4:
                inputs.append(batch["search_0_depth"])
            (x1, x2, _), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                *inputs,
                train=True,
                mutable=["batch_stats"],
            )
            gt1 = batch["target_gt"][..., None].astype(jnp.float32)
            if ignore_counterpart_loss:
                loss = segmentation_pair_loss(x1, gt1)
            else:
                gt2 = batch["search_0_gt"][..., None].astype(jnp.float32)
                loss = segmentation_pair_loss(x1, gt1, x2, gt2)
            return loss, mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        rates = None
        if alternating:
            # Encoder leaves carry multiplier 0.01, heads 10, frozen BN 0
            # (optim.group_multipliers); salient steps remap 0.01→1, 10→0.
            rates = jax.tree.map(
                lambda m: jnp.where(
                    salient, jnp.where(m == 0.01, 1.0, 0.0), m
                ),
                state.multipliers,
            )
        new_params, new_mom = optimizer.update(grads, state.momentum, state.params, lr, state.multipliers, rates)
        new_state = state.replace(
            params=new_params, batch_stats=new_bs, momentum=new_mom, step=state.step + 1
        )
        return new_state, loss

    return train_step
