"""Segmentation training step (U^2-Net family) with dp x sp sharding.

The reference ships inference-only models; this training path exists so the
framework can fine-tune the background-removal nets (e.g. u2net_human_seg
style specializations) at scale. The step is a single pjit-able function:
batch shards across the `data` mesh axis, image rows across `space` (GSPMD
partitions the convolutions with automatic halo exchange), parameters are
replicated, and gradients all-reduce over ICI.

Loss follows the U^2-Net paper: sum of BCE over the fused output d0 and all
six side outputs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from image_segmenter_tpu.models.u2net import U2NET
from image_segmenter_tpu.parallel.mesh import DATA_AXIS, SPACE_AXIS


class TrainState(NamedTuple):
    params: dict
    batch_stats: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def create_train_state(module: U2NET, rng, input_hw=(320, 320),
                       learning_rate: float = 1e-3):
    variables = module.init(rng, jnp.zeros((1, *input_hw, 3), jnp.float32))
    tx = optax.adam(learning_rate)
    return tx, TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.int32(0),
    )


def _bce(pred, target):
    eps = 1e-7
    p = jnp.clip(pred, eps, 1.0 - eps)
    return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


def make_train_step(module: U2NET, tx: optax.GradientTransformation):
    def train_step(state: TrainState, imgs: jnp.ndarray, masks: jnp.ndarray):
        """imgs (B, H, W, 3) float32 normalized; masks (B, H, W) in [0,1]."""

        def loss_fn(params):
            outs, mutated = module.apply(
                {"params": params, "batch_stats": state.batch_stats},
                imgs, train=True, mutable=["batch_stats"])
            target = masks[..., None]
            loss = sum(_bce(d, target) for d in outs)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_stats, new_opt, state.step + 1), loss

    return train_step


def save_checkpoint(path: str, state: TrainState) -> None:
    """Persist a training state with orbax (SURVEY.md §5 checkpoint/resume)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state._asdict(), force=True)


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, template._asdict())
    return TrainState(**restored)


def shard_train_step(train_step, mesh, tx=None):
    """jit the step with dp x sp input shardings and replicated state."""
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS, None, None))
    mask_sh = NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS, None))
    return jax.jit(
        train_step,
        in_shardings=(repl, batch_sh, mask_sh),
        out_shardings=(repl, repl),
    )
