"""Train state: AdamW + linear warmup/decay + grad clip + grad accumulation.

Optimization-semantics parity with the reference loop
(`/root/reference/trainers/train.py:171-201,340-364`): AdamW with no decay
on bias/LayerNorm params, linear warmup to `learning_rate` then linear decay
to 0 over `total_steps`, global-norm clipping, optional gradient
accumulation via optax.MultiSteps. Parameters stay fp32; activations run in
the config compute dtype.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    # non-param variable collections (e.g. RN50 BatchNorm batch_stats);
    # empty dict for pure-param models
    model_state: Any = struct.field(default_factory=dict)
    tx: optax.GradientTransformation = struct.field(
        pytree_node=False, default=None)
    apply_fn: Any = struct.field(pytree_node=False, default=None)

    def apply_gradients(self, grads, model_state=None):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
            model_state=(model_state if model_state is not None
                         else self.model_state))


def _decay_mask(params):
    """No weight decay on biases, LayerNorm scales, embeddings' LN — the
    HF-style no_decay=["bias", "LayerNorm.weight"] rule
    (`train.py:171-183`)."""
    def is_decay(path, _):
        names = [getattr(p, "key", str(p)) for p in path]
        leaf = names[-1] if names else ""
        if leaf == "bias":
            return False
        # flax LayerNorm params are 'scale'/'bias' under '*ln*'/'*_ln' names
        if leaf == "scale":
            return False
        return True
    return jax.tree_util.tree_map_with_path(is_decay, params)


def linear_warmup_decay(lr: float, warmup_steps: int, total_steps: int):
    """get_linear_schedule_with_warmup semantics (`train.py:186-190`)."""
    warmup_steps = max(1, warmup_steps)
    decay_steps = max(1, total_steps - warmup_steps)
    return optax.join_schedules(
        [optax.linear_schedule(0.0, lr, warmup_steps),
         optax.linear_schedule(lr, 0.0, decay_steps)],
        [warmup_steps])


def make_optimizer(learning_rate: float = 5e-6, warmup_steps: int = 100,
                   total_steps: int = 100000, weight_decay: float = 0.0,
                   adam_epsilon: float = 1e-8, max_grad_norm: float = 1.0,
                   grad_accum_steps: int = 1, mu_dtype="bfloat16",
                   schedule=None) -> optax.GradientTransformation:
    sched = schedule or linear_warmup_decay(
        learning_rate, warmup_steps, total_steps)
    # bf16 first moment halves the optimizer's HBM traffic for the m state;
    # v (second moment) stays fp32 for numerical range.
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(sched, b1=0.9, b2=0.999, eps=adam_epsilon,
                    weight_decay=weight_decay, mask=_decay_mask,
                    mu_dtype=mu_dtype),
    )
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx


def make_train_state(model, rng, sample_batch: dict,
                     tx: Optional[optax.GradientTransformation] = None,
                     **opt_kwargs) -> TrainState:
    """Initialize params from a sample batch and build the state."""
    tx = tx or make_optimizer(**opt_kwargs)
    init_kwargs = {
        k: jnp.asarray(sample_batch[k]) for k in
        ("input_ids", "attention_mask", "token_type_ids", "images",
         "img_regional_features")
        if k in sample_batch}
    if "order_labels" in sample_batch:
        init_kwargs["order_labels"] = jnp.asarray(
            sample_batch["order_labels"])
    variables = dict(model.init(rng, **init_kwargs, deterministic=True))
    params = variables.pop("params")
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), model_state=variables,
                      tx=tx, apply_fn=model.apply)
