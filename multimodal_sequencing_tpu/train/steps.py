"""Jitted train / eval steps with mesh sharding.

The hot loop: one fused XLA program per step (forward + backward + AdamW
update), batch sharded over the mesh `data` axis, params replicated,
gradients reduced by XLA-inserted psum — replacing the reference's
DataParallel replicate + host-driven loop (`trainers/train.py:278-364`).
Buffers are donated so weights update in place in HBM.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.sequencer import render_heatmap_targets
from ..models.heads import HeatmapHead, PointerHead
from ..parallel.mesh import DATA_AXIS


def masked_mean(values: jax.Array, valid: jax.Array) -> jax.Array:
    """Mean over batch entries marked valid (padding of the final partial
    batch must not contribute gradient)."""
    v = valid.astype(values.dtype)
    return (values * v).sum() / jnp.maximum(v.sum(), 1)


def compute_loss(cfg, outputs: dict, batch: dict) -> tuple:
    """Task loss by hierarchical_version. Returns (loss, metrics)."""
    valid = batch.get("valid")
    v = cfg.hierarchical_version
    metrics = {}
    if v == "v0":
        logits = outputs["logits"]
        labels = batch["labels"].astype(jnp.int32)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        loss = masked_mean(ce, valid) if valid is not None else ce.mean()
        acc = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
        metrics["acc"] = (masked_mean(acc, valid) if valid is not None
                          else acc.mean())
    elif v in ("v1", "v2", "v3"):
        heatmap = outputs["heatmap"]
        order_labels = batch["labels"].astype(jnp.int32)
        target = render_heatmap_targets(order_labels, cfg.max_story_length)
        present = outputs["present"]
        if valid is not None:
            present = present & valid[:, None]
        loss = HeatmapHead.loss(heatmap, target, present)
        if "heatmap_pairwise_ranking" in cfg.hl_include_objectives:
            loss = loss + HeatmapHead.pairwise_ranking_loss(
                heatmap, order_labels, present)
        loss = loss + _aux_losses(cfg, outputs, batch, order_labels,
                                  metrics)
    elif v in ("p0", "p1"):
        logits = outputs["pointer_logits"]
        order_labels = batch["labels"].astype(jnp.int32)
        present = outputs["present"]
        if valid is not None:
            present = present & valid[:, None]
        loss = PointerHead.loss(logits, order_labels, present)
        loss = loss + _aux_losses(cfg, outputs, batch, order_labels,
                                  metrics)
    elif v == "decode":
        # pure_decode encoder-decoder: shifted teacher-forced CE over the
        # index-token vocabulary (models/pure_decode.py; reference
        # `train.py:537-543` modulo the documented shift fix)
        logits = outputs["dec_logits"]  # (B, N, V)
        labels = batch["labels"].astype(jnp.int32)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean(axis=-1)
        loss = masked_mean(ce, valid) if valid is not None else ce.mean()
        tok_acc = (jnp.argmax(logits, -1) == labels).astype(
            jnp.float32).mean(axis=-1)
        metrics["token_acc"] = (masked_mean(tok_acc, valid)
                                if valid is not None else tok_acc.mean())
    else:
        raise ValueError(v)
    metrics["loss"] = loss
    return loss, metrics


def _aux_losses(cfg, outputs, batch, order_labels, metrics):
    """`hl_include_objectives` auxiliary losses
    (`models/pointer_module.py:405-527`): head CE on labels[:,0]; binary
    2-way CE on which of each (i<j) step pair precedes; itm 0.1x CE on
    swap targets; mlm 0.05x masked-LM CE."""
    objs = cfg.hl_include_objectives or []
    total = 0.0
    if "head" in objs and "head_logits" in outputs:
        ce = optax.softmax_cross_entropy_with_integer_labels(
            outputs["head_logits"], order_labels[:, 0])
        metrics["aux_head"] = ce.mean()
        total = total + ce.mean()
    if ("binary" in objs or "pairwise" in objs) and "bin_logits" in outputs:
        import numpy as _np
        iu, ju = _np.triu_indices(cfg.max_story_length, k=1)
        pos = jnp.argsort(order_labels, axis=1)  # node -> chain time
        lbl = (pos[:, iu] < pos[:, ju]).astype(jnp.int32)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            outputs["bin_logits"], lbl)
        metrics["aux_binary"] = ce.mean()
        total = total + ce.mean()
    if "itm" in objs and "itm_logits" in outputs and "itm_targets" in batch:
        ce = optax.softmax_cross_entropy_with_integer_labels(
            outputs["itm_logits"], batch["itm_targets"].astype(jnp.int32))
        metrics["aux_itm"] = 0.1 * ce.mean()
        total = total + 0.1 * ce.mean()
    if "mlm" in objs and "mlm_logits" in outputs and "mlm_labels" in batch:
        labels = batch["mlm_labels"].astype(jnp.int32)
        vmask = labels != cfg.mlm_ignore_index
        safe = jnp.where(vmask, labels, 0)
        ce = -jnp.take_along_axis(
            jax.nn.log_softmax(outputs["mlm_logits"], -1),
            safe[:, :, None], 2)[..., 0]
        mlm = (jnp.where(vmask, ce, 0.0).sum()
               / jnp.maximum(vmask.sum(), 1))
        metrics["aux_mlm"] = 0.05 * mlm
        total = total + 0.05 * mlm
    return total


def make_train_step(cfg, mesh=None, donate: bool = True,
                    with_grad_norm: bool = True,
                    state_shardings=None) -> Callable:
    """Build the jitted train step. With a mesh, inputs/outputs carry
    NamedShardings: batch data-sharded; params replicated by default or
    TP-sharded when `state_shardings` (a NamedSharding tree over the
    TrainState, see parallel/sharding_rules.tree_shardings) is given.
    `with_grad_norm=False` drops the grad-norm metric (one less full pass
    over the gradients when XLA cannot CSE it with clipping)."""

    def step(state, batch, dropout_rng):
        mutable = list(state.model_state.keys())
        # fold the step in: reusing one dropout mask every step lets the
        # model co-adapt to the mask and diverge from the eval-time function
        dropout_rng = jax.random.fold_in(dropout_rng, state.step)

        def loss_fn(params):
            variables = {"params": params, **state.model_state}
            kwargs = dict(
                order_labels=(batch["labels"]
                              if cfg.hierarchical_version in
                              ("p0", "p1", "decode")
                              else None),
                deterministic=False,
                rngs={"dropout": dropout_rng})
            if "images" in batch:
                kwargs["images"] = batch["images"]
            if "img_regional_features" in batch:
                kwargs["img_regional_features"] = (
                    batch["img_regional_features"])
            if mutable:
                outputs, new_mstate = state.apply_fn(
                    variables, batch["input_ids"],
                    batch.get("attention_mask"),
                    batch.get("token_type_ids"), mutable=mutable, **kwargs)
            else:
                outputs = state.apply_fn(
                    variables, batch["input_ids"],
                    batch.get("attention_mask"),
                    batch.get("token_type_ids"), **kwargs)
                new_mstate = state.model_state
            loss, metrics = compute_loss(cfg, outputs, batch)
            return loss, (metrics, new_mstate)

        (loss, (metrics, new_mstate)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, model_state=new_mstate)
        if with_grad_norm:
            metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    if state_shardings is None:
        state_in = state_out = repl
    else:
        # tensor-parallel param/moment shardings (parallel/sharding_rules)
        state_in = state_out = state_shardings
    jitted = jax.jit(
        step,
        in_shardings=(state_in, data, repl),
        out_shardings=(state_out, repl),
        donate_argnums=(0,) if donate else ())
    if getattr(cfg.encoder, "sequence_parallel", False):
        # sequence-parallel activation constraints (parallel/mesh.seq_shard)
        # resolve their PartitionSpecs from the ambient mesh at trace time
        def run(state, batch, rng):
            with mesh:
                return jitted(state, batch, rng)

        def lower(*a, **k):  # cost-analysis hook (bench.py) — same mesh
            with mesh:       # context, else the SP constraints no-op and
                return jitted.lower(*a, **k)  # the analyzed program differs
        run.lower = lower
        return run
    return jitted


def make_berson_train_step(mesh, state_shardings=None,
                           sequence_parallel: bool = False) -> Callable:
    """Jitted BERSON train step: the wrapper model computes its own loss
    (pointer NLL + 0.6x pairwise CE, `modeling_bert.py:1144-1174`), so the
    step just differentiates `out["loss"]`. Batch data-sharded, state
    donated; params replicated by default or TP/FSDP-sharded when
    `state_shardings` is given — same contract as make_train_step."""

    def step(state, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        mutable = list(state.model_state.keys())

        def loss_fn(p):
            v = {"params": p, **state.model_state}
            if mutable:
                out, new_ms = state.apply_fn(
                    v, batch, deterministic=False, rngs={"dropout": rng},
                    mutable=mutable)
            else:
                out = state.apply_fn(v, batch, deterministic=False,
                                     rngs={"dropout": rng})
                new_ms = state.model_state
            return out["loss"], (out, new_ms)

        (loss, (out, new_ms)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_ms), out

    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P(DATA_AXIS))
    st_sh = state_shardings if state_shardings is not None else repl
    jitted = jax.jit(step, in_shardings=(st_sh, data_sh, repl),
                     out_shardings=(st_sh, repl), donate_argnums=(0,))
    if sequence_parallel:
        def run(state, batch, rng):
            with mesh:
                return jitted(state, batch, rng)

        def lower(*a, **k):
            with mesh:
                return jitted.lower(*a, **k)
        run.lower = lower
        return run
    return jitted


def make_eval_step(cfg, mesh=None) -> Callable:
    def step(variables, apply_fn, batch):
        kwargs = {}
        if "images" in batch:
            kwargs["images"] = batch["images"]
        if "img_regional_features" in batch:
            kwargs["img_regional_features"] = batch["img_regional_features"]
        return apply_fn(
            variables,
            batch["input_ids"], batch.get("attention_mask"),
            batch.get("token_type_ids"), deterministic=True, **kwargs)

    jit_kwargs = dict(static_argnums=(1,))
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(DATA_AXIS))
        jit_kwargs.update(in_shardings=(repl, data), out_shardings=data)
    jitted = jax.jit(step, **jit_kwargs)
    if mesh is not None and getattr(cfg.encoder, "sequence_parallel",
                                    False):
        def run(variables, apply_fn, batch):
            with mesh:
                return jitted(variables, apply_fn, batch)
        return run
    return jitted


def eval_variables(state) -> dict:
    return {"params": state.params, **state.model_state}


def device_batch(batch: dict, drop_keys=("guid", "texts")) -> dict:
    """Strip host-only entries before feeding a jitted step."""
    return {k: v for k, v in batch.items() if k not in drop_keys}
