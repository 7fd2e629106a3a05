"""GPipe-style pipeline parallelism for the text encoder stack.

The reference has no pipeline parallelism (its models fit one GPU;
SURVEY §2.4), so this is pure growth path: for configs whose layer stack
outgrows one chip's HBM, the encoder's N transformer layers split into
`n_stages` contiguous stages laid out over the mesh `model` axis (pipeline
and tensor parallelism are mutually exclusive here — both consume that
axis), and the batch streams through as `n_micro` microbatches on the
classic GPipe schedule.

TPU-native design: ONE jitted program. The schedule is a `lax.scan` over
`n_micro + n_stages - 1` ticks inside a `shard_map` over the pipe axis;
stage handoff is a single `lax.ppermute` of the activation block per tick
(nearest-neighbor on ICI), and the backward schedule falls out of JAX
autodiff through the scan+ppermute (reverse ppermute per tick) — no
hand-written backward pass, no host orchestration. Bubble fraction is the
textbook (n_stages-1)/(n_micro+n_stages-1).

Identity: microbatching changes no math (per-sample layernorm/attention,
equal-size microbatches), so the pipelined loss equals the sequential
loss exactly — asserted by tests/test_pipeline.py against the replicated
program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS
from .sharding_rules import _FSDP_MIN_ELEMS

PIPE_AXIS = MODEL_AXIS  # pipeline stages live on the mesh `model` axis


def stack_layer_params(enc_params, num_layers: int, n_stages: int):
    """{'layer_0': tree, ...} -> stacked tree with leading axis
    (n_stages, layers_per_stage). Gradients flow back through the stack
    to the per-layer trees via autodiff of this stacking."""
    if num_layers % n_stages:
        raise ValueError(
            f"num_hidden_layers={num_layers} not divisible by "
            f"pipeline stages={n_stages}")
    lps = num_layers // n_stages
    layers = [enc_params[f"layer_{i}"] for i in range(num_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return jax.tree.map(
        lambda x: x.reshape((n_stages, lps) + x.shape[1:]), stacked)


def _fsdp_stacked_dim(shape, dsize: int, min_elems: int) -> int:
    """Stacked-leaf dim to shard over the data axis, or -1.

    `shape` is (n_stages, layers_per_stage, *param_dims); candidates are
    the param dims (index >= 2), picked by the same largest-divisible
    rule + per-layer size threshold as sharding_rules._with_fsdp so the
    at-rest FSDP layout of the per-layer leaves lines up with the
    stacked operand's layout (the reshard into shard_map is then pure
    local slicing, no collective)."""
    if len(shape) < 3:
        return -1
    per_layer = int(np.prod(shape[2:]))
    if per_layer < min_elems:
        return -1
    best, best_dim = -1, 0
    for i, d in enumerate(shape[2:], start=2):
        if d % dsize == 0 and d > best_dim:
            best, best_dim = i, d
    return best


def gpipe_layers(ecfg, stacked_params, x, attention_mask, rng,
                 n_stages: int, n_micro: int, mesh,
                 deterministic: bool = True, fsdp: bool = False,
                 fsdp_min_elems: int = _FSDP_MIN_ELEMS):
    """Run the layer stack over `x` (B, S, H) through the pipeline.

    stacked_params: (n_stages, layers_per_stage, ...) tree.
    attention_mask: (B, S). Returns (B, S, H).

    fsdp=True: each leaf additionally enters the shard_map sharded over
    the data axis on its largest param dim (ZeRO-style at-rest layout);
    one explicit all_gather per stage per step restores the full stage
    weights before use, and autodiff transposes it to a reduce-scatter
    of the matching gradient — the standard FSDP schedule, composed
    with the pipeline instead of mutually exclusive with it.
    """
    from jax import shard_map
    from ..models.encoder import TransformerLayer

    b = x.shape[0]
    if b % n_micro:
        raise ValueError(f"batch {b} not divisible by n_micro={n_micro}")
    mb = b // n_micro
    n_data = mesh.shape[DATA_AXIS]
    if mb % n_data:
        raise ValueError(
            f"microbatch size {mb} (= batch {b} / n_micro {n_micro}) must "
            f"divide over the {n_data}-way data axis — raise the batch or "
            f"lower --pipeline_microbatches")
    xm = x.reshape((n_micro, mb) + x.shape[1:])
    maskm = attention_mask.reshape((n_micro, mb) + attention_mask.shape[1:])
    layer = TransformerLayer(ecfg)

    def stage_apply(params_lps, h, mask, key):
        """Apply this stage's layers_per_stage layers sequentially."""
        def body(carry, p):
            h, k = carry
            k, sub = jax.random.split(k)
            y = layer.apply(
                {"params": p}, h, mask, deterministic,
                rngs=({} if deterministic else {"dropout": sub}))
            return (y, k), None
        body_fn = jax.checkpoint(body) if ecfg.remat else body
        (h, _), _ = jax.lax.scan(body_fn, (h, key), params_lps)
        return h

    # per-leaf stacked-param specs: stage axis on the pipe axis always;
    # fsdp additionally shards the largest param dim over the data axis
    # (gather_axes records that dim per leaf, -1 = kept whole)
    dsize = mesh.shape[DATA_AXIS]
    gather_axes = jax.tree.map(
        lambda p: (_fsdp_stacked_dim(p.shape, dsize, fsdp_min_elems)
                   if fsdp and dsize > 1 else -1),
        stacked_params)

    def _leaf_spec(p, ax):
        entries = [PIPE_AXIS] + [None] * (p.ndim - 1)
        if ax >= 0:
            entries[ax] = DATA_AXIS
        return P(*entries)

    params_specs = jax.tree.map(_leaf_spec, stacked_params, gather_axes)

    def pipelined(params_st, xm, maskm, rng):
        # inside shard_map: params_st is THIS stage's (1, lps, ...) slice,
        # fsdp leaves additionally 1/dsize-sized on their gather axis —
        # one all_gather per leaf rebuilds the full stage weights (its
        # autodiff transpose reduce-scatters the gradient back)
        params_lps = jax.tree.map(
            lambda p, ax: (p[0] if ax < 0 else jax.lax.all_gather(
                p[0], DATA_AXIS, axis=ax - 1, tiled=True)),
            params_st, gather_axes)
        stage = jax.lax.axis_index(PIPE_AXIS)
        # decorrelate dropout across data shards: each shard holds
        # different samples, so bits must differ per data coordinate
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        n_ticks = n_micro + n_stages - 1
        state = jnp.zeros_like(xm[0])
        outbuf = jnp.zeros_like(xm)
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(carry, t):
            state, outbuf = carry
            # microbatch index this stage works on at tick t
            m = jnp.clip(t - stage, 0, n_micro - 1)
            inp = jnp.where(stage == 0, xm[jnp.minimum(t, n_micro - 1)],
                            state)
            key = jax.random.fold_in(
                jax.random.fold_in(rng, t), stage)
            y = stage_apply(params_lps, inp, maskm[m], key)
            is_out = ((stage == n_stages - 1)
                      & (t - stage >= 0) & (t - stage < n_micro))
            outbuf = outbuf.at[m].set(
                jnp.where(is_out, y, outbuf[m]))
            state = jax.lax.ppermute(y, PIPE_AXIS, perm)
            return (state, outbuf), None

        (state, outbuf), _ = jax.lax.scan(
            tick, (state, outbuf), jnp.arange(n_ticks))
        # replicate the last stage's outputs across the pipe axis
        out = jax.lax.psum(
            jnp.where(stage == n_stages - 1, outbuf, 0.0), PIPE_AXIS)
        return out

    out = shard_map(
        pipelined, mesh=mesh,
        in_specs=(params_specs, P(None, DATA_AXIS), P(None, DATA_AXIS),
                  P()),
        out_specs=P(None, DATA_AXIS),
        check_vma=False)(stacked_params, xm, maskm, rng)
    return out.reshape((b,) + out.shape[2:])


def make_pipeline_train_step(cfg, mesh, n_stages: int, n_micro: int,
                             donate: bool = True, fsdp: bool = False,
                             state_shardings=None,
                             fsdp_min_elems: int = _FSDP_MIN_ELEMS):
    """Pipelined analogue of `train/steps.make_train_step` for TEXT
    models (the multimodal towers keep dp/tp/fsdp). Supports every
    hierarchical_version head; aux `hl_include_objectives` heads are out
    of scope for the pipelined step (reject loudly).

    fsdp=True composes ZeRO-style data-axis sharding of params +
    optimizer moments with the pipeline: pass the matching
    `state_shardings` (sharding_rules.tree_shardings with
    apply_tp=False) so the jitted step keeps the state in its at-rest
    layout; the layer stack is gathered stage-locally inside the
    pipelined program (see gpipe_layers)."""
    from ..models.encoder import Embeddings
    from ..models.heads import (HeatmapHead, PointerHead,
                                ClassificationHead, gather_step_cls)
    from ..train.steps import compute_loss

    if cfg.multimodal:
        raise NotImplementedError(
            "pipeline parallelism covers the text encoder stack; "
            "multimodal towers train with dp/tp/fsdp")
    if set(cfg.hl_include_objectives or []):
        raise NotImplementedError(
            "hl_include_objectives aux heads are not wired into the "
            "pipelined step yet — drop --pipeline_parallel_size or the "
            "aux objectives")
    if mesh.shape[PIPE_AXIS] != n_stages:
        raise ValueError(
            f"mesh {PIPE_AXIS} axis is {mesh.shape[PIPE_AXIS]}, "
            f"pipeline stages {n_stages} — build the mesh with "
            f"n_model=pipeline_parallel_size")
    ecfg = cfg.encoder
    emb = Embeddings(ecfg)
    v = cfg.hierarchical_version
    if v == "v0":
        head = ClassificationHead(
            num_labels=cfg.num_labels, hidden_size=ecfg.hidden_size,
            dropout=ecfg.hidden_dropout_prob, dtype=ecfg.compute_dtype)
    elif v in ("v1", "v2", "v3"):
        head = HeatmapHead(cfg)
    elif v in ("p0", "p1"):
        head = PointerHead(cfg)
    else:
        raise NotImplementedError(f"pipelined step: head {v}")

    def forward(params, batch, dropout_rng, deterministic=False):
        ids = batch["input_ids"]
        attn = batch.get("attention_mask")
        if attn is None:
            attn = jnp.ones_like(ids)
        enc_p = params["encoder"]
        r_emb, r_layers, r_head = jax.random.split(dropout_rng, 3)
        x = emb.apply({"params": enc_p["embeddings"]}, ids,
                      batch.get("token_type_ids"),
                      deterministic=deterministic,
                      rngs=({} if deterministic else {"dropout": r_emb}))
        stacked = stack_layer_params(enc_p, ecfg.num_hidden_layers,
                                     n_stages)
        seq = gpipe_layers(ecfg, stacked, x, attn, r_layers,
                           n_stages, n_micro, mesh,
                           deterministic=deterministic, fsdp=fsdp,
                           fsdp_min_elems=fsdp_min_elems)
        outputs = {"sequence_output": seq}
        rngs = {} if deterministic else {"dropout": r_head}
        if v == "v0":
            pk = enc_p["pooler"]
            pooled = jnp.tanh(
                seq[:, 0] @ pk["kernel"].astype(seq.dtype)
                + pk["bias"].astype(seq.dtype))
            outputs["logits"] = head.apply(
                {"params": params["cls_head"]}, pooled, deterministic,
                rngs=rngs).astype(jnp.float32)
        else:
            reprs, present = gather_step_cls(
                seq, ids, cfg.cls_id, cfg.max_story_length)
            outputs["step_reprs"], outputs["present"] = reprs, present
            if v in ("v1", "v2", "v3"):
                outputs["heatmap"] = head.apply(
                    {"params": params["heatmap_head"]}, reprs, present,
                    deterministic, rngs=rngs)
            else:
                outputs["pointer_logits"] = head.apply(
                    {"params": params["pointer_head"]}, reprs, present,
                    batch["labels"].astype(jnp.int32), deterministic,
                    rngs=rngs).astype(jnp.float32)
        return outputs

    def step(state, batch, dropout_rng):
        if state.model_state:
            # mutable collections (batch_stats etc.) are not threaded
            # through the pipelined apply; the text encoder has none —
            # fail loudly rather than silently freeze them
            raise NotImplementedError(
                "pipelined step does not thread mutable model_state "
                f"collections: {list(state.model_state)}")
        dropout_rng = jax.random.fold_in(dropout_rng, state.step)

        def loss_fn(params):
            outputs = forward(params, batch, dropout_rng,
                              deterministic=False)
            loss, metrics = compute_loss(cfg, outputs, batch)
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.apply_gradients(grads)
        return new_state, metrics

    bs = NamedSharding(mesh, P(DATA_AXIS))
    rep = NamedSharding(mesh, P())
    st_in = state_shardings if state_shardings is not None else None
    jitted = jax.jit(
        step,
        in_shardings=(st_in, bs, rep),
        out_shardings=((state_shardings, rep)
                       if state_shardings is not None else None),
        donate_argnums=(0,) if donate else ())
    # forward exposed for parity tests against the sequential program
    return jitted, forward


def make_berson_pipeline_train_step(cfg, mesh, n_stages: int, n_micro: int,
                                    donate: bool = True, fsdp: bool = False,
                                    state_shardings=None,
                                    fsdp_min_elems: int = _FSDP_MIN_ELEMS):
    """Pipelined analogue of `train/steps.make_berson_train_step`: the
    BERSON wrapper's inner TEXT trunk (embeddings + the transformer layer
    stack, by far the FLOPs bulk — 20 packed pairs/story through a
    roberta-large-class encoder) runs through `gpipe_layers` over the mesh
    model axis, while the wrapper keeps its hierarchical attention /
    inter-encoder / relational pointer logic via the `trunk_out` hook on
    `BersonOrdering.__call__` (the trunk is computed OUTSIDE model.apply —
    flax forbids constructing submodules inside a foreign apply — and the
    precomputed (B*P, L, H) sequence output is passed in; gradients flow
    to the inner params through the closure). Multimodal inner encoders
    fuse vision
    inside the trunk and stay on dp/tp/fsdp (reject loudly). fsdp=True
    composes ZeRO data-axis sharding exactly as in
    `make_pipeline_train_step` (pass matching `state_shardings` built
    with apply_tp=False)."""
    from ..models.encoder import Embeddings

    if cfg.multimodal:
        raise NotImplementedError(
            "pipeline parallelism covers the BERSON text trunk; "
            "multimodal inner encoders train with dp/tp/fsdp")
    if mesh.shape[PIPE_AXIS] != n_stages:
        raise ValueError(
            f"mesh {PIPE_AXIS} axis is {mesh.shape[PIPE_AXIS]}, "
            f"pipeline stages {n_stages} — build the mesh with "
            f"n_model=pipeline_parallel_size")
    ecfg = cfg.encoder
    emb = Embeddings(ecfg)

    def step(state, batch, rng):
        if state.model_state:
            raise NotImplementedError(
                "pipelined BERSON step does not thread mutable "
                f"model_state collections: {list(state.model_state)}")
        rng = jax.random.fold_in(rng, state.step)
        r_emb, r_layers, r_rest = jax.random.split(rng, 3)

        ids3 = batch["input_ids"]               # (B, P, L)
        b, p_, L = ids3.shape
        flat = lambda x: x.reshape((b * p_,) + x.shape[2:])
        ids = flat(ids3)
        attn = flat(batch["attention_mask"])
        types = flat(batch["token_type_ids"])

        def loss_fn(p):
            enc_p = p["inner"]
            stacked = stack_layer_params(enc_p, ecfg.num_hidden_layers,
                                         n_stages)
            x = emb.apply({"params": enc_p["embeddings"]}, ids, types,
                          deterministic=False, rngs={"dropout": r_emb})
            lang = gpipe_layers(ecfg, stacked, x, attn, r_layers,
                                n_stages, n_micro, mesh,
                                deterministic=False, fsdp=fsdp,
                                fsdp_min_elems=fsdp_min_elems)
            out = state.apply_fn({"params": p}, batch, deterministic=False,
                                 rngs={"dropout": r_rest}, trunk_out=lang)
            return out["loss"], out

        (loss, out), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, state.model_state), out

    bs = NamedSharding(mesh, P(DATA_AXIS))
    rep = NamedSharding(mesh, P())
    st_in = state_shardings if state_shardings is not None else rep
    jitted = jax.jit(
        step,
        in_shardings=(st_in, bs, rep),
        out_shardings=(st_in, rep),
        donate_argnums=(0,) if donate else ())
    return jitted
