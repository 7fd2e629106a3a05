"""Training loops: finetune and pretraining drivers.

Mirrors the reference loop semantics (`/root/reference/trainers/train.py:
147-465`, `run_pretraining.py:107-370`): AdamW + linear warmup, gradient
accumulation, clipping, eval-during-training with best-checkpoint tracking
on acc_dev + pmr_dev, periodic checkpoints, scalar logging. The hot loop is
one jitted fused step; data loading/masking/objective planning stay on host
threads ahead of the device.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .state import make_train_state, make_optimizer
from .steps import make_train_step, device_batch
from .checkpoint import save_checkpoint
from .mlm import mask_tokens_sentence
from .objectives import plan_objective, choose_objective
from ..data.datasets import data_loader, prefetch
from ..parallel.mesh import make_mesh, shard_batch

logger = logging.getLogger(__name__)


class MetricWriter:
    """Scalar logger: JSONL always; TensorBoard if available."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def scalar(self, tag: str, value: float, step: int):
        self._f.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def run_finetune(cfg, model, train_dataset, args, *, eval_fn=None,
                 tokenizer=None, mesh=None, dev_dataset=None):
    """Generic finetune loop for SequencingModel heads.

    args needs: per_gpu_train_batch_size, learning_rate, weight_decay,
    adam_epsilon, max_grad_norm, num_train_epochs, max_steps, warmup_steps,
    gradient_accumulation_steps, logging_steps, save_steps, seed,
    output_dir, evaluate_during_training.
    """
    n_model = max(1, getattr(args, "model_parallel_size", 1))
    pp = max(1, getattr(args, "pipeline_parallel_size", 1))
    if pp > 1:
        # pipeline stages live on the mesh `model` axis — mutually
        # exclusive with TP/SP (both shard over that same axis; SP's
        # activation constraints would silently no-op in the pipelined
        # step, which never enters a mesh context). FSDP composes: the
        # state rests ZeRO-sharded over the data axis and the stage
        # weights are gathered inside the pipelined program.
        if (n_model > 1
                or getattr(cfg.encoder, "sequence_parallel", False)):
            raise ValueError(
                "--pipeline_parallel_size is mutually exclusive with "
                "--model_parallel_size/--sequence_parallel (all "
                "consume the model axis)")
        n_model = pp
    mesh = mesh or make_mesh(n_model=n_model)
    n_data = int(np.prod(mesh.devices.shape)) // n_model
    batch_size = args.per_gpu_train_batch_size * n_data
    steps_per_epoch = max(1, len(train_dataset) // batch_size)
    if getattr(args, "max_steps", 0) and args.max_steps > 0:
        total_steps = args.max_steps
        epochs = max(1, total_steps // steps_per_epoch + 1)
    else:
        epochs = int(args.num_train_epochs)
        total_steps = steps_per_epoch * epochs

    tx = make_optimizer(
        learning_rate=args.learning_rate, warmup_steps=args.warmup_steps,
        total_steps=total_steps, weight_decay=args.weight_decay,
        adam_epsilon=args.adam_epsilon, max_grad_norm=args.max_grad_norm,
        grad_accum_steps=args.gradient_accumulation_steps)

    sample = next(data_loader(train_dataset, batch_size))
    state = make_train_state(model, jax.random.PRNGKey(args.seed),
                             device_batch(sample), tx=tx)

    # pretrained weight loads (HF text / CLIP visual / vision backbone)
    from ..models.convert import apply_pretrained_to_state
    state = apply_pretrained_to_state(state, args, cfg)

    # resume from the latest checkpoint unless overwriting
    # (`train.py:246-266` parses the step from the dir name)
    start_step = 0
    if not getattr(args, "overwrite_output_dir", False):
        from .checkpoint import (
            find_checkpoints, parse_step_from_name, restore_checkpoint)
        ckpts = [c for c in find_checkpoints(args.output_dir)
                 if parse_step_from_name(c) > 0]
        if ckpts:
            latest = max(ckpts, key=parse_step_from_name)
            # --do_not_load_optimizer: weights only, fresh optimizer state
            # and global_step 0 (reference `train.py:195,246-247`)
            load_opt = not getattr(args, "do_not_load_optimizer", False)
            state = restore_checkpoint(latest, state,
                                       load_optimizer=load_opt)
            start_step = parse_step_from_name(latest) if load_opt else 0
            logger.info("resumed from %s at step %d (optimizer %s)",
                        latest, start_step,
                        "loaded" if load_opt else "reset")

    if pp > 1:
        from ..parallel.pipeline import make_pipeline_train_step
        fsdp = bool(getattr(args, "fsdp", False))
        st_shardings = None
        if fsdp:
            # ZeRO at-rest sharding over the data axis only (TP rules
            # would mis-shard per-stage weights over the pipe axis)
            from ..parallel.sharding_rules import (tree_shardings,
                                                  shard_state)
            st_shardings = tree_shardings(state, mesh, fsdp=True,
                                          apply_tp=False)
            state = shard_state(state, mesh, fsdp=True, apply_tp=False)
        step_fn, _ = make_pipeline_train_step(
            cfg, mesh, n_stages=pp,
            n_micro=max(1, getattr(args, "pipeline_microbatches", 2)),
            fsdp=fsdp, state_shardings=st_shardings)
    else:
        st_shardings = None
        fsdp = bool(getattr(args, "fsdp", False))
        if n_model > 1 or fsdp:
            from ..parallel.sharding_rules import (tree_shardings,
                                                  shard_state)
            st_shardings = tree_shardings(state, mesh, fsdp=fsdp)
            state = shard_state(state, mesh, fsdp=fsdp)
        step_fn = make_train_step(cfg, mesh, state_shardings=st_shardings)
    rng = jax.random.PRNGKey(args.seed + 1)

    writer = MetricWriter(os.path.join(args.output_dir, "logs"))
    best_score = -np.inf
    global_step = start_step
    t0 = time.time()
    aux_objs = set(cfg.hl_include_objectives or [])
    host_rng = np.random.default_rng(args.seed + 7)
    # --profile_dir: a 3-step jax.profiler trace once the step is compiled
    # and warm (utils/profiling; SURVEY §5.1 — the reference ships no
    # tracing at all)
    from ..utils.profiling import StepTraceWindow
    tracer = StepTraceWindow(getattr(args, "profile_dir", None))
    for epoch in range(epochs):
        for batch in prefetch(data_loader(
                train_dataset, batch_size, shuffle=True,
                seed=args.seed, epoch=epoch)):
            # host-side aux-objective surgery (`train.py:298-304`, itm swap).
            # mlm_wo_loss masks inputs like mlm but adds no loss term (the
            # reference masks for either flag, `train.py:298-304`; the loss
            # gate lives in steps.py:111 and fires only for "mlm")
            if aux_objs & {"mlm", "mlm_wo_loss"}:
                masked, mlabels = mask_tokens_sentence(
                    np.asarray(batch["input_ids"]),
                    mlm_probability=cfg.mlm_probability,
                    pad_id=cfg.pad_id, cls_id=cfg.cls_id,
                    mask_id=cfg.mask_id,
                    vocab_size=cfg.encoder.vocab_size,
                    ignore_index=cfg.mlm_ignore_index, rng=host_rng)
                batch["input_ids"] = masked
                batch["mlm_labels"] = mlabels
            if "itm" in aux_objs and "images" in batch:
                from .objectives import plan_itm_swap
                batch["images"], batch["itm_targets"] = plan_itm_swap(
                    np.asarray(batch["images"]), host_rng)
            db = shard_batch(device_batch(batch), mesh)
            tracer.before_step(global_step - start_step)
            state, metrics = step_fn(state, db, rng)
            if tracer.after_step(global_step - start_step,
                                 sync=metrics["loss"]):
                logger.info("profiler trace written to %s", args.profile_dir)
            global_step += 1
            if global_step % args.logging_steps == 0:
                loss = float(metrics["loss"])
                writer.scalar("train/loss", loss, global_step)
                writer.scalar("train/steps_per_sec",
                              global_step / (time.time() - t0), global_step)
                logger.info("step %d loss %.4f", global_step, loss)
            if args.save_steps and global_step % args.save_steps == 0:
                save_checkpoint(args.output_dir, global_step, state, cfg=cfg,
                                tokenizer=tokenizer,
                                training_args=vars(args))
            if (getattr(args, "evaluate_during_training", False)
                    and eval_fn is not None and args.save_steps
                    and global_step % args.save_steps == 0):
                res = eval_fn(state)
                for k, v in res.items():
                    writer.scalar(f"eval/{k}", v, global_step)
                # best checkpoint on acc + pmr (`train.py:389-422`)
                score = res.get("partial_match", 0) + res.get(
                    "exact_match", 0)
                if score > best_score:
                    best_score = score
                    save_checkpoint(args.output_dir, global_step, state,
                                    cfg=cfg, tokenizer=tokenizer,
                                    training_args=vars(args), name="best")
            if global_step >= total_steps:
                break
        if global_step >= total_steps:
            break
    tracer.close()  # run ended inside the profiling window
    save_checkpoint(args.output_dir, global_step, state, cfg=cfg,
                    tokenizer=tokenizer, training_args=vars(args))
    writer.close()
    return state, global_step


def evaluate_pretraining(cfg, state, args, dev_dataset, *, mesh=None,
                         use_mlm: bool = True, seed: int = 0,
                         max_eval_steps=None):
    """Pretraining dev evaluation: masked-LM loss + perplexity over a dev
    split, mirroring the reference's pretrain evaluate
    (`run_pretraining.py:377-497`, which reports `{task}_loss` and a
    perplexity slot — stubbed 0.0 there; here exp(mlm loss)). Runs the
    MLM-only objective deterministically with a fixed host masking rng."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel.mesh import DATA_AXIS

    mesh = mesh or make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    batch_size = getattr(args, "per_gpu_eval_batch_size", None) or \
        args.per_gpu_train_batch_size
    batch_size *= n_dev
    host_rng = np.random.default_rng(seed)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))

    def eval_losses(params, model_state, batch):
        v = {"params": params, **model_state}
        return state.apply_fn(v, batch, "mlm_only", {}, deterministic=True,
                              use_mlm=use_mlm)

    eval_step = jax.jit(eval_losses,
                        in_shardings=(repl, repl, data),
                        out_shardings=repl)

    totals, n_batches = {}, 0
    for batch in data_loader(dev_dataset, batch_size):
        nb = {k: np.asarray(v) for k, v in batch.items()
              if k in ("input_ids", "attention_mask", "token_type_ids",
                       "images")}
        masked, labels = mask_tokens_sentence(
            nb["input_ids"], mlm_probability=args.mlm_probability,
            pad_id=cfg.pad_id, cls_id=cfg.cls_id, mask_id=cfg.mask_id,
            vocab_size=cfg.encoder.vocab_size,
            ignore_index=cfg.mlm_ignore_index, rng=host_rng)
        nb["input_ids"] = masked
        nb["mlm_labels"] = labels
        losses = eval_step(state.params, state.model_state,
                           shard_batch(nb, mesh))
        for k, v in losses.items():
            totals[k] = totals.get(k, 0.0) + float(v)
        n_batches += 1
        if max_eval_steps and n_batches >= max_eval_steps:
            break
    if n_batches == 0:
        return {}
    res = {f"eval_{k}": v / n_batches for k, v in totals.items()}
    if "eval_mlm" in res:
        res["eval_perplexity"] = float(np.exp(min(res["eval_mlm"], 30.0)))
    return res


def _merge_variable_trees(a, b):
    """Recursive union of two flax variable dicts; `a` wins on overlap."""
    if not isinstance(a, dict) or not isinstance(b, dict):
        return a if a is not None else b
    out = dict(b)
    for k, v in a.items():
        out[k] = _merge_variable_trees(v, b.get(k)) if k in b else v
    return out


def run_pretraining(cfg, model, train_dataset, args, *, tokenizer,
                    mesh=None, dev_dataset=None):
    """Pretraining loop: per-batch host MLM masking + one random objective
    (`run_pretraining.py:107-370`, `modeling.py:1817-1818`). One jit
    specialization per objective signature, each batch-sharded over the
    mesh `data` axis with the state donated (the DDP-pretraining analogue
    of `run_pretraining.py:168-185`)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from .state import TrainState
    from ..parallel.mesh import DATA_AXIS

    if max(1, getattr(args, "pipeline_parallel_size", 1)) > 1:
        raise NotImplementedError(
            "--pipeline_parallel_size pipelines the finetune text "
            "encoder stack (run_finetune); pretraining trains with dp")
    mesh = mesh or make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    batch_size = args.per_gpu_train_batch_size * n_dev
    steps_per_epoch = max(1, len(train_dataset) // batch_size)
    if getattr(args, "max_steps", 0) and args.max_steps > 0:
        total_steps = args.max_steps
        epochs = total_steps // steps_per_epoch + 1
    else:
        epochs = int(args.num_train_epochs)
        total_steps = steps_per_epoch * epochs

    # "no_mlm" in the objective list disables the MLM loss (reference flag);
    # with no objectives at all we run MLM-only pretraining
    objectives = list(cfg.multimodal_pretrain_objectives)
    use_mlm = "no_mlm" not in objectives
    if "visual_mlm" in objectives:
        # accepted for flag parity but a no-op: the reference only copies
        # `visual_mlm` onto the HF config (`run_pretraining.py:1280-1281,
        # 1381-1382,1472-1473`) and no model code reads it
        logger.warning(
            "--multimodal_pretrain_objectives visual_mlm is a dead flag in "
            "the reference (config-only, never read by any model); it is "
            "accepted but has no effect here either")
    objectives = [o for o in objectives if o not in ("no_mlm", "visual_mlm")]
    if not objectives:
        objectives = ["mlm_only"]
    if (cfg.multimodal
            and cfg.multimodal_model_type in ("visualbert", "naive")):
        patch_objs = {o for o in objectives if o.startswith("patch_based")}
        if patch_objs:
            raise ValueError(
                f"objectives {sorted(patch_objs)} operate on the folded "
                "CLIP visual token stream and cannot run with "
                f"--multimodal_model_type {cfg.multimodal_model_type} "
                "(per-step visual tokens); drop them or use clip")

    tx = make_optimizer(
        learning_rate=args.learning_rate, warmup_steps=args.warmup_steps,
        total_steps=total_steps, weight_decay=args.weight_decay,
        adam_epsilon=args.adam_epsilon, max_grad_norm=args.max_grad_norm,
        grad_accum_steps=args.gradient_accumulation_steps)

    host_rng = np.random.default_rng(args.seed)

    def prepare(batch, objective):
        batch = {k: np.asarray(v) for k, v in batch.items()
                 if k in ("input_ids", "attention_mask", "token_type_ids",
                          "images")}
        masked, labels = mask_tokens_sentence(
            batch["input_ids"], mlm_probability=args.mlm_probability,
            pad_id=cfg.pad_id, cls_id=cfg.cls_id, mask_id=cfg.mask_id,
            vocab_size=cfg.encoder.vocab_size,
            ignore_index=cfg.mlm_ignore_index, rng=host_rng)
        batch["input_ids"] = masked
        batch["mlm_labels"] = labels
        nb, aux = plan_objective(objective, batch, cfg, host_rng)
        aux = {k: v for k, v in aux.items()
               if isinstance(v, np.ndarray) and v.ndim > 0}
        return nb, aux

    # init must trace EVERY objective: objective-specific heads (e.g. the
    # patch-MRM classifier) create their params lazily on first trace, and
    # the random per-batch objective choice would otherwise hit a missing
    # param at apply time. Shared modules get identical params across inits
    # (flax derives init rngs from the module path), so a recursive union
    # is exact.
    sample = next(data_loader(train_dataset, batch_size))
    variables: Dict = {}
    for obj in objectives:
        nb0, aux0 = prepare(sample, obj)
        v = dict(model.init(jax.random.PRNGKey(args.seed),
                            {k: jnp.asarray(v) for k, v in nb0.items()},
                            obj,
                            {k: jnp.asarray(v) for k, v in aux0.items()}))
        variables = _merge_variable_trees(variables, v)
    params = variables.pop("params")
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), model_state=variables,
                       tx=tx, apply_fn=model.apply)
    from ..models.convert import apply_pretrained_to_state
    state = apply_pretrained_to_state(state, args, cfg)

    step_cache: Dict[str, Callable] = {}
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P(DATA_AXIS))
    # --fsdp: ZeRO-style sharding of params + moments over the data axis
    st_sh = repl
    if getattr(args, "fsdp", False):
        from ..parallel.sharding_rules import tree_shardings
        st_sh = tree_shardings(state, mesh, fsdp=True)

    def get_step(objective):
        if objective not in step_cache:
            def step(state, batch, aux, rng):
                rng = jax.random.fold_in(rng, state.step)
                mutable = list(state.model_state.keys())

                def loss_fn(p):
                    v = {"params": p, **state.model_state}
                    if mutable:
                        losses, new_ms = state.apply_fn(
                            v, batch, objective, aux, deterministic=False,
                            use_mlm=use_mlm,
                            rngs={"dropout": rng}, mutable=mutable)
                    else:
                        losses = state.apply_fn(
                            v, batch, objective, aux, deterministic=False,
                            use_mlm=use_mlm,
                            rngs={"dropout": rng})
                        new_ms = state.model_state
                    return losses["loss"], (losses, new_ms)

                (loss, (losses, new_ms)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                return state.apply_gradients(grads, new_ms), losses
            # batch + aux sharded on the data axis (every aux array carries
            # a leading batch dim), params replicated, state donated:
            # gradient psum is inserted by XLA from the shardings
            step_cache[objective] = jax.jit(
                step,
                in_shardings=(st_sh, data_sh, data_sh, repl),
                out_shardings=(st_sh, repl),
                donate_argnums=(0,))
        return step_cache[objective]

    if st_sh is repl:
        state = jax.device_put(state, repl)
    else:
        state = jax.tree.map(jax.device_put, state, st_sh)
    writer = MetricWriter(os.path.join(args.output_dir, "logs"))
    rng = jax.random.PRNGKey(args.seed + 1)
    from ..utils.profiling import StepTraceWindow
    tracer = StepTraceWindow(getattr(args, "profile_dir", None))
    global_step = 0
    for epoch in range(max(1, epochs)):
        for batch in prefetch(data_loader(
                train_dataset, batch_size, shuffle=True,
                seed=args.seed, epoch=epoch, drop_last=False)):
            objective = choose_objective(objectives, host_rng)
            nb, aux = prepare(batch, objective)
            tracer.before_step(global_step)
            state, losses = get_step(objective)(
                state, shard_batch(nb, mesh), shard_batch(aux, mesh), rng)
            if tracer.after_step(global_step, sync=losses["loss"]):
                logger.info("profiler trace written to %s",
                            args.profile_dir)
            global_step += 1
            if global_step % args.logging_steps == 0:
                for k, v in losses.items():
                    writer.scalar(f"pretrain/{k}", float(v), global_step)
                logger.info("step %d obj %s loss %.4f", global_step,
                            objective, float(losses["loss"]))
            if args.save_steps and global_step % args.save_steps == 0:
                save_checkpoint(args.output_dir, global_step, state, cfg=cfg,
                                tokenizer=tokenizer,
                                training_args=vars(args))
                if (getattr(args, "evaluate_during_training", False)
                        and dev_dataset is not None):
                    res = evaluate_pretraining(
                        cfg, state, args, dev_dataset, mesh=mesh,
                        use_mlm=use_mlm,
                        max_eval_steps=getattr(args, "max_eval_steps", None))
                    for k, v in res.items():
                        writer.scalar(f"pretrain/{k}", v, global_step)
                    logger.info("pretrain eval @%d: %s", global_step, res)
            if global_step >= total_steps:
                break
        if global_step >= total_steps:
            break
    tracer.close()
    save_checkpoint(args.output_dir, global_step, state, cfg=cfg,
                    tokenizer=tokenizer, training_args=vars(args))
    writer.close()
    return state, global_step
