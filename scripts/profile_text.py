"""Attribute the text-flagship train-step time on hardware.

Round-5: the faithful-semantics step sits at ~0.40 MFU vs 0.50 for the
fast semantics; the variant sweep (scripts/bench_variants.py) prices the
GELU impl and the probs-dropout path, and this script splits the step
into structural components on the same shapes as `bench.py` text mode:

  1. full train step (fwd+bwd+AdamW, donated state)
  2. loss forward only
  3. value_and_grad only (no optimizer update)
  4. encoder-only fwd+bwd (mean-pool readout, no heatmap head)
  5. optimizer update alone (precomputed grads)

Prints one JSON line with ms + MFU per component and the implied
residuals (head cost = 3 - 4; optimizer cost = 1 - 3; bwd cost = 3 - 2).
Run on a real chip: `python scripts/profile_text.py`.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")

import bench
from __graft_entry__ import _flagship_cfg, _synth_batch


def _time_fn(fn, *args, iters=30, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    from multimodal_sequencing_tpu.models.sequencer import SequencingModel
    from multimodal_sequencing_tpu.parallel.mesh import make_mesh, shard_batch
    from multimodal_sequencing_tpu.train.state import (
        make_train_state, make_optimizer)
    from multimodal_sequencing_tpu.train.steps import make_train_step

    cfg = _flagship_cfg()
    bpc = int(os.environ.get("BENCH_BATCH_PER_CHIP", "8"))
    batch = _synth_batch(cfg, batch_size=bpc)
    mesh = make_mesh()
    model = SequencingModel(cfg)
    state = make_train_state(
        model, jax.random.PRNGKey(0), batch,
        tx=make_optimizer(learning_rate=5e-6, warmup_steps=10,
                          total_steps=1000))
    step = make_train_step(cfg, mesh, with_grad_norm=False)
    dbatch = shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(1)
    peak = bench._peak_flops()
    res = {}

    # 1. full train step
    step_c, flops_full = bench._compile_with_flops(step, state, dbatch, rng)
    dt_full, state = bench._time_train(step_c, state, dbatch, rng, iters=30)
    res["full_step_ms"] = round(dt_full * 1e3, 2)
    res["full_mfu"] = bench._mfu(flops_full, dt_full, 1)

    params, mstate = state.params, state.model_state

    from multimodal_sequencing_tpu.train.steps import compute_loss

    def loss_fn(p, b, key):
        outputs = model.apply(
            {"params": p, **mstate}, b["input_ids"],
            b.get("attention_mask"), b.get("token_type_ids"),
            deterministic=False, rngs={"dropout": key})
        loss, _ = compute_loss(cfg, outputs, b)
        return loss

    # 2. forward only
    fwd = jax.jit(loss_fn)
    fwd_c, flops_fwd = bench._compile_with_flops(fwd, params, dbatch, rng)
    dt_fwd = _time_fn(fwd_c, params, dbatch, rng)
    res["fwd_ms"] = round(dt_fwd * 1e3, 2)
    res["fwd_mfu"] = bench._mfu(flops_fwd, dt_fwd, 1)

    # 3. fwd+bwd, no optimizer
    vg = jax.jit(lambda p, b, key: jax.value_and_grad(loss_fn)(p, b, key))
    vg_c, flops_vg = bench._compile_with_flops(vg, params, dbatch, rng)
    dt_vg = _time_fn(vg_c, params, dbatch, rng)
    res["fwd_bwd_ms"] = round(dt_vg * 1e3, 2)
    res["fwd_bwd_mfu"] = bench._mfu(flops_vg, dt_vg, 1)

    # 4. encoder-only fwd+bwd (mean readout instead of the heatmap head)
    from multimodal_sequencing_tpu.models.encoder import TextEncoder
    enc = TextEncoder(cfg.encoder)
    eparams = enc.init(jax.random.PRNGKey(0), batch["input_ids"],
                       batch["attention_mask"], batch["token_type_ids"])

    def enc_loss(p, ids, am, tt, key):
        seq, _ = enc.apply(p, ids, am, tt, deterministic=False,
                           rngs={"dropout": key})
        return (seq.astype(jnp.float32) ** 2).mean()

    evg = jax.jit(lambda p, i, a, t, key:
                  jax.value_and_grad(enc_loss)(p, i, a, t, key))
    evg_c, flops_enc = bench._compile_with_flops(
        evg, eparams, dbatch["input_ids"], dbatch["attention_mask"],
        dbatch["token_type_ids"], rng)
    dt_enc = _time_fn(evg_c, eparams, dbatch["input_ids"],
                      dbatch["attention_mask"], dbatch["token_type_ids"],
                      rng)
    res["encoder_fwd_bwd_ms"] = round(dt_enc * 1e3, 2)
    res["encoder_fwd_bwd_mfu"] = bench._mfu(flops_enc, dt_enc, 1)

    # 5. optimizer update alone
    _, grads = vg_c(params, dbatch, rng)

    oj = jax.jit(lambda g, p, o: state.tx.update(g, o, p))
    oj_c, _ = bench._compile_with_flops(oj, grads, params, state.opt_state)
    dt_opt = _time_fn(oj_c, grads, params, state.opt_state)
    res["optimizer_ms"] = round(dt_opt * 1e3, 2)

    res["head_cost_ms"] = round((dt_vg - dt_enc) * 1e3, 2)
    res["bwd_cost_ms"] = round((dt_vg - dt_fwd) * 1e3, 2)
    res["opt_residual_ms"] = round((dt_full - dt_vg) * 1e3, 2)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
