"""Attribute the multimodal (CLIP-RN50 joint) train-step time on hardware.

Round-3 builder numbers had the multimodal step at 0.40 MFU vs 0.50 for
the text flagship; this script answers WHERE the gap lives by timing, on
the same batch shapes and semantics as `bench.py` multimodal mode:

  1. full joint train step (text encoder + RN50 tower + heatmap head,
     fwd+bwd+AdamW)
  2. the same train step with multimodal off (text-only, identical packed
     text batch) — the text share
  3. RN50 tower alone, fwd+bwd (value_and_grad of a mean-readout): the
     conv-stack share, plus its XLA cost-analysis FLOPs so a low tower MFU
     can be split into "conv stack is inherently below matmul peak" vs
     "fusion/layout problem"
  4. the on-device uint8 preprocess tail alone (resize short-circuited,
     scale+normalize only)

Prints one JSON line with seconds, FLOPs and MFU per component and the
residual (full - text - tower - preprocess) = fusion interaction + image
H2D. Run on a real chip: `python scripts/profile_multimodal.py`.
Optionally writes an xplane trace per component under --profile_dir.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(compiled, args, iters, fetch):
    for _ in range(3):
        out = compiled(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*args)
    fetch(out)
    return (time.perf_counter() - t0) / iters


def _time_step(step_c, state, batch, rng, iters):
    """Train-step timing: the step donates + returns the state, so rebind
    every call (bench.py `_time_train` protocol: async enqueue, one fetch)."""
    for _ in range(3):
        state, m = step_c(state, batch, rng)
        _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step_c(state, batch, rng)
    _ = float(m["loss"])
    return (time.perf_counter() - t0) / iters, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--batch", type=int, default=int(
        os.environ.get("BENCH_MM_BATCH_PER_CHIP", "4")))
    ap.add_argument("--profile_dir", type=str, default=None)
    args = ap.parse_args()

    from multimodal_sequencing_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_default_prng_impl", "rbg")

    from bench import (_compile_with_flops, _mfu, _peak_flops, _synth_images,
                       _tiny)
    from __graft_entry__ import _flagship_cfg, _synth_batch
    from multimodal_sequencing_tpu.models.clip_visual import (
        CLIPVisionConfig, CLIPVisualTower)
    from multimodal_sequencing_tpu.models.sequencer import SequencingModel
    from multimodal_sequencing_tpu.parallel.mesh import make_mesh, shard_batch
    from multimodal_sequencing_tpu.train.state import (
        make_train_state, make_optimizer)
    from multimodal_sequencing_tpu.train.steps import make_train_step

    n_dev = len(jax.devices())
    line = {"device": jax.devices()[0].device_kind,
            "batch_per_chip": args.batch}

    def trace(tag):
        class _Ctx:
            def __enter__(self):
                if args.profile_dir:
                    jax.profiler.start_trace(
                        os.path.join(args.profile_dir, tag))

            def __exit__(self, *exc):
                if args.profile_dir:
                    jax.profiler.stop_trace()
        return _Ctx()

    # --- 1. full joint step (bench.py multimodal semantics) ---------------
    cfg = _flagship_cfg(tiny=_tiny())
    cfg.multimodal = True
    cfg.multimodal_model_type = "clip"
    cfg.clip_model_name = "RN50"
    cfg.image_size = (32, 32) if _tiny() else (224, 224)
    vcfg = (CLIPVisionConfig.tiny_rn(dtype=cfg.encoder.dtype) if _tiny()
            else CLIPVisionConfig.rn50(dtype=cfg.encoder.dtype))
    vcfg.image_resolution = cfg.image_size[0]
    bs = args.batch * n_dev
    batch = _synth_batch(cfg, batch_size=bs)
    batch["images"] = _synth_images(cfg, bs)
    mesh = make_mesh()
    model = SequencingModel(cfg, vcfg)
    state = make_train_state(
        model, jax.random.PRNGKey(0), batch,
        tx=make_optimizer(learning_rate=5e-6, warmup_steps=10,
                          total_steps=1000))
    step = make_train_step(cfg, mesh, with_grad_norm=False)
    dbatch = shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(1)
    step_c, flops = _compile_with_flops(step, state, dbatch, rng)

    with trace("full_joint"):
        dt_full, state = _time_step(step_c, state, dbatch, rng, args.iters)
    line["full_joint"] = {"ms": round(dt_full * 1e3, 2),
                          "mfu": _mfu(flops, dt_full, n_dev),
                          "flops": flops}
    del state, step_c

    # --- 2. text-only step, same packed text batch ------------------------
    tcfg = _flagship_cfg(tiny=_tiny())
    tbatch = {k: v for k, v in batch.items() if k != "images"}
    tmodel = SequencingModel(tcfg)
    tstate = make_train_state(
        tmodel, jax.random.PRNGKey(0), tbatch,
        tx=make_optimizer(learning_rate=5e-6, warmup_steps=10,
                          total_steps=1000))
    tstep = make_train_step(tcfg, mesh, with_grad_norm=False)
    tdbatch = shard_batch(tbatch, mesh)
    tstep_c, tflops = _compile_with_flops(tstep, tstate, tdbatch, rng)
    with trace("text_only"):
        dt_text, tstate = _time_step(tstep_c, tstate, tdbatch, rng,
                                     args.iters)
    line["text_only"] = {"ms": round(dt_text * 1e3, 2),
                         "mfu": _mfu(tflops, dt_text, n_dev),
                         "flops": tflops}
    del tstate, tstep_c

    # --- 3. RN50 tower alone, fwd+bwd --------------------------------------
    tower = CLIPVisualTower(vcfg)
    n_img = bs * cfg.max_story_length
    imgs_u8 = jnp.asarray(_synth_images(cfg, bs).reshape(
        (n_img,) + cfg.image_size + (3,)))
    from multimodal_sequencing_tpu.ops.preprocess import (
        preprocess_uint8_images)
    imgs = preprocess_uint8_images(imgs_u8, size=cfg.image_size,
                                   to_chw=False)
    tvars = tower.init(jax.random.PRNGKey(0), imgs, skip_last_layer=False,
                       img_len=1, deterministic=True)
    tparams = tvars["params"]
    tstats = {k: v for k, v in tvars.items() if k != "params"}

    def tower_loss(p, x):
        out, _ = tower.apply({"params": p, **tstats}, x,
                             skip_last_layer=False, img_len=1,
                             deterministic=False, mutable=["batch_stats"],
                             rngs={"dropout": rng})
        return jnp.mean(out.astype(jnp.float32))

    tower_vg = jax.jit(jax.value_and_grad(tower_loss))
    tower_c, tower_flops = _compile_with_flops(tower_vg, tparams, imgs)
    with trace("rn50_tower"):
        dt_tower = _time(tower_c, (tparams, imgs), args.iters,
                         lambda out: float(out[0]))
    line["rn50_tower_fwd_bwd"] = {"ms": round(dt_tower * 1e3, 2),
                                  "mfu": _mfu(tower_flops, dt_tower, n_dev),
                                  "flops": tower_flops,
                                  "images": n_img}

    # --- 4. uint8 preprocess tail alone ------------------------------------
    pre = jax.jit(lambda u8: preprocess_uint8_images(
        u8, size=cfg.image_size, to_chw=False))
    pre_c, pre_flops = _compile_with_flops(pre, imgs_u8)
    dt_pre = _time(pre_c, (imgs_u8,), args.iters,
                   lambda out: out.block_until_ready())
    line["uint8_preprocess"] = {"ms": round(dt_pre * 1e3, 2)}

    resid = dt_full - dt_text - dt_tower
    line["residual_ms"] = round(resid * 1e3, 2)
    line["peak_flops_per_chip"] = _peak_flops()
    print(json.dumps(line))


if __name__ == "__main__":
    main()
