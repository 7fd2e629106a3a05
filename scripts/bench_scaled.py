"""Beyond-reference-scale measured run on the real chip (verdict r4 #7).

The reference workload tops out at 300 text tokens / 5 steps
(`/root/reference/scripts/wikihow_finetune.sh`); the parallelism and
flash-attention machinery in this framework is built for configs well
past that, but until round 5 it was only ever exercised at toy scale on
the virtual CPU mesh. This script trains the growth-path config on one
real v5e chip and records stories/s + MFU:

  RoBERTa-large width/depth (24 x 1024), sequence length 2048
  (16 story steps x 128 tokens), HF-faithful semantics (erf-exact GELU,
  probs attention dropout) — the S=2048 stream takes the Pallas flash
  kernels with fused hardware-PRNG dropout; per-layer remat bounds
  residual memory.

Why one chip cannot hold this comfortably without the TPU-first pieces:
the XLA probs-dropout path materializes 24 x B*H*S^2 f32 logits
(= 24 GB at B=4) — it OOMs; flash + remat make it train. Multi-chip
stays a dryrun (`__graft_entry__.dryrun_multichip`) per the driver
contract.

Run: `python scripts/bench_scaled.py` (env: SCALED_BATCH_PER_CHIP=4,
SCALED_SEQ=2048, SCALED_REMAT=1). Prints one JSON line.
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

jax.config.update("jax_default_prng_impl", "rbg")

import bench


def main():
    from multimodal_sequencing_tpu.models.config import (
        EncoderConfig, MultimodalConfig)
    from multimodal_sequencing_tpu.models.sequencer import SequencingModel
    from multimodal_sequencing_tpu.parallel.mesh import make_mesh, shard_batch
    from multimodal_sequencing_tpu.train.state import (
        make_train_state, make_optimizer)
    from multimodal_sequencing_tpu.train.steps import make_train_step
    from __graft_entry__ import _synth_batch

    seq = int(os.environ.get("SCALED_SEQ", "2048"))
    bpc = int(os.environ.get("SCALED_BATCH_PER_CHIP", "4"))
    remat = os.environ.get("SCALED_REMAT", "1") == "1"
    steps = int(os.environ.get("SCALED_STEPS", "20"))

    enc = EncoderConfig.roberta_large(
        dtype="bfloat16", max_position_embeddings=seq + 2, remat=remat)
    cfg = MultimodalConfig(
        encoder=enc, hierarchical_version="v1", max_story_length=16,
        max_seq_length=seq, per_seq_max_length=seq // 16)
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

    t0 = time.time()
    step_c, flops = bench._compile_with_flops(step, state, dbatch, rng)
    compile_s = time.time() - t0
    dt, state = bench._time_train(step_c, state, dbatch, rng,
                                  iters=steps, warmup=5)
    # XLA cost analysis reports 0 FLOPs for Pallas custom calls, so at
    # S=2048 (flash-eligible) the raw `mfu` misses the entire attention
    # FLOP volume. Add the algorithmic attention FLOPs analytically:
    # fwd = 2 S x S matmuls (QK^T, PV) = 4*B*H*S^2*D, bwd = 2 matmuls per
    # fwd matmul (8*B*H*S^2*D); kernel-internal recompute is excluded
    # (useful-work convention, same as the dense-part cost analysis).
    e = cfg.encoder
    attn_flops = (12 * bpc * e.num_attention_heads * seq * seq
                  * e.head_dim * e.num_hidden_layers)
    if remat:
        # remat replays the forward once more inside the backward; cost
        # analysis of the lowered program already counts the dense
        # replay, so add only the replayed flash forward
        attn_flops += (4 * bpc * e.num_attention_heads * seq * seq
                       * e.head_dim * e.num_hidden_layers)
    res = {
        "config": f"roberta-large-24L seq{seq} story16 b{bpc} "
                  f"remat={int(remat)} flash+fused-hw-dropout faithful",
        "stories_per_sec_per_chip": round(bpc / dt, 2),
        "tokens_per_sec_per_chip": round(bpc * seq / dt),
        "ms_per_step": round(dt * 1e3, 1),
        "mfu_xla_cost_analysis": bench._mfu(flops, dt, 1),
        "mfu_incl_flash_attn": bench._mfu((flops or 0) + attn_flops, dt, 1),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
