"""multimodal_sequencing_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
multimodal procedural-knowledge sequencing.

Re-implements, TPU-first, the full capability surface of the reference ACL'22
codebase `telin0411/multimodal_sequencing` (mounted read-only at
/root/reference): given a shuffled sequence of N instructional steps (text,
image, or text+image) from WikiHow / RecipeQA, recover the correct order.

Layering (bottom-up):
  utils/     pure-python + numpy golden-semantics layer: metrics, topological
             sort, MST (Chu-Liu-Edmonds), heatmap render/decode, permutation
             codec. Bit-parity anchors vs. the reference.
  data/      JSONL story processors (WikiHow/RecipeQA), caption transforms,
             tokenizer packing, dataset variants, host batching.
  ops/       Pallas TPU kernels + jittable on-device decode programs
             (all-pairs order decode, heatmap beam decode).
  models/    Flax modules: text encoder (BERT/RoBERTa-compatible), CLIP visual
             towers (ModifiedResNet / ViT with multi-image folding),
             single-stream multimodal encoder, ordering heads (pairwise v0,
             heatmap v1-v3, pointer p0/p1), BERSON ordering wrapper + beam.
  parallel/  jax.sharding Mesh construction, named sharding rules, pjit train
             step assembly (dp/model axes).
  train/     training loops, pretraining objectives, eval/decode harness,
             checkpointing (orbax), CLI flag surface.
"""

__version__ = "0.1.0"
