"""End-to-end training-slice tests.

The test box has a single CPU core, so functional tests run on a 1-device
mesh; the 8-device virtual mesh (sharding semantics, psum insertion) gets a
dedicated short test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sequencing_tpu.data import (
    WikiHowGeneralProcessor, HeadPredDataset, PureClassDataset, data_loader)
from multimodal_sequencing_tpu.models.config import (
    EncoderConfig, MultimodalConfig)
from multimodal_sequencing_tpu.models.sequencer import (
    SequencingModel, render_heatmap_targets)
from multimodal_sequencing_tpu.parallel.mesh import make_mesh, shard_batch
from multimodal_sequencing_tpu.train.state import (
    make_train_state, make_optimizer)
from multimodal_sequencing_tpu.train.steps import (
    make_train_step, make_eval_step, device_batch, eval_variables)
from multimodal_sequencing_tpu.utils.heatmap import (
    render_order_heatmap, heatmap2order)
from multimodal_sequencing_tpu.utils.metrics import partial_match


def _cfg(version="v0", **kw):
    enc = EncoderConfig.tiny(max_position_embeddings=200)
    return MultimodalConfig(encoder=enc, hierarchical_version=version,
                            max_story_length=5, max_seq_length=96,
                            per_seq_max_length=16, num_labels=5, **kw)


def _setup(wikihow_dir, tokenizer, version, lr, total_steps, n_devices=1):
    cfg = _cfg(version)
    proc = WikiHowGeneralProcessor(data_dir=wikihow_dir)
    examples = proc.get_train_examples()
    if version == "v0":
        ds = HeadPredDataset(examples, tokenizer, max_length=96,
                             per_seq_max_length=16, seed=0)
    else:
        ds = PureClassDataset(examples, tokenizer, max_length=96,
                              per_seq_max_length=16, seed=0, decode=True)
    mesh = make_mesh(n_data=n_devices)
    batch = next(data_loader(ds, batch_size=8))
    dbatch = shard_batch(device_batch(batch), mesh)
    model = SequencingModel(cfg)
    state = make_train_state(
        model, jax.random.PRNGKey(0), device_batch(batch),
        tx=make_optimizer(learning_rate=lr, warmup_steps=2,
                          total_steps=total_steps))
    step = make_train_step(cfg, mesh)
    return cfg, mesh, batch, dbatch, state, step


def test_render_heatmap_targets_matches_host():
    orders = np.asarray([[0, 1, 2, 3, 4], [2, 0, 4, 1, 3]])
    dev = np.asarray(render_heatmap_targets(jnp.asarray(orders), 5))
    for i, o in enumerate(orders):
        # the label IS the chain sequence (reference train.py:101)
        host = render_order_heatmap(list(o), soft=True)
        np.testing.assert_allclose(dev[i], host, atol=1e-6)


@pytest.mark.parametrize("version", ["v0", "v1", "p0", "p1"])
def test_train_step_runs_and_descends(wikihow_dir, tokenizer, version):
    cfg, mesh, batch, dbatch, state, step = _setup(
        wikihow_dir, tokenizer, version, lr=1e-3, total_steps=50)
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(12):
        state, metrics = step(state, dbatch, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # dropout-noise-robust descent check: late window below early window
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


def test_train_step_8device_mesh(wikihow_dir, tokenizer):
    """DP semantics on the 8-device virtual mesh: runs, stays finite, and
    matches the 1-device loss trajectory (same global batch)."""
    _, _, _, db1, st1, step1 = _setup(
        wikihow_dir, tokenizer, "v0", lr=1e-3, total_steps=50, n_devices=1)
    _, _, _, db8, st8, step8 = _setup(
        wikihow_dir, tokenizer, "v0", lr=1e-3, total_steps=50, n_devices=8)
    rng = jax.random.PRNGKey(1)
    # disable dropout effects by comparing losses computed on the same
    # params at step 0 (dropout rngs fold identically across meshes)
    st1b, m1 = step1(st1, db1, rng)
    st8b, m8 = step8(st8, db8, rng)
    assert np.isfinite(float(m8["loss"]))
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=2e-4)
    _, m1c = step1(st1b, db1, rng)
    _, m8c = step8(st8b, db8, rng)
    np.testing.assert_allclose(float(m1c["loss"]), float(m8c["loss"]),
                               rtol=3e-3)


def test_heatmap_eval_decodes_after_overfit(wikihow_dir, tokenizer):
    cfg, mesh, batch, dbatch, state, step = _setup(
        wikihow_dir, tokenizer, "v1", lr=3e-3, total_steps=300)
    rng = jax.random.PRNGKey(1)
    for _ in range(150):
        state, metrics = step(state, dbatch, rng)
    eval_step = make_eval_step(cfg, mesh)
    out = eval_step(eval_variables(state), state.apply_fn, dbatch)
    hm = np.asarray(out["heatmap"], np.float64)
    labels = np.asarray(batch["labels"])
    pm = np.mean([
        partial_match(
            heatmap2order(hm[b], decode_method="naive_v2_sum", beam_size=2),
            labels[b].tolist())
        for b in range(6)])
    # overfit on 6 stories must beat the 0.2 positional chance rate solidly
    # (tiny 2-layer encoder, 150 steps: typically lands ~0.45-0.55)
    assert pm > 0.35, f"partial match {pm}"


def test_tensor_parallel_matches_replicated(wikihow_dir, tokenizer):
    """TP (data=4, model=2) computes the same loss as replicated DP —
    the sharding rules change layout, not math."""
    from multimodal_sequencing_tpu.parallel.sharding_rules import (
        tree_shardings, shard_state, spec_for_path)
    from jax.sharding import PartitionSpec as P

    cfg, mesh_dp, batch, db_dp, state, step_dp = _setup(
        wikihow_dir, tokenizer, "v1", lr=1e-3, total_steps=50, n_devices=8)
    rng = jax.random.PRNGKey(1)
    _, m_dp = step_dp(state, db_dp, rng)

    cfg2, _, batch2, _, state2, _ = _setup(
        wikihow_dir, tokenizer, "v1", lr=1e-3, total_steps=50, n_devices=1)
    mesh_tp = make_mesh(n_data=4, n_model=2)
    st_sh = tree_shardings(state2, mesh_tp)
    state2 = shard_state(state2, mesh_tp)
    from multimodal_sequencing_tpu.train.steps import make_train_step
    step_tp = make_train_step(cfg2, mesh_tp, state_shardings=st_sh)
    db_tp = shard_batch(device_batch(batch2), mesh_tp)
    _, m_tp = step_tp(state2, db_tp, rng)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_tp["loss"]),
                               rtol=1e-4)

    # the rules actually shard: a qkv kernel gets P(None, 'model')
    leaf = np.zeros((64, 64))
    class K:  # fake DictKey
        def __init__(self, key): self.key = key
    spec = spec_for_path([K("encoder"), K("layer_0"), K("attention"),
                          K("query"), K("kernel")], leaf, 2)
    assert spec == P(None, "model")


def test_fsdp_matches_replicated(wikihow_dir, tokenizer):
    """FSDP (params + moments sharded over the data axis) computes the
    same loss/updates as replicated DP — shardings change layout and
    collectives, not math."""
    from multimodal_sequencing_tpu.parallel.sharding_rules import (
        tree_shardings, shard_state, _with_fsdp)
    from jax.sharding import PartitionSpec as P

    cfg, mesh_dp, batch, db_dp, state, step_dp = _setup(
        wikihow_dir, tokenizer, "v1", lr=1e-3, total_steps=50, n_devices=8)
    rng = jax.random.PRNGKey(1)
    st_dp, m_dp = step_dp(state, db_dp, rng)

    cfg2, _, batch2, _, state2, _ = _setup(
        wikihow_dir, tokenizer, "v1", lr=1e-3, total_steps=50, n_devices=1)
    mesh = make_mesh(n_data=8)
    st_sh = tree_shardings(state2, mesh, fsdp=True)
    state2 = shard_state(state2, mesh, fsdp=True)
    step_fsdp = make_train_step(cfg2, mesh, state_shardings=st_sh)
    db = shard_batch(device_batch(batch2), mesh)
    st_f, m_f = step_fsdp(state2, db, rng)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_f["loss"]),
                               rtol=1e-4)
    # second step: updated (sharded) params produce the same loss too
    _, m_dp2 = step_dp(st_dp, db_dp, rng)
    _, m_f2 = step_fsdp(st_f, db, rng)
    np.testing.assert_allclose(float(m_dp2["loss"]), float(m_f2["loss"]),
                               rtol=1e-3)

    # the rule shards a big 2-D kernel's largest dim over 'data' and
    # composes with an existing TP spec on the other dim
    big = np.zeros((512, 256))
    assert _with_fsdp(P(), big, 8) == P("data", None)
    assert _with_fsdp(P(None, "model"), big, 8) == P("data", "model")
    small = np.zeros((64,))
    assert _with_fsdp(P(), small, 8) == P()


def test_fsdp_with_tp_mesh(wikihow_dir, tokenizer):
    """FSDP composes with TP on a (data=4, model=2) mesh."""
    from multimodal_sequencing_tpu.parallel.sharding_rules import (
        tree_shardings, shard_state)

    cfg, _, batch, _, state, _ = _setup(
        wikihow_dir, tokenizer, "v1", lr=1e-3, total_steps=50, n_devices=1)
    mesh = make_mesh(n_data=4, n_model=2)
    st_sh = tree_shardings(state, mesh, fsdp=True)
    state = shard_state(state, mesh, fsdp=True)
    step = make_train_step(cfg, mesh, state_shardings=st_sh)
    db = shard_batch(device_batch(batch), mesh)
    st2, m = step(state, db, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    _, m2 = step(st2, db, jax.random.PRNGKey(1))
    assert np.isfinite(float(m2["loss"]))


def test_sequence_parallel_matches_replicated(wikihow_dir, tokenizer):
    """TP + sequence-parallel activations (data=4, model=2) computes the
    same loss as replicated DP — SP re-lays-out the LN/residual regions,
    math unchanged."""
    from multimodal_sequencing_tpu.parallel.sharding_rules import (
        tree_shardings, shard_state)
    from multimodal_sequencing_tpu.models.sequencer import SequencingModel
    from multimodal_sequencing_tpu.train.state import (
        make_train_state, make_optimizer)

    cfg, _, batch, db_dp, state, step_dp = _setup(
        wikihow_dir, tokenizer, "v1", lr=1e-3, total_steps=50, n_devices=8)
    rng = jax.random.PRNGKey(1)
    _, m_dp = step_dp(state, db_dp, rng)

    cfg2 = _cfg("v1")
    cfg2.encoder.sequence_parallel = True
    mesh = make_mesh(n_data=4, n_model=2)
    model = SequencingModel(cfg2)
    state2 = make_train_state(
        model, jax.random.PRNGKey(0), device_batch(batch),
        tx=make_optimizer(learning_rate=1e-3, warmup_steps=2,
                          total_steps=50))
    st_sh = tree_shardings(state2, mesh)
    state2 = shard_state(state2, mesh)
    step_sp = make_train_step(cfg2, mesh, state_shardings=st_sh)
    db = shard_batch(device_batch(batch), mesh)
    st2, m_sp = step_sp(state2, db, rng)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_sp["loss"]),
                               rtol=1e-4)
    _, m_sp2 = step_sp(st2, db, rng)
    assert np.isfinite(float(m_sp2["loss"]))

    # seq_shard is a safe no-op outside a mesh context
    from multimodal_sequencing_tpu.parallel.mesh import seq_shard
    x = jnp.ones((2, 8, 4))
    np.testing.assert_array_equal(np.asarray(seq_shard(x)), np.asarray(x))


def test_checkpoint_roundtrip_from_fsdp_state(wikihow_dir, tokenizer,
                                              tmp_path):
    """Checkpoints written from an FSDP-sharded state restore bit-equal
    into a fresh replicated state (save gathers via device_get, so the
    directory contract is sharding-agnostic)."""
    from multimodal_sequencing_tpu.parallel.sharding_rules import (
        tree_shardings, shard_state)
    from multimodal_sequencing_tpu.train.checkpoint import (
        save_checkpoint, restore_checkpoint)

    cfg, _, batch, db, state, _ = _setup(
        wikihow_dir, tokenizer, "v1", lr=1e-3, total_steps=50, n_devices=1)
    mesh = make_mesh(n_data=8)
    st_sh = tree_shardings(state, mesh, fsdp=True)
    sharded = shard_state(state, mesh, fsdp=True)
    step = make_train_step(cfg, mesh, state_shardings=st_sh)
    db8 = shard_batch(device_batch(batch), mesh)
    sharded, _ = step(sharded, db8, jax.random.PRNGKey(1))

    ckpt = save_checkpoint(str(tmp_path), 1, sharded)
    _, _, _, _, fresh, _ = _setup(
        wikihow_dir, tokenizer, "v1", lr=1e-3, total_steps=50, n_devices=1)
    restored = restore_checkpoint(ckpt, fresh)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b))),
        restored.params, sharded.params)
    assert int(restored.step) == int(sharded.step)
