"""Direct parity fuzzing against the mounted reference implementation.

These tests execute the reference's own host-side code (pure
python/numpy/torch modules that import cleanly) and compare outputs
bit-for-bit. They skip when /root/reference is not mounted.
"""

import importlib.util
import os

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted")


def _load(name, relpath):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_berson_packing_parity(tokenizer):
    torch = pytest.importorskip("torch")
    ref = _load("ref_berson_inputs",
                "models/berson/process_inputs_for_berson.py")
    from multimodal_sequencing_tpu.data.packing import StoryPacker

    class A:
        per_seq_max_length = 10
        max_story_length = 4
        multimodal_img_part = False

    packer = StoryPacker(tokenizer, max_seq_length=20, per_seq_max_length=10)
    rng = np.random.RandomState(0)
    for trial in range(10):
        texts = [f"step {trial} {i} " + " ".join(
            chr(97 + rng.randint(26)) for _ in range(rng.randint(2, 7)))
            for i in range(4)]
        label = rng.permutation(4).tolist()
        story_ids, _, _ = packer.pack_story(texts, max_seq_length=200)
        enc = ref.prepare_single_instance(
            ids=torch.tensor(story_ids.astype(np.int64)),
            ground_truth=torch.tensor(label), tokenizer=tokenizer, args=A())
        batch = ref.preprocess_batch([enc], tokenizer.pad_token_id)
        (r_ids, _, _, r_pairs, _, _, r_sep, r_gt, _, r_plab) = [
            x.numpy() for x in batch]
        mine = packer.pack_berson_story(texts, label)
        rl = r_ids.shape[2]
        np.testing.assert_array_equal(r_pairs[0], mine["pairs_list"])
        np.testing.assert_array_equal(r_plab[0], mine["pairwise_labels"])
        np.testing.assert_array_equal(r_gt[0][:4], mine["ground_truth"])
        np.testing.assert_array_equal(r_sep[0], mine["sep_positions"])
        np.testing.assert_array_equal(r_ids[0], mine["input_ids"][:, :rl])
        assert (mine["input_ids"][:, rl:] == tokenizer.pad_token_id).all()


def test_mst_parity_fuzz():
    ref = _load("ref_mst", "trainers/neural_dependency_parser/mst.py")
    from multimodal_sequencing_tpu.utils.mst import mst
    import random
    random.seed(0)
    for _ in range(50):
        n = random.randint(2, 6)
        g = {i: {j: random.randint(0, 20) for j in range(n) if j != i}
             for i in range(n)}
        assert ref.mst({k: dict(v) for k, v in g.items()}) == mst(
            {k: dict(v) for k, v in g.items()})


def test_topo_parity_fuzz():
    ref = _load("ref_topo", "trainers/topological_sort.py")
    from multimodal_sequencing_tpu.utils.topo import Graph
    import random
    random.seed(1)
    for _ in range(50):
        n = random.randint(2, 7)
        edges = [(random.randint(0, n - 1), random.randint(0, n - 1))
                 for _ in range(random.randint(0, 2 * n))]
        head = random.choice([None, random.randint(0, n - 1)])
        rg, mg = ref.Graph(n), Graph(n)
        for u, v in edges:
            rg.addEdge(u, v)
            mg.addEdge(u, v)
        try:
            want = rg.topologicalSort(assert_head=head)
        except (AssertionError, RecursionError):
            continue
        assert mg.topologicalSort(assert_head=head) == want


def test_metrics_parity_fuzz():
    ref = _load("ref_metrics", "trainers/metrics.py")
    from multimodal_sequencing_tpu.utils.metrics import compute_metrics

    class A:
        max_story_length = 5
        multiref_metrics = "max"

    rng = np.random.RandomState(3)
    for _ in range(20):
        n = rng.randint(2, 6)
        preds = [list(rng.permutation(n)) for _ in range(2)]
        labels = [list(rng.permutation(n)) for _ in range(2)]
        for m in ref.METRICS:
            assert abs(ref.compute_metrics(A(), m, preds, labels)
                       - compute_metrics(A(), m, preds, labels)) < 1e-9


def test_heatmap_decode_parity_fuzz():
    import sys
    sys.path.insert(0, REF)
    try:
        from trainers.train_utils import heatmap2order as ref_h2o
    except Exception as e:  # torch/scipy mismatch etc.
        pytest.skip(f"reference train_utils unavailable: {e}")
    finally:
        sys.path.remove(REF)
    from multimodal_sequencing_tpu.utils.heatmap import heatmap2order

    class A:
        heatmap_decode_beam_size = 2

    rng = np.random.RandomState(9)
    args = A()
    for it in range(24):
        n = rng.randint(3, 6)
        # signed heatmaps every third round: the v3 decodes take |.| of
        # tanh-range scores (`train_utils.py:116-117`)
        hm = rng.rand(n, n) * (2.0 if it % 3 == 2 else 1.0) - (
            1.0 if it % 3 == 2 else 0.0)
        for m in ("super_naive", "naive", "naive_sum", "naive_v2",
                  "naive_v2_sum", "naive_v3", "naive_v3_sum", "mst",
                  "topological"):
            args.heatmap_decode_method = m
            try:
                want = [int(x) for x in ref_h2o(args, hm.copy())]
            except Exception as e:
                with pytest.raises(type(e)):
                    heatmap2order(hm.copy(), decode_method=m, beam_size=2)
                continue
            got = [int(x) for x in heatmap2order(hm.copy(), decode_method=m,
                                                 beam_size=2)]
            assert got == want, (m, hm.tolist())
