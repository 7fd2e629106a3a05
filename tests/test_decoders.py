"""Golden tests for topological sort, MST, heatmap render/decode.

Expected values derive from the reference __main__ smoke vectors
(`trainers/topological_sort.py:73-84`, `trainers/train_utils.py:335-374`,
`trainers/neural_dependency_parser/mst.py:236-256` example graphs).
"""

import numpy as np
import pytest

from multimodal_sequencing_tpu.utils.topo import Graph, topological_sort
from multimodal_sequencing_tpu.utils.mst import mst, graph_weight
from multimodal_sequencing_tpu.utils.heatmap import (
    render_order_heatmap, heatmap2order)
from multimodal_sequencing_tpu.utils.permutation import (
    permutation_rank, permutation_unrank, build_permutation_label_maps)


def test_topo_sort_reference_graph():
    # reference __main__ graph with assert_head=2
    g = Graph(5)
    for u, v in [(4, 2), (4, 0), (3, 0), (3, 1), (2, 3), (3, 1)]:
        g.addEdge(u, v)
    res = g.topologicalSort(assert_head=2)
    assert res[0] == 2
    assert sorted(res) == [0, 1, 2, 3, 4]
    # linear-order constraint edges must be respected where reachable from 2
    assert res.index(3) < res.index(0)
    assert res.index(3) < res.index(1)
    assert res.index(2) < res.index(3)


def test_topo_sort_total_order():
    # A full pairwise-ordered DAG decodes to the exact order.
    order = [2, 0, 3, 1, 4]
    edges = []
    for i in range(5):
        for j in range(i + 1, 5):
            edges.append((order[i], order[j]))
    assert topological_sort(5, edges) == order


def test_mst_example_graphs():
    # slides example (mst.py:236-245): optimal arborescence weight is 10+30+30
    g1 = {0: {1: 9, 2: 10, 3: 9},
          1: {2: 20, 3: 3},
          2: {1: 30, 3: 30},
          3: {1: 11, 2: 0}}
    t1 = mst(g1)
    assert graph_weight(t1) == 70
    # every non-root node has exactly one parent
    parents = {v: u for u, ch in t1.items() for v in ch}
    assert set(parents) == {1, 2, 3}

    # book example (mst.py:247-256): verified vs reference impl ->
    # {0:{1:12}, 1:{3:7}, 3:{2:7}} with weight 26
    g2 = {0: {1: 12, 2: 4, 3: 4},
          1: {2: 5, 3: 7},
          2: {1: 6, 3: 8},
          3: {1: 5, 2: 7}}
    t2 = mst(g2)
    assert t2 == {0: {1: 12}, 1: {3: 7}, 2: {}, 3: {2: 7}}
    assert graph_weight(t2) == 26


def test_render_order_heatmap_hard():
    # reference __main__: order [2,3,4,1,5], soft=False
    hm = render_order_heatmap([2, 3, 4, 1, 5], soft=False)
    expected = np.zeros((5, 5))
    # offset=1; chain 2->3->4->1->5 => rows are parent-1, cols child-1
    expected[1, 2] = 1  # 2->3
    expected[2, 3] = 1  # 3->4
    expected[3, 0] = 1  # 4->1
    expected[0, 4] = 1  # 1->5
    np.testing.assert_array_equal(hm, expected)


def test_render_order_heatmap_soft_and_ranking():
    hm = render_order_heatmap([0, 1, 2], soft=True)
    assert hm[0, 1] == 1.0 and hm[1, 2] == 1.0
    assert hm[0, 2] == pytest.approx(0.1)
    hmr = render_order_heatmap([0, 1, 2, 3], ranking_based=True)
    # children of 0: [1,2,3]; 2 gets (3-1)/3*0.9, 3 gets (3-2)/3*0.9
    assert hmr[0, 1] == 1.0
    assert hmr[0, 2] == pytest.approx(2 / 3 * 0.9)
    assert hmr[0, 3] == pytest.approx(1 / 3 * 0.9)


# Golden vectors captured by running the reference heatmap2order
# (`trainers/train_utils.py:112-332`) on render_order_heatmap([1,2,3,0,4]):
# hard (soft=False) heatmap for all methods except `topological`, which uses
# the soft heatmap. super_naive revisits node 4 (reference behavior).
@pytest.mark.parametrize("method,expected", [
    ("super_naive", [0, 4, 4, 4, 4]),
    ("naive", [1, 2, 3, 0, 4]),
    ("naive_sum", [1, 2, 3, 0, 4]),
    ("naive_v2", [1, 2, 3, 0, 4]),
    ("naive_v2_sum", [1, 2, 3, 0, 4]),
    ("mst", [0, 4, 1, 2, 3]),
    ("topological", [0, 4, 1, 2, 3]),
])
def test_heatmap_decode_reference_parity(method, expected):
    order = [1, 2, 3, 0, 4]
    hm = render_order_heatmap(order, soft=(method == "topological"))
    pred = heatmap2order(hm.astype(np.float64), decode_method=method,
                         beam_size=2)
    assert [int(x) for x in pred] == expected


def test_heatmap_decode_v2_reference_vector():
    # Mirrors train_utils.py __main__: heat_map[-1] += 0.2 noise then
    # naive_v2_sum decode still recovers [1,2,3,0,4].
    order = [1, 2, 3, 0, 4]
    hm = render_order_heatmap(order, soft=False).astype(np.float64)
    hm[-1] += 0.2
    pred = heatmap2order(hm, decode_method="naive_v2_sum", beam_size=2)
    assert pred == order


def test_heatmap_v3_allows_negative():
    order = [0, 1, 2]
    hm = render_order_heatmap(order, soft=False).astype(np.float64)
    hm[2, 0] = -0.5
    pred = heatmap2order(hm, decode_method="naive_v3", beam_size=2)
    assert sorted(pred) == [0, 1, 2]
    with pytest.raises(AssertionError):
        heatmap2order(hm, decode_method="naive", beam_size=2)


def test_permutation_codec():
    label2id, id2label = build_permutation_label_maps(3)
    assert label2id["0_1_2"] == 0
    assert label2id["2_1_0"] == 5
    assert id2label[1] == [0, 2, 1]
    for perm, idx in label2id.items():
        p = [int(x) for x in perm.split("_")]
        assert permutation_rank(p) == idx
        assert permutation_unrank(idx, 3) == p
    # spot-check n=5 size
    l2i, _ = build_permutation_label_maps(5)
    assert len(l2i) == 120
    assert permutation_rank(permutation_unrank(77, 5)) == 77


# ---- device decode vs host parity (SortEvaluator --device_decode path) ----

@pytest.mark.parametrize("method", [
    "naive", "naive_sum", "naive_v2", "naive_v2_sum"])
def test_exhaustive_naive_decode_matches_host_on_total_orders(method):
    """Device exact n! decode == host beam on clean total-order heatmaps
    (the beam finds the global argmax there). v3 is excluded by design:
    its tail term |hm[p_last, p_0]| REWARDS rotations of the true order,
    so even the exact argmax legitimately diverges from the pruned host
    beam on clean maps — v3 is covered by the score-dominance test."""
    import jax.numpy as jnp
    from multimodal_sequencing_tpu.ops.order_decode import (
        exhaustive_naive_decode)
    rng = np.random.RandomState(3)
    n = 5
    orders, hms = [], []
    for _ in range(8):
        order = rng.permutation(n).tolist()
        hm = render_order_heatmap(order, soft=True)
        # mild noise below the soft/hard gap keeps the total order intact
        hm = np.clip(hm + rng.uniform(0, 0.04, hm.shape), 0, 1)
        orders.append(order)
        hms.append(hm.astype(np.float32))
    dev = np.asarray(exhaustive_naive_decode(
        jnp.asarray(np.stack(hms)), n, method))
    for k in range(8):
        host = heatmap2order(hms[k].astype(np.float64),
                             decode_method=method, beam_size=2)
        assert dev[k].tolist() == host, (method, k, orders[k])


@pytest.mark.parametrize("method", [
    "naive", "naive_sum", "naive_v2", "naive_v2_sum", "naive_v3",
    "naive_v3_sum"])
def test_exhaustive_naive_decode_never_below_host_score(method):
    """On arbitrary heatmaps the device n! argmax scores >= the host beam
    under the shared objective (strictly-stronger property; the only
    guarantee that also covers the v3 family, whose host beam explores on
    signed rows while scoring on |hm|)."""
    import jax.numpy as jnp
    from multimodal_sequencing_tpu.ops.order_decode import (
        exhaustive_naive_decode)
    rng = np.random.RandomState(7)
    n = 4
    eps = 1e-8

    def score(hm, p):
        terms = [hm[p[t], p[t + 1]] for t in range(n - 1)]
        if "v2" in method:
            terms.append(1 - hm[p[-1], p[0]])
        elif "v3" in method:
            terms.append(abs(hm[p[-1], p[0]]))
        if "v3" in method:
            terms = [abs(x) for x in terms]
        if "sum" not in method:
            terms = [np.log(x + eps) for x in terms]
        return float(np.sum(terms))

    hms = rng.uniform(0, 1, (16, n, n)).astype(np.float32)
    dev = np.asarray(exhaustive_naive_decode(jnp.asarray(hms), n, method))
    for k in range(16):
        host = heatmap2order(hms[k].astype(np.float64),
                             decode_method=method, beam_size=2)
        assert score(hms[k], dev[k]) >= score(hms[k], host) - 1e-5


def test_device_topological_matches_host_on_acyclic_tournaments():
    """Device Kahn over an argmax tournament == host DFS topo sort whenever
    the tournament is acyclic (unique Hamiltonian order)."""
    import jax.numpy as jnp
    from multimodal_sequencing_tpu.ops.order_decode import (
        topological_decode_batch)
    rng = np.random.RandomState(11)
    n = 5
    probs, expect = [], []
    for _ in range(6):
        order = rng.permutation(n).tolist()
        pos = {v: i for i, v in enumerate(order)}
        pm = np.zeros((n, n), np.float32)
        for i in range(n):
            for j in range(n):
                if i != j:
                    pm[i, j] = 0.9 if pos[i] < pos[j] else 0.1
        probs.append(pm)
        g = Graph(n)
        for i in range(n):
            for j in range(i + 1, n):
                g.addEdge(i, j) if pm[i, j] > 0.5 else g.addEdge(j, i)
        expect.append(g.topologicalSort())
    dev = np.asarray(topological_decode_batch(
        jnp.asarray(np.stack(probs)), n, thres=0.5))
    for k in range(6):
        assert dev[k].tolist() == expect[k]


def test_sort_evaluator_device_decode_flag_flow(tmp_path):
    """`--device_decode` flows CLI -> config -> SortEvaluator.decode_heatmap
    and the device path reproduces the host decode on total-order heatmaps."""
    from multimodal_sequencing_tpu.train.cli import build_parser, build_config
    from multimodal_sequencing_tpu.train.evaluation import SortEvaluator

    base = ["--model_name_or_path", "simple", "--model_size", "tiny",
            "--max_seq_length", "64", "--per_seq_max_length", "12",
            "--output_dir", str(tmp_path)]
    cfg_host, _ = build_config(build_parser("eval").parse_args(base))
    cfg_dev, _ = build_config(build_parser("eval").parse_args(
        base + ["--device_decode"]))
    assert not cfg_host.device_decode and cfg_dev.device_decode

    rng = np.random.RandomState(5)
    hms = []
    for _ in range(4):
        order = rng.permutation(5).tolist()
        hm = render_order_heatmap(order, soft=True)
        hms.append(np.clip(hm + rng.uniform(0, 0.04, hm.shape), 0, 1))
    hms = np.stack(hms).astype(np.float32)
    host = SortEvaluator(cfg_host, packer=None).decode_heatmap(hms)
    dev = SortEvaluator(cfg_dev, packer=None).decode_heatmap(hms)
    assert dev == host
