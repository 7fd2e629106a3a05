"""Golden tests for the metric suite.

Expected values derive from the reference implementation's `__main__` smoke
vectors (`/root/reference/trainers/metrics.py:299-317`) and hand-checked
cases of the reference formulas.
"""

import numpy as np
import pytest

from multimodal_sequencing_tpu.utils.metrics import (
    METRICS, compute_metrics, kendall_tau, lcs, lcs_substr, min_swaps,
    multiref_metrics, partial_match, exact_match, distance_based,
    head_prediction, pairwise_prediction,
)


class Args:
    max_story_length = 5
    multiref_metrics = "max"


def test_lcs_reference_vector():
    # reference __main__: LCS([1,2,3,4],[4,1,2,3]) prints 3
    assert lcs([1, 2, 3, 4], [4, 1, 2, 3]) == 3


def test_ms_wms_reference_vector():
    # reference __main__: MS([3,2,4,1],[3,4,2,1]) -> 1, weighted -> 1
    X, Y = [3, 2, 4, 1], [3, 4, 2, 1]
    assert min_swaps(X, Y) == 1
    assert min_swaps(X, Y, weighted=True) == 1


def test_lcs_substr_reference_vector():
    # reference __main__: LCSubStr([3,2,0,1,4],[2,0,1,4,3]) prints 4
    assert lcs_substr([3, 2, 0, 1, 4], [2, 0, 1, 4, 3]) == 4


def test_pairwise_prediction_reference_vector():
    X, Y = [3, 2, 0, 1, 4], [2, 0, 1, 4, 3]
    acc = compute_metrics(None, "pairwise_prediction", [X], [Y])
    # pairs of X: 10 ordered pairs; shared with Y: (2,0),(2,1),(2,4),
    # (0,1),(0,4),(1,4) -> 6/10
    assert acc == pytest.approx(0.6)


def test_tau_identity_and_reverse():
    assert kendall_tau([0, 1, 2, 3], [0, 1, 2, 3]) == pytest.approx(1.0)
    assert kendall_tau([3, 2, 1, 0], [0, 1, 2, 3]) == pytest.approx(-1.0)
    # one adjacent swap in 5 elements: 1 - 2*1/10
    assert kendall_tau([1, 0, 2, 3, 4], [0, 1, 2, 3, 4]) == pytest.approx(0.8)


def test_partial_and_exact_match():
    assert partial_match([0, 1, 2], [0, 2, 1]) == pytest.approx(1 / 3)
    assert exact_match([0, 1, 2], [0, 1, 2]) == 1.0
    assert exact_match([0, 1, 2], [0, 2, 1]) == 0.0


def test_distance_based():
    # pred == label -> 0
    assert distance_based([0, 1, 2], [0, 1, 2]) == 0
    # swap of adjacent: |0-1| + |1-0| = 2
    assert distance_based([1, 0, 2], [0, 1, 2]) == 2


def test_head_prediction():
    assert head_prediction([2, 0, 1], [2, 1, 0]) == 1.0
    assert head_prediction([0, 2, 1], [2, 1, 0]) == 0.0


def test_compute_metrics_batch_mean():
    preds = [[0, 1, 2], [2, 1, 0]]
    labels = [[0, 1, 2], [0, 1, 2]]
    assert compute_metrics(Args(), "exact_match", preds, labels) == 0.5
    assert compute_metrics(Args(), "partial_match", preds, labels) == (
        pytest.approx((1.0 + 1 / 3) / 2))


def test_make_same_len_truncation():
    # pred longer than label -> truncated comparison
    assert exact_match([0, 1, 2, 3], [0, 1, 2]) == 1.0


def test_multiref_max():
    args = Args()
    preds = [[0, 1, 2]]
    labels = [np.asarray([[2, 1, 0], [0, 1, 2]])]
    res = multiref_metrics(args, preds, labels)
    # the best reference is the exact match
    assert res["exact_match"] == 1.0
    assert res["partial_match"] == 1.0
    assert res["tau"] == pytest.approx(1.0)
    # dispatch through compute_metrics detects ndim > 1
    assert compute_metrics(args, "exact_match", preds, labels) == 1.0


def test_multiref_lexicographic_tuple_order():
    # Two refs where one wins on the first metric (partial_match): the whole
    # tuple must come from that ref (lexicographic max), per metrics.py:37-43.
    args = Args()
    preds = [[0, 1, 2, 3]]
    labels = [np.asarray([[0, 1, 3, 2], [3, 1, 2, 0]])]
    res = multiref_metrics(args, preds, labels)
    assert res["partial_match"] == pytest.approx(0.5)  # from ref [0,1,3,2]
    assert res["tau"] == pytest.approx(kendall_tau([0, 1, 2, 3], [0, 1, 3, 2]))


def test_unknown_metric_raises():
    with pytest.raises(NotImplementedError):
        compute_metrics(Args(), "nope", [[0]], [[0]])
