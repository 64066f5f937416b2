"""Evaluation suite tests.

Golden tests for the WDER family against hand-checkable fixtures (the
reference keeps its only worked example in a docstring, wder.py:334-352 — we
make such cases executable), plus native-vs-Python edit-distance parity and
clustering sanity.
"""
import numpy as np
import pytest

from tal_asrd_tpu.eval import (
    calculate_wder,
    compute_sequence_match,
    convert_to_wder_format,
    corpus_wder,
    eval_distance,
    opcodes,
)
from tal_asrd_tpu.eval.editdist import _py_distance, _py_opcodes, intern_symbols
from tal_asrd_tpu.eval.clustering import (
    cluster_embeddings,
    cosine_distance_matrix,
    make_cluster_fn,
)


# ---------------------------------------------------------------------------
# Edit distance
# ---------------------------------------------------------------------------

def test_eval_distance_basic():
    assert eval_distance("kitten", "sitting") == 3
    assert eval_distance(["a", "b", "c"], ["a", "b", "c"]) == 0
    assert eval_distance([], ["x", "y"]) == 2
    assert eval_distance(["x", "y"], []) == 2


def test_native_matches_python_distance():
    rng = np.random.RandomState(0)
    for _ in range(20):
        a = list(rng.randint(0, 5, rng.randint(0, 30)))
        b = list(rng.randint(0, 5, rng.randint(0, 30)))
        ia, ib = intern_symbols(a, b)
        assert eval_distance(a, b) == _py_distance(ia, ib)


def test_opcodes_cover_and_cost():
    rng = np.random.RandomState(1)
    for _ in range(20):
        a = list(rng.randint(0, 4, rng.randint(1, 25)))
        b = list(rng.randint(0, 4, rng.randint(1, 25)))
        ops = opcodes(a, b)
        # Full coverage without gaps
        ai = bi = 0
        cost = 0
        for op, a0, a1, b0, b1 in ops:
            assert a0 == ai and b0 == bi
            if op == "equal":
                assert a1 - a0 == b1 - b0
                assert a[a0:a1] == b[b0:b1]
            elif op == "replace":
                assert a1 - a0 == b1 - b0
                cost += a1 - a0
            elif op == "delete":
                assert b1 == b0
                cost += a1 - a0
            else:
                assert a1 == a0
                cost += b1 - b0
            ai, bi = a1, b1
        assert ai == len(a) and bi == len(b)
        assert cost == eval_distance(a, b)


def test_native_matches_python_opcodes():
    rng = np.random.RandomState(2)
    for _ in range(10):
        a = list(rng.randint(0, 4, rng.randint(1, 20)))
        b = list(rng.randint(0, 4, rng.randint(1, 20)))
        ia, ib = intern_symbols(a, b)
        assert opcodes(a, b) == _py_opcodes(ia, ib)


def test_opcodes_large_sequences():
    # Hirschberg path (cells > 2^16): cost still optimal and coverage exact
    rng = np.random.RandomState(3)
    a = list(rng.randint(0, 50, 600))
    b = list(rng.randint(0, 50, 700))
    ops = opcodes(a, b)
    cost = sum(
        (a1 - a0) if op in ("replace", "delete") else (b1 - b0) if op == "insert" else 0
        for op, a0, a1, b0, b1 in ops
    )
    assert cost == eval_distance(a, b)
    assert ops[-1][2] == 600 and ops[-1][4] == 700


# ---------------------------------------------------------------------------
# Sequence match / WDER
# ---------------------------------------------------------------------------

def test_compute_sequence_match_perfect():
    _, _, acc = compute_sequence_match([0, 0, 1, 1], [5, 5, 9, 9])
    assert acc == 1.0


def test_compute_sequence_match_partial():
    # hyp merges both ref speakers into one: best assignment gets 2/4
    _, _, acc = compute_sequence_match([0, 0, 1, 1], [7, 7, 7, 7])
    assert acc == 0.5


def test_convert_to_wder_format_fills_none():
    utts = [("hello world", None), ("goodbye", 3)]
    pairs, n = convert_to_wder_format(utts, wer_only=False)
    # None filled forward from next known speaker -> all speaker 3 (rel id 0)
    assert pairs == [("hello", 0), ("world", 0), ("goodbye", 0)]
    assert n == 1


def test_convert_to_wder_format_strips_trailing_role():
    # aligned_to_wder_format emits (text, speaker, role) 3-tuples (reference
    # aligned_to_wder_format.py:34-41); the role must be ignored, for both
    # the ref str-speaker and the hyp (embedding, speaker_id) forms.
    ref = [("hello world", "jane doe", "host"), ("goodbye", "ira", "subject")]
    pairs, n = convert_to_wder_format(ref, wer_only=False)
    assert pairs == [("hello", 0), ("world", 0), ("goodbye", 1)]
    assert n == 2
    hyp = [("hello", (None, 2), "host"), ("bye", (None, 5), "subject")]
    pairs, n = convert_to_wder_format(hyp, wer_only=False,
                                      should_cluster=False)
    assert pairs == [("hello", 0), ("bye", 1)]
    assert n == 2


def test_calculate_wder_hand_fixture():
    # All words equal; hyp collapses two speakers into one -> WDER 0.5
    ref = [("a", 0), ("b", 0), ("c", 1), ("d", 1)]
    hyp = [("a", 0), ("b", 0), ("c", 0), ("d", 0)]
    wer, dist, n_ref, wder, _, _ = calculate_wder("t", ref, hyp)
    assert wer == 0.0 and dist == 0 and n_ref == 4
    assert wder == 0.5


def test_calculate_wder_label_permutation_invariant():
    ref = [("a", "jack"), ("b", "margaret"), ("c", "jack"), ("d", "margaret")]
    hyp = [("a", 9), ("b", 4), ("c", 9), ("d", 4)]
    *_, wder, _, _ = calculate_wder("t", ref, hyp)
    assert wder == 0.0


def test_calculate_wder_substitutions_counted():
    # 'x' is a substitution for 'c'; insertions/deletions are excluded from
    # WDER (only S+C positions count, wder.py:198-231)
    ref = [("a", 0), ("b", 0), ("c", 1)]
    hyp = [("a", 0), ("b", 1), ("x", 1)]
    wer, dist, n_ref, wder, _, _ = calculate_wder("t", ref, hyp)
    assert dist == 1
    # pairs: (0,0) equal, (0,1) equal, (1,1) sub -> best assignment 0->0,1->1
    # correct = 2 of 3 -> wder = 1/3
    np.testing.assert_allclose(wder, 1 / 3)


def test_corpus_wder_aggregation():
    seg1 = (
        [("a b", 0), ("c d", 1)],
        [("a b", 0), ("c d", 0)],
    )  # wder 0.5, wer 0
    seg2 = (
        [("a b", 0), ("c d", 1)],
        [("a b", 5), ("c d", 9)],
    )  # wder 0, wer 0
    *_, overall_wder, dist_t, n_t, overall_wer = corpus_wder([seg1, seg2])
    assert overall_wer == 0.0
    np.testing.assert_allclose(overall_wder, 0.25)


def test_corpus_wder_all_skipped():
    """All-empty hypothesis streams fail loudly by default (an untrained or
    broken model must not score silently); --allow-degenerate scores the
    worst case instead so CPU smokes can exercise the summary plumbing."""
    import pytest

    segs = [([("a b", 0)], []), ([("c d", 1)], [])]
    with pytest.raises(ValueError, match="all 2 segments were skipped"):
        corpus_wder(segs)
    *_, wder, dist_t, n_t, wer = corpus_wder(segs, allow_degenerate=True)
    assert (wder, wer, dist_t, n_t) == (1.0, 1.0, [], 0)


def test_wder_reference_docstring_example():
    """The wder.py:334-352 docstring fixture: embeddings + None speakers,
    clustered by cosine distance."""
    ref = [
        ("banana", "jack"),
        ("try", "margaret"),
        ("garbage", "jack"),
        ("barfagus", "margaret"),
    ]
    hyp = [
        ("bert", (np.array([1.0, 2.0, 3.0, 4.0]), 0)),
        ("ernie", (None, 1)),
        ("garage", (np.array([1.0, 2.0, 3.0, 5.0]), 0)),
        ("bertfungus", (None, 1)),
    ]
    # With speaker IDs (no clustering): alternating 0/1 matches ref exactly
    pairs, n = convert_to_wder_format(hyp, wer_only=False, should_cluster=False)
    assert n == 2
    wer, dist, n_ref, wder, _, _ = calculate_wder("doc",
        convert_to_wder_format(ref, wer_only=True)[0], pairs)
    assert n_ref == 4 and dist == 4  # every word substituted
    assert wder == 0.0  # speakers align perfectly


# ---------------------------------------------------------------------------
# Clustering
# ---------------------------------------------------------------------------

def _blobs():
    rng = np.random.RandomState(0)
    a = rng.randn(10, 4) * 0.05 + np.array([1, 0, 0, 0])
    b = rng.randn(10, 4) * 0.05 + np.array([0, 1, 0, 0])
    return np.vstack([a, b])


@pytest.mark.parametrize("method", ["hdbscan", "dbscan", "agglomerative", "gmm"])
def test_cluster_two_blobs(method):
    x = _blobs()
    kwargs = {}
    if method == "agglomerative":
        kwargs["n_clusters"] = 2
    if method == "gmm":
        kwargs["n_components"] = 2
    labels = cluster_embeddings(x, method=method, **kwargs)
    assert len(labels) == 20
    # The two blobs must separate
    assert len(set(labels[:10])) == 1
    assert len(set(labels[10:])) == 1
    assert labels[0] != labels[10]


def test_cosine_distance_matrix_properties():
    x = _blobs()
    d = cosine_distance_matrix(x, use_device=False)
    assert d.shape == (20, 20)
    assert np.allclose(np.diag(d), 0.0, atol=1e-6)
    assert (d >= 0).all()
    # near-identical vectors -> near-zero distance
    assert d[0, 1] < 0.05
    assert d[0, 10] > 0.5


def test_cluster_fn_in_wder_pipeline():
    x = _blobs()
    utts = [(f"w{i}", x[i]) for i in range(20)]
    pairs, n = convert_to_wder_format(
        utts, wer_only=False, should_cluster=True,
        cluster_fn=make_cluster_fn("agglomerative", n_clusters=2),
    )
    assert n == 2


def test_opcode_tie_break_is_diag_insert_delete():
    """Pin the tie-break order to the pypi edit_distance package's
    lowest_cost_action preference (diag > insert > delete, tal/wder.py:198):
    'aba' vs 'bab' must backtrace-prefer INSERT at the tail tie, yielding
    delete, equal x2, insert — NOT the reversed insert-first path."""
    ops = opcodes(list("aba"), list("bab"))
    names = []
    for op, a0, a1, b0, b1 in ops:
        names += [op] * max(a1 - a0, b1 - b0)
    assert names == ["delete", "equal", "equal", "insert"], names
