"""WDER grid-search + converter + tools tests."""
import numpy as np
import pytest

from tal_asrd_tpu.eval.wder_search import (
    cluster_param_labels,
    corpus_wder_map,
    default_param_grid,
    get_wder,
    get_wder_edits,
    get_word_speakers,
    majority_vote_token_clusters,
    mean_utterance_embeddings,
    normalize_lower_no_punct,
    wder_segment_grid,
)
from tal_asrd_tpu.eval.convert import (
    _window_embed,
    convert_results,
    hyp_utterance_entry,
)
from tal_asrd_tpu.eval.tools import (
    apply_role_names,
    eval_transcripts,
    export_tsne,
    prune_bad_utterances,
    splice_at_eot,
    strip_output,
)


def test_get_word_speakers_ref():
    utts = [("hello world", "alice", "host"), ("bye", "bob", "subject")]
    words, sids, roles, n, table = get_word_speakers(utts, is_ref=True)
    assert words == ["hello", "world", "bye"]
    assert sids == [0, 0, 1]
    assert roles == ["host", "host", "subject"]
    assert n == 2


def test_get_word_speakers_hyp_fill_none():
    utts = [("a", None, None), ("b", (None, 2), None), ("c", (None, 3), None)]
    words, sids, roles, n, _ = get_word_speakers(utts, embeddings=False)
    # first two fill forward to speaker 2, third is 3
    assert sids == [0, 0, 1]


def test_get_wder_role_attribution():
    # 4 words, all equal; second half speaker-swapped
    edits = [[0, 4, 0, 4]]
    ref_spk = [0, 0, 1, 1]
    hyp_spk = [0, 0, 0, 0]
    roles = ["host", "host", "subject", "subject"]
    wder, attr = get_wder(edits, ref_spk, hyp_spk, roles)
    assert wder == 0.5
    # both errors land on 'subject' words
    assert attr["subject"] == 1.0 and attr["host"] == 0.0


def test_wder_segment_grid_id_and_cluster():
    rng = np.random.RandomState(0)
    e0 = rng.randn(4) * 0.01 + np.array([1, 0, 0, 0.0])
    e1 = rng.randn(4) * 0.01 + np.array([0, 1, 0, 0.0])
    ref = [("a b", "x", "host"), ("c d", "y", "subject")]
    hyp = [("a b", (e0, 0), None), ("c d", (e1, 1), None)]
    params = [("id",), ("agg", "average", 0.5, None, "cos_dist")]
    res = wder_segment_grid("seg", ref, hyp, params)
    for pset in params:
        wder, ncl, nref, wer, attr = res[pset]
        assert wder == 0.0
        assert wer == 0.0
        assert nref == 2


def test_corpus_wder_map_aggregates():
    ref = [("a b", "x", "host"), ("c d", "y", "subject")]
    hyp_good = [("a b", (None, 0), None), ("c d", (None, 1), None)]
    hyp_bad = [("a b", (None, 0), None), ("c d", (None, 0), None)]
    rows = corpus_wder_map([(ref, hyp_good), (ref, hyp_bad)], [("id",)])
    pset, wder, *_ = rows[0]
    assert pset == ("id",)
    np.testing.assert_allclose(wder, 0.25)


def test_default_param_grid_contains_all_engines():
    grid = default_param_grid()
    methods = {p[0] for p in grid}
    assert methods == {"id", "hdbscan", "dbscan", "agg", "gmm"}


def test_mean_and_majority_helpers():
    hyp = [("w", (np.ones((3, 4)), 7))]
    out = mean_utterance_embeddings(hyp)
    assert out[0][1][0].shape == (4,)
    votes = majority_vote_token_clusters([1, 1, 2, 3, 3, 3], [3, 3])
    assert votes == [1, 3]


def test_normalize_lower_no_punct():
    assert normalize_lower_no_punct("Hello, World! it's me.") == "hello world it's me"


# ---------------------------------------------------------------------------
# Converter
# ---------------------------------------------------------------------------

def test_window_embed_weighted_sum():
    feats = np.arange(20, dtype=np.float32).reshape(10, 2)
    att = np.zeros((2, 3), np.float32)
    att[0, 0] = 1.0          # token 0 fully attends frame 2
    att[1, 1] = 0.5          # token 1 half-attends frame 6
    emb = _window_embed(att, np.array([2, 5]), feats)
    np.testing.assert_allclose(emb[0], feats[2])
    np.testing.assert_allclose(emb[1], 0.5 * feats[6])


def test_window_embed_clamps_overhang():
    feats = np.ones((5, 2), np.float32)
    att = np.ones((1, 4), np.float32)
    emb = _window_embed(att, np.array([3]), feats)  # window exceeds features
    np.testing.assert_allclose(emb[0], 2.0 * np.ones(2))  # only 2 valid frames


def test_convert_results_shapes():
    refs = [{"utterance": "hello", "speaker": "alice", "role": "host"}]
    hyps = [{
        "utterance": "hello",
        "speakerId": 3,
        "attention": np.ones((2, 4), np.float32) / 4,
        "chunkStart": np.array([0, 0]),
    }]
    feats = np.random.RandomState(0).randn(8, 6).astype(np.float32)
    out = convert_results([(refs, hyps)], role_map={3: "host"},
                          sd_features=feats, chunk=4)
    (ref_entries, hyp_entries), = out
    assert ref_entries == [("hello", "alice", "host")]
    text, (emb, sid), role = hyp_entries[0]
    assert text == "hello" and sid == 3 and role == "host"
    assert emb.shape == (2, 6)


# ---------------------------------------------------------------------------
# Tools
# ---------------------------------------------------------------------------

def test_strip_output():
    assert strip_output("hello <S3> world <EOT>!") == "hello world"


def test_splice_at_eot():
    segs = splice_at_eot(["a b <EOT> c", "d <EOT> e f"])
    assert segs == ["a b", "c d", "e f"]


def test_eval_transcripts_wer():
    wer = eval_transcripts(["hello world."], ["hello, world"])
    assert wer == 0.0
    wer2 = eval_transcripts(["hello world"], ["hello there"])
    assert wer2 == 0.5


def test_prune_and_roles_and_tsne(tmp_path):
    utts = [{"u": 1}, {"u": 2}]
    kept = prune_bad_utterances(utts, [0.5, 2.0], threshold=1.0)
    assert kept == [{"u": 1}]

    paired = [([("hi", 0)], [("hi", (None, 1))])]
    out = apply_role_names(paired, {0: "alice"}, {0: "host", 1: "subject"})
    assert out[0][0][0] == ("hi", "alice", "host")
    assert out[0][1][0][2] == "subject"

    vec, meta = export_tsne(np.ones((2, 3)), ["a", "b"], ["host", "subject"],
                            out_dir=str(tmp_path))
    assert open(vec).read().count("\n") == 2
    assert "label\trole" in open(meta).read()
