"""Diarization tests: GRU gate math vs torch.nn.GRU golden values, UIS-RNN
training convergence + CRP beam-search prediction on separable synthetic
speakers, transition-bias estimation, save/load, and the wav2vec feature
geometry.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tal_asrd_tpu.diarization import (
    GRU,
    UISRNN,
    UISRNNConfig,
    UISRNNInferenceConfig,
    UISRNNTrainConfig,
    estimate_transition_bias,
    evaluate_result,
    extract_utterance_features,
    init_wav2vec,
    resize_sequence,
)


def test_gru_matches_torch_golden():
    """Always-on parity vs a committed torch.nn.GRU golden fixture
    (tests/fixtures/gru_golden.npz; gate order r,z,n and the torch-specific
    n-gate bias placement — tal/diarization/uisrnn/uisrnn.py:27-29)."""
    import os

    fix = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                               "gru_golden.npz"))
    x = fix["x"]
    depth, d_h = 2, 8
    gru = GRU(hidden_size=d_h, depth=depth)
    params = gru.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = dict(params["params"])
    for k in range(depth):
        p[f"layer_{k}_wi_kernel"] = jnp.asarray(fix[f"weight_ih_l{k}"].T)
        p[f"layer_{k}_wi_bias"] = jnp.asarray(fix[f"bias_ih_l{k}"])
        p[f"layer_{k}_wh_kernel"] = jnp.asarray(fix[f"weight_hh_l{k}"].T)
        p[f"layer_{k}_wh_bias"] = jnp.asarray(fix[f"bias_hh_l{k}"])
    out_j, h_j = gru.apply({"params": p}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_j), fix["out"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_j), fix["h"], atol=1e-5)


def test_gru_matches_torch_live():
    torch = pytest.importorskip("torch")
    d_in, d_h, depth, t, b = 6, 8, 2, 5, 3
    rng = np.random.RandomState(0)
    x = rng.randn(b, t, d_in).astype(np.float32)

    tg = torch.nn.GRU(d_in, d_h, depth, batch_first=True)
    with torch.no_grad():
        out_t, h_t = tg(torch.from_numpy(x))

    gru = GRU(hidden_size=d_h, depth=depth)
    params = gru.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # copy torch weights: weight_ih_l{k} [3H, D], ours kernel [D, 3H]
    p = dict(params["params"])
    for k in range(depth):
        wi = getattr(tg, f"weight_ih_l{k}").detach().numpy()
        wh = getattr(tg, f"weight_hh_l{k}").detach().numpy()
        bi = getattr(tg, f"bias_ih_l{k}").detach().numpy()
        bh = getattr(tg, f"bias_hh_l{k}").detach().numpy()
        p[f"layer_{k}_wi_kernel"] = jnp.asarray(wi.T)
        p[f"layer_{k}_wi_bias"] = jnp.asarray(bi)
        p[f"layer_{k}_wh_kernel"] = jnp.asarray(wh.T)
        p[f"layer_{k}_wh_bias"] = jnp.asarray(bh)

    out_j, h_j = gru.apply({"params": p}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_j), h_t.numpy(), atol=1e-5)


def test_resize_sequence_groups_clusters():
    seq = np.arange(12, dtype=float).reshape(6, 2)
    ids = np.array(["a", "b", "a", "b", "a", "b"])
    subs, lens = resize_sequence(seq, ids, num_permutations=None)
    assert len(subs) == 2
    np.testing.assert_array_equal(subs[0], seq[[0, 2, 4]])
    assert lens == [4, 4]  # length + 1


def test_estimate_transition_bias():
    bias, denom = estimate_transition_bias([["a", "a", "b", "b", "a"]])
    # transitions: a->a(0), a->b(1), b->b(0), b->a(1); smooth=1
    assert denom == 2 + 4
    np.testing.assert_allclose(bias, (1 + 2) / 6)


def _synthetic_speakers(n_per=12, d=8, seed=0):
    """Two well-separated speakers, interleaved in blocks."""
    rng = np.random.RandomState(seed)
    a = rng.randn(n_per, d) * 0.05 + np.r_[np.ones(d // 2), np.zeros(d - d // 2)]
    b = rng.randn(n_per, d) * 0.05 - np.r_[np.ones(d // 2), np.zeros(d - d // 2)]
    seq = np.concatenate([a[:6], b[:6], a[6:], b[6:]], axis=0)
    ids = ["s0"] * 6 + ["s1"] * 6 + ["s0"] * 6 + ["s1"] * 6
    return seq.astype(float), ids


@pytest.mark.slow
def test_uisrnn_fit_and_predict():
    seq, ids = _synthetic_speakers()
    cfg = UISRNNConfig(observation_dim=8, rnn_hidden_size=16, rnn_depth=1)
    tc = UISRNNTrainConfig(
        learning_rate=5e-3, train_iteration=60, batch_size=None,
        num_permutations=2, log_iter=1000,
    )
    model = UISRNN(cfg, seed=0)
    losses = model.fit([seq], [ids], tc)
    assert losses[-1] < losses[0]  # likelihood part decreases
    assert model.transition_bias is not None

    pred = model.predict_single(
        seq[:12], UISRNNInferenceConfig(beam_size=4, look_ahead=1, test_iteration=1)
    )
    assert len(pred) == 12
    acc = evaluate_result(["s0"] * 6 + ["s1"] * 6, pred)
    assert acc >= 0.5  # better than trivial single-cluster collapse... loose


def test_uisrnn_save_load(tmp_path):
    cfg = UISRNNConfig(observation_dim=4, rnn_hidden_size=8)
    m = UISRNN(cfg, seed=1)
    m.transition_bias = 0.3
    m.transition_bias_denominator = 10.0
    p = str(tmp_path / "uisrnn.msgpack")
    m.save(p)
    m2 = UISRNN(cfg, seed=2)
    m2.load(p)
    assert m2.transition_bias == 0.3
    for a, b in zip(
        jax.tree_util.tree_leaves(m.params), jax.tree_util.tree_leaves(m2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_wav2vec_feature_geometry():
    model, variables = init_wav2vec()
    audio = np.random.RandomState(0).randn(16000).astype(np.float32) * 0.1
    feats = extract_utterance_features(model, variables, audio, window_s=None)
    # strides 5*4*2*2*2 = 160 -> ~100 frames/s (minus VALID edges)
    assert feats.shape[1] == 512
    assert 90 <= feats.shape[0] <= 100
    win = extract_utterance_features(model, variables, audio, window_s=0.4)
    assert win.shape[0] == feats.shape[0] // 40


@pytest.mark.slow
def test_wav2vec_fairseq_converter_forward_parity():
    """Build a state dict with fairseq wav2vec's exact key/shape layout
    (feature_{extractor,aggregator}.conv_layers.{i}.{j}: bias-free Conv1d at
    Sequential index 0/1, Fp32GroupNorm(1, dim) affine at 2/3 —
    /root/reference/tal/diarization/features/wav2vec/__init__.py:41-66 loads
    such a dict), convert it, and assert the converted JAX forward matches a
    hand-computed torch stack on the same weights."""
    torch = pytest.importorskip("torch")
    from tal_asrd_tpu.diarization.wav2vec import (
        ConvAggregator,
        ConvFeatureExtractor,
        Wav2VecFeatures,
        convert_fairseq_weights,
        plan_from_state_dict,
    )

    rng = np.random.RandomState(0)
    ext_plan = [(16, 10, 5), (16, 8, 4), (16, 4, 2)]
    agg_plan = [(16, 3, 1)] * 2

    sd = {}
    c_in = 1
    for i, (dim, k, _s) in enumerate(ext_plan):
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = (
            rng.randn(dim, c_in, k).astype(np.float32) * 0.2)
        sd[f"feature_extractor.conv_layers.{i}.2.weight"] = (
            1.0 + rng.randn(dim).astype(np.float32) * 0.1)
        sd[f"feature_extractor.conv_layers.{i}.2.bias"] = (
            rng.randn(dim).astype(np.float32) * 0.1)
        c_in = dim
    for i, (dim, k, _s) in enumerate(agg_plan):
        sd[f"feature_aggregator.conv_layers.{i}.1.weight"] = (
            rng.randn(dim, c_in, k).astype(np.float32) * 0.2)
        sd[f"feature_aggregator.conv_layers.{i}.3.weight"] = (
            1.0 + rng.randn(dim).astype(np.float32) * 0.1)
        sd[f"feature_aggregator.conv_layers.{i}.3.bias"] = (
            rng.randn(dim).astype(np.float32) * 0.1)
        c_in = dim

    # Plans recovered from the dict itself (strides not recoverable: given)
    assert plan_from_state_dict(sd, "feature_extractor",
                                strides=[5, 4, 2]) == ext_plan
    assert plan_from_state_dict(sd, "feature_aggregator") == agg_plan

    class SmallW2V(Wav2VecFeatures):
        def setup(self):
            self.feature_extractor = ConvFeatureExtractor(plan=tuple(ext_plan))
            self.feature_aggregator = ConvAggregator(plan=tuple(agg_plan))

    model = SmallW2V()
    audio = rng.randn(2, 1600).astype(np.float32) * 0.1
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(audio))
    params = convert_fairseq_weights(sd, variables)
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(audio)))

    # torch reference stack on the same weights
    x = torch.from_numpy(audio).unsqueeze(1)  # [B, 1, T]
    for i, (dim, k, s) in enumerate(ext_plan):
        w = torch.from_numpy(sd[f"feature_extractor.conv_layers.{i}.0.weight"])
        x = torch.nn.functional.conv1d(x, w, stride=s)
        g = torch.nn.GroupNorm(1, dim, eps=1e-5)
        g.weight.data = torch.from_numpy(
            sd[f"feature_extractor.conv_layers.{i}.2.weight"])
        g.bias.data = torch.from_numpy(
            sd[f"feature_extractor.conv_layers.{i}.2.bias"])
        x = torch.relu(g(x))
    x = torch.log(torch.abs(x) + 1.0)
    for i, (dim, k, s) in enumerate(agg_plan):
        inp = x
        w = torch.from_numpy(sd[f"feature_aggregator.conv_layers.{i}.1.weight"])
        x = torch.nn.functional.conv1d(x, w, stride=1, padding=k // 2)
        g = torch.nn.GroupNorm(1, dim, eps=1e-5)
        g.weight.data = torch.from_numpy(
            sd[f"feature_aggregator.conv_layers.{i}.3.weight"])
        g.bias.data = torch.from_numpy(
            sd[f"feature_aggregator.conv_layers.{i}.3.bias"])
        x = torch.relu(g(x))
        if inp.shape == x.shape:
            x = x + inp
    ref = x.detach().numpy().transpose(0, 2, 1)  # [B, T, C]

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_wav2vec_converter_rejects_layout_drift():
    """A state dict missing a norm leaf must fail the shape validation, not
    silently leave random weights in place."""
    from tal_asrd_tpu.diarization.wav2vec import (
        convert_fairseq_weights,
        init_wav2vec,
    )

    model, variables = init_wav2vec()
    sd = {"feature_extractor.conv_layers.0.0.weight":
          np.zeros((512, 1, 10), np.float32)}
    with pytest.raises(AssertionError):
        convert_fairseq_weights(sd, variables)
