"""Model unit tests: shapes, ReZero identity-at-init, cache-vs-full parity,
positional encoding golden values, and padding-mask semantics.

The reference has no model tests; its nearest analogs are the inline shape
asserts (system.py:192,206,237) and the receptive-field probe docstring
(models.py:334-346). We make those executable.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tal_asrd_tpu.core.config import FrontendConfig, ModelConfig
from tal_asrd_tpu.models import (
    ASRModel,
    DecoderLMModel,
    RZDecoder,
    SDModel,
    encoder_padding_mask,
    sinusoidal_positions,
    tds_output_length,
)
from tal_asrd_tpu.core.config import LMConfig, SDModelConfig

# Tiny config for fast CPU tests
TINY = ModelConfig(
    model_type="1x",
    num_speakers=4,
    n_mels=8,
    vocab_size=32,
    n_head=2,
    max_positions=64,
    dropout=0.0,
    embed_size=16,
    tds_depths=(1, 1, 1),
    tds_kernel=5,
)
TINY_FRONTEND = FrontendConfig(n_mels=8, n_fft=64, win_length=64, hop_length=32)


def make_model(cfg=TINY, use_spk=False):
    cfg = ModelConfig(**{**cfg.__dict__, "use_speaker_head": use_spk})
    model = ASRModel(cfg, TINY_FRONTEND)
    rng = jax.random.PRNGKey(0)
    audio = jnp.zeros((2, 3200), jnp.float32)
    y = jnp.zeros((2, 10), jnp.int32)
    lens = jnp.array([3200, 1600])
    params = model.init({"params": rng}, audio, y, lens, train=False)
    return model, params, cfg


def test_sinusoidal_positions_golden():
    pe = sinusoidal_positions(16, 8)
    # pe[pos, 2i] = sin(pos / 10000^(2i/d)), pe[pos, 2i+1] = cos(same)
    assert pe[0, 0] == 0.0 and pe[0, 1] == 1.0
    np.testing.assert_allclose(pe[1, 0], np.sin(1.0), rtol=1e-6)
    np.testing.assert_allclose(pe[1, 1], np.cos(1.0), rtol=1e-6)
    np.testing.assert_allclose(pe[3, 2], np.sin(3.0 / 10000 ** (2 / 8)), rtol=1e-6)


def test_tds_output_length():
    # 2001 mel frames (20 s audio) -> 8x reduction with VALID stride-2 convs
    t = tds_output_length(2001, 3, 21)
    assert t == 233  # 2001 -> 991 -> 486 -> 233
    # 3 s -> 301 frames; matches the ~141-frame receptive field comment
    assert tds_output_length(301, 3, 21) == 21  # 301 -> 141 -> 61 -> 21


def test_encoder_padding_mask_matches_reference_semantics():
    # scaled_lens = audio_lens // (max_len // enc_T); mask[i, l:] = True
    lens = jnp.array([1000, 500, 250])
    mask = np.asarray(encoder_padding_mask(lens, 1000, 10))
    # factor = 100 -> scaled = [10, 5, 2]
    assert (~mask[0]).sum() == 10
    assert (~mask[1]).sum() == 5
    assert (~mask[2]).sum() == 2
    assert mask[1, 5:].all() and not mask[1, :5].any()


def test_asr_forward_shapes():
    model, params, cfg = make_model()
    audio = jnp.zeros((2, 3200), jnp.float32)
    y = jnp.zeros((2, 10), jnp.int32)
    lens = jnp.array([3200, 1600])
    (lm_logits, spk_logits), enc = model.apply(params, audio, y, lens, train=False)
    assert lm_logits.shape == (2, 10, cfg.vocab_size + cfg.num_speakers)
    assert spk_logits is None
    # 3200 samples -> 101 mel frames -> TDS len
    expected_t = tds_output_length(101, 3, cfg.tds_kernel)
    assert enc["encoder_out"].shape == (2, expected_t, cfg.d_decoder)


def test_asr_speaker_head_shapes():
    model, params, cfg = make_model(use_spk=True)
    audio = jnp.zeros((2, 3200), jnp.float32)
    y = jnp.zeros((2, 10), jnp.int32)
    lens = jnp.array([3200, 3200])
    (lm_logits, spk_logits), _ = model.apply(params, audio, y, lens, train=False)
    # With a speaker head, the text vocab excludes speaker tokens (models.py:103)
    assert lm_logits.shape == (2, 10, cfg.vocab_size)
    assert spk_logits.shape == (2, 10, cfg.num_speakers)


def test_rezero_identity_at_init():
    """At init all resweights are 0, so the decoder is the identity over its
    input embedding path + output head — outputs identical for different
    encoder memories."""
    model, params, _ = make_model()
    y = jnp.arange(10, dtype=jnp.int32)[None].repeat(2, 0)
    audio1 = jnp.zeros((2, 3200), jnp.float32)
    audio2 = jax.random.normal(jax.random.PRNGKey(1), (2, 3200)) * 0.1
    lens = jnp.array([3200, 3200])

    def logits(audio):
        enc = model.apply(params, audio, lens, train=False, method=ASRModel.encode)
        out, _ = model.apply(params, y, enc, method=ASRModel.decode)
        return out

    np.testing.assert_allclose(
        np.asarray(logits(audio1)), np.asarray(logits(audio2)), atol=1e-5
    )


def test_decode_step_matches_full_causal_decode():
    """KV-cached incremental decode must equal full-prefix causal decode."""
    model, params, cfg = make_model()
    # Perturb resweights so the decoder is not the identity.
    params = jax.tree_util.tree_map(
        lambda x: x + 0.05 if x.ndim == 0 else x, params
    )
    rng = jax.random.PRNGKey(3)
    audio = jax.random.normal(rng, (2, 3200)) * 0.1
    lens = jnp.array([3200, 3200])
    toks = jax.random.randint(jax.random.PRNGKey(4), (2, 6), 0, cfg.vocab_size)

    enc = model.apply(params, audio, lens, train=False, method=ASRModel.encode)
    full_logits, _ = model.apply(params, toks, enc, True, method=ASRModel.decode)

    state = model.apply(params, enc, 2, 16, method=ASRModel.init_decode_state)
    step_logits = []
    for i in range(6):
        logits, _, _, state = model.apply(
            params, toks[:, i : i + 1], state, method=ASRModel.decode_step
        )
        step_logits.append(logits)
    step_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(full_logits), np.asarray(step_logits), atol=2e-4
    )


def test_sd_model_shapes():
    cfg = SDModelConfig(num_speakers=12, n_mels=8, dropout=0.0, embed_size=16,
                        tds_depths=(1, 1, 1), tds_kernel=5)
    model = SDModel(cfg, TINY_FRONTEND)
    audio = jnp.zeros((2, 3200), jnp.float32)
    lens = jnp.array([3200, 1600])
    params = model.init(jax.random.PRNGKey(0), audio, lens, train=False)
    logits, enc = model.apply(params, audio, lens, train=False)
    assert logits.shape[0] == 2 and logits.shape[-1] == 12
    assert enc["encoder_padding_mask"].shape == (2, logits.shape[1])


def test_lm_forward_and_step_parity():
    cfg = LMConfig(vocab_size=50, hidden_size=32, n_head=2, n_layers=2,
                   max_positions=32, dropout=0.0)
    model = DecoderLMModel(cfg)
    toks = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 0, 50)
    params = model.init(jax.random.PRNGKey(1), toks)
    params = jax.tree_util.tree_map(lambda x: x + 0.05 if x.ndim == 0 else x, params)

    full = model.apply(params, toks)
    caches = model.apply(params, 2, 16, method=DecoderLMModel.init_cache)
    outs = []
    idx = jnp.zeros((), jnp.int32)
    for i in range(8):
        logit, caches = model.apply(
            params, toks[:, i : i + 1], caches, idx + i, method=DecoderLMModel.decode_step
        )
        outs.append(logit)
    step = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(step), atol=2e-4)


@pytest.mark.slow
def test_dropout_only_in_train_mode():
    model, params, cfg = make_model(
        ModelConfig(**{**TINY.__dict__, "dropout": 0.5, "tds_dropout": 0.5})
    )
    audio = jnp.zeros((2, 3200), jnp.float32)
    y = jnp.zeros((2, 10), jnp.int32)
    lens = jnp.array([3200, 3200])
    a, _ = model.apply(params, audio, y, lens, train=False)
    b, _ = model.apply(params, audio, y, lens, train=False)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-6)
    # train=True requires dropout+specaug rngs and gives different results
    c, _ = model.apply(
        params, audio, y, lens, train=True,
        rngs={"dropout": jax.random.PRNGKey(1), "specaug": jax.random.PRNGKey(2)},
    )
    d, _ = model.apply(
        params, audio, y, lens, train=True,
        rngs={"dropout": jax.random.PRNGKey(3), "specaug": jax.random.PRNGKey(4)},
    )
    assert not np.allclose(np.asarray(c[0]), np.asarray(d[0]))


def test_enc_posenc_gate_contract():
    """enc_posenc (core/config.py): a posenc-free checkpoint loaded into the
    gated model (alpha missing -> kept at zero init, core/checkpoint.py
    load_params_partial) is bit-identical; a non-zero gate changes logits.
    Motivated by the r5 continuation diagnosis (scripts/diag_ce_by_utt.py)."""
    from tal_asrd_tpu.core.checkpoint import load_params_partial

    model0, params0, _ = make_model()
    # Wake the ReZero gates: at init the decoder residuals are zero and
    # cross-attention (hence the memory posenc) cannot influence logits.
    params0 = jax.tree_util.tree_map(
        lambda a: a + 0.4 if a.ndim == 0 else a, params0
    )
    cfg1 = ModelConfig(**{**TINY.__dict__, "enc_posenc": True})
    model1 = ASRModel(cfg1, TINY_FRONTEND)
    audio = jax.random.normal(jax.random.PRNGKey(3), (2, 12800))
    y = jnp.ones((2, 10), jnp.int32)
    lens = jnp.array([12800, 9600])
    p1 = model1.init(jax.random.PRNGKey(0), audio, y, lens)["params"]
    assert "mem_pos_alpha" in p1
    p1 = load_params_partial(p1, params0["params"], strict=True)
    assert float(p1["mem_pos_alpha"]) == 0.0

    # Memory must be non-empty or the contract test is vacuous (the tiny
    # frontend yields ~13 frames here).
    enc = model1.apply({"params": p1}, audio, lens, train=False,
                       method=ASRModel.encode)
    assert enc["encoder_out"].shape[1] > 0

    (l0, _), _ = model0.apply(params0, audio, y, lens, train=False)
    (l1, _), _ = model1.apply({"params": p1}, audio, y, lens, train=False)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), atol=0)

    p1["mem_pos_alpha"] = jnp.asarray(0.5)
    (l2, _), _ = model1.apply({"params": p1}, audio, y, lens, train=False)
    assert not np.allclose(np.asarray(l0), np.asarray(l2))

    # KV-cached incremental path sees the same gated memory (decode_step
    # consumes init_decode_state's precomputed mem KV).
    st = model1.apply({"params": p1}, enc, 2, 8,
                      method=ASRModel.init_decode_state)
    lg, _, _, _ = model1.apply({"params": p1}, y[:, :1], st,
                               method=ASRModel.decode_step)
    p1["mem_pos_alpha"] = jnp.asarray(0.0)
    st0 = model1.apply({"params": p1}, enc, 2, 8,
                       method=ASRModel.init_decode_state)
    lg0, _, _, _ = model1.apply({"params": p1}, y[:, :1], st0,
                                method=ASRModel.decode_step)
    assert not np.allclose(np.asarray(lg), np.asarray(lg0))
