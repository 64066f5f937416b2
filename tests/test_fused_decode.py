"""FusedASRDecoder (Pallas fused layer-step, interpret mode) vs the flax
ASRModel decode surface: step logits/attention parity and state-machine
compatibility."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tal_asrd_tpu.core.config import FrontendConfig, ModelConfig
from tal_asrd_tpu.decode.fused_step import FusedASRDecoder
from tal_asrd_tpu.models import ASRModel

TINY = ModelConfig(
    model_type="1x",
    num_speakers=3,
    n_mels=8,
    vocab_size=16,
    n_head=2,
    max_positions=64,
    dropout=0.0,
    embed_size=8,
    tds_depths=(1, 1, 1),
    tds_kernel=5,
)
TINY_FRONTEND = FrontendConfig(n_mels=8, n_fft=64, win_length=64, hop_length=32)


@pytest.fixture(scope="module")
def built():
    model = ASRModel(TINY, TINY_FRONTEND)
    audio = jax.random.normal(jax.random.PRNGKey(0), (2, 4800)) * 0.1
    lens = jnp.array([4800, 3200])
    y = jnp.zeros((2, 4), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(1)}, audio, y, lens)
    variables = jax.tree_util.tree_map(
        lambda x: x + 0.3 if x.ndim == 0 else x, variables
    )
    enc = model.apply(variables, audio, lens, False, method=ASRModel.encode)
    return model, variables, enc


@pytest.mark.slow
def test_fused_decode_step_matches_flax(built):
    model, variables, enc = built
    fused = FusedASRDecoder(model, interpret=True)

    max_len = 8
    st_ref = model.apply(variables, enc, 2, max_len,
                         method=ASRModel.init_decode_state)
    st_f = fused.apply(variables, enc, 2, max_len,
                       method=FusedASRDecoder.init_decode_state)

    toks = jnp.array([[1], [2]], jnp.int32)
    for step in range(3):
        lo_r, _, at_r, st_ref = model.apply(
            variables, toks, st_ref, method=ASRModel.decode_step
        )
        lo_f, _, at_f, st_f = fused.apply(
            variables, toks, st_f, method=FusedASRDecoder.decode_step
        )
        np.testing.assert_allclose(
            np.asarray(lo_f, np.float32), np.asarray(lo_r, np.float32),
            rtol=2e-3, atol=2e-3, err_msg=f"logits step {step}",
        )
        np.testing.assert_allclose(
            np.asarray(at_f, np.float32), np.asarray(at_r, np.float32),
            rtol=2e-3, atol=2e-3, err_msg=f"attn step {step}",
        )
        toks = jnp.argmax(lo_r, -1)[:, None].astype(jnp.int32)


@pytest.mark.slow
def test_fused_prefill_matches_flax(built):
    model, variables, enc = built
    fused = FusedASRDecoder(model, interpret=True)
    window = enc["encoder_out"][:1]

    mem_f = fused.apply(variables, window,
                        method=FusedASRDecoder.precompute_mem_kvs)
    mem_r = model.apply(variables, window, method=ASRModel.precompute_mem_kvs)
    for li in range(model.cfg.n_decoder_layers):
        b, s, h, dh = mem_r[li]["k"].shape
        np.testing.assert_allclose(
            np.asarray(mem_f[li]["k"], np.float32),
            np.asarray(mem_r[li]["k"], np.float32).reshape(b, s, h * dh),
            rtol=2e-3, atol=2e-3,
        )

    hist = jnp.array([[1, 5, 9, 2, 0, 0]], jnp.int32)
    p_max = hist.shape[1]
    lo_r, at_r, caches_r = model.apply(
        variables, hist, mem_r, None, p_max, method=ASRModel.decode_prefill
    )
    lo_f, at_f, caches_f = fused.apply(
        variables, hist, mem_f, None, p_max,
        method=FusedASRDecoder.decode_prefill,
    )
    np.testing.assert_allclose(np.asarray(lo_f, np.float32),
                               np.asarray(lo_r, np.float32), rtol=1e-5, atol=1e-5)
    # prefilled caches then drive a fused step identical to a flax step
    st_f = {"mem_kvs": mem_f, "caches": caches_f,
            "index": jnp.asarray(4, jnp.int32), "mask": None}
    st_r = {"mem_kvs": mem_r, "caches": caches_r,
            "index": jnp.asarray(4, jnp.int32), "mask": None}
    tok = jnp.array([[3]], jnp.int32)
    lo_f2, _, _, _ = fused.apply(variables, tok, st_f,
                                 method=FusedASRDecoder.decode_step)
    lo_r2, _, _, _ = model.apply(variables, tok, st_r,
                                 method=ASRModel.decode_step)
    np.testing.assert_allclose(np.asarray(lo_f2, np.float32),
                               np.asarray(lo_r2, np.float32),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_unaligned_decode_with_fused_model(built):
    """The unaligned state machine driven by FusedASRDecoder produces the
    same token stream as the flax decode path (tiny spec, interpret mode)."""
    from tal_asrd_tpu.decode.unaligned import UnalignedSpec, unaligned_decode

    model, variables, enc = built
    fused = FusedASRDecoder(model, interpret=True)
    enc_len = jnp.asarray(enc["encoder_out"].shape[1], jnp.int32)
    enc1 = {"encoder_out": enc["encoder_out"][:1],
            "speaker_out": None, "encoder_padding_mask": None}
    spec = UnalignedSpec(
        eos_id=1, chunk_size=8, max_positions=16, stall_patience=6,
        max_tokens=48, max_iters=120, max_outer=24, history_evict_block=4,
    )
    out_ref = unaligned_decode(model, variables, enc1, enc_len, spec)
    out_f = unaligned_decode(fused, variables, enc1, enc_len, spec)
    n_r = int(out_ref["num_tokens"])
    n_f = int(out_f["num_tokens"])
    toks_r = list(np.asarray(out_ref["tokens"])[0, :n_r])
    toks_f = list(np.asarray(out_f["tokens"])[0, :n_f])
    assert toks_r == toks_f, (toks_r, toks_f)


@pytest.mark.slow
def test_fused_decode_step_kv8_token_agreement(built):
    """kv8 (int8 cross-K/V) deviates only by quantization rounding: greedy
    tokens must agree with the flax path and logits stay within a loose
    band. This mirrors the on-silicon accept gate in bench.py."""
    model, variables, enc = built
    fused = FusedASRDecoder(model, interpret=True, kv8=True)

    max_len = 8
    st_ref = model.apply(variables, enc, 2, max_len,
                         method=ASRModel.init_decode_state)
    st_f = fused.apply(variables, enc, 2, max_len,
                       method=FusedASRDecoder.init_decode_state)
    # int8 storage actually happened
    assert st_f["mem_kvs"][0]["k"].dtype == jnp.int8
    assert "sk" in st_f["mem_kvs"][0]

    toks = jnp.array([[1], [2]], jnp.int32)
    for step in range(4):
        lo_r, _, _, st_ref = model.apply(
            variables, toks, st_ref, method=ASRModel.decode_step
        )
        lo_f, _, _, st_f = fused.apply(
            variables, toks, st_f, method=FusedASRDecoder.decode_step
        )
        np.testing.assert_allclose(
            np.asarray(lo_f, np.float32), np.asarray(lo_r, np.float32),
            rtol=0.08, atol=0.08, err_msg=f"kv8 logits step {step}",
        )
        assert bool(jnp.all(jnp.argmax(lo_f, -1) == jnp.argmax(lo_r, -1))), (
            f"greedy token divergence at step {step}"
        )
        toks = jnp.argmax(lo_r, -1)[:, None].astype(jnp.int32)


@pytest.mark.slow
def test_fused_prefill_kv8(built):
    """decode_prefill must dequantize int8 mem K/V for the flax prefill."""
    model, variables, enc = built
    fused = FusedASRDecoder(model, interpret=True, kv8=True)
    mem_kvs = fused.apply(variables, enc["encoder_out"],
                          method=FusedASRDecoder.precompute_mem_kvs)
    y = jnp.array([[1, 2, 3], [2, 3, 4]], jnp.int32)
    logits, attn, caches = fused.apply(
        variables, y, mem_kvs, enc["encoder_padding_mask"], 8,
        method=FusedASRDecoder.decode_prefill,
    )
    # against the exact (unquantized) prefill
    exact = FusedASRDecoder(model, interpret=True)
    mem_e = exact.apply(variables, enc["encoder_out"],
                        method=FusedASRDecoder.precompute_mem_kvs)
    lo_e, _, _ = exact.apply(
        variables, y, mem_e, enc["encoder_padding_mask"], 8,
        method=FusedASRDecoder.decode_prefill,
    )
    np.testing.assert_allclose(np.asarray(logits, np.float32),
                               np.asarray(lo_e, np.float32),
                               rtol=0.08, atol=0.08)


@pytest.mark.slow
def test_fused_decode_step_w8_token_agreement(built):
    """w8 (int8 decoder weights, quantize_packed) deviates only by the weight
    rounding: greedy tokens must agree with the flax path and logits stay
    within a loose band. The quantized weights must ride in the state (set by
    init_decode_state) so the token loop never requantizes."""
    model, variables, enc = built
    fused = FusedASRDecoder(model, interpret=True, kv8=True, w8=True)

    max_len = 8
    st_ref = model.apply(variables, enc, 2, max_len,
                         method=ASRModel.init_decode_state)
    st_f = fused.apply(variables, enc, 2, max_len,
                       method=FusedASRDecoder.init_decode_state)
    # int8 weight storage actually happened, and it rides in the state
    assert "packed" in st_f
    assert st_f["packed"][0]["wqkv"].dtype == jnp.int8
    assert st_f["packed"][0]["sqkv"].ndim == 1

    toks = jnp.array([[1], [2]], jnp.int32)
    for step in range(4):
        lo_r, _, _, st_ref = model.apply(
            variables, toks, st_ref, method=ASRModel.decode_step
        )
        lo_f, _, _, st_f = fused.apply(
            variables, toks, st_f, method=FusedASRDecoder.decode_step
        )
        assert "packed" in st_f  # carried through the step
        np.testing.assert_allclose(
            np.asarray(lo_f, np.float32), np.asarray(lo_r, np.float32),
            rtol=0.1, atol=0.1, err_msg=f"w8 logits step {step}",
        )
        assert bool(jnp.all(jnp.argmax(lo_f, -1) == jnp.argmax(lo_r, -1))), (
            f"greedy token divergence at step {step}"
        )
        toks = jnp.argmax(lo_r, -1)[:, None].astype(jnp.int32)


@pytest.mark.slow
def test_beam_search_with_w8_fused_model(built):
    """beam_search drives FusedASRDecoder(w8): the quantized 'packed' entry
    must survive the search's state plumbing (beam.py reorders only caches/
    spk_caches; everything else is an invariant carry) and produce the same
    tokens as the unquantized fused path at tiny scale."""
    from tal_asrd_tpu.decode import BeamSearchSpec, beam_search

    model, variables, enc = built
    spec = BeamSearchSpec(
        beam_size=2, max_new_tokens=5, eos_id=1,
        vocab_size=model.cfg.num_tokens,
        text_vocab_size=model.cfg.vocab_size, force_output=True,
    )
    y0 = jnp.ones((2, 1), jnp.int32)
    out_e = beam_search(FusedASRDecoder(model, interpret=True),
                       variables, enc, y0, spec)
    out_q = beam_search(FusedASRDecoder(model, interpret=True, kv8=True,
                                        w8=True),
                       variables, enc, y0, spec)
    np.testing.assert_array_equal(np.asarray(out_e["tokens"]),
                                  np.asarray(out_q["tokens"]))
