"""Beam search tests.

Strategy (SURVEY §4: "beam-search parity vs a slow reference decoder"): a
direct Python re-implementation of the reference's beam bookkeeping
(system.py:94-252 semantics — score accumulation, per-slot done masking,
length-normalized selection) drives the same model via full-prefix causal
decode; the on-device while_loop searcher must pick identical outputs.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tal_asrd_tpu.core.config import FrontendConfig, ModelConfig
from tal_asrd_tpu.decode import BeamSearchSpec, beam_search
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
EOS = 1


def build(seed=0, use_spk=False):
    cfg = ModelConfig(**{**TINY.__dict__, "use_speaker_head": use_spk})
    model = ASRModel(cfg, TINY_FRONTEND)
    audio = jax.random.normal(jax.random.PRNGKey(seed), (2, 4800)) * 0.1
    lens = jnp.array([4800, 4800])
    y = jnp.zeros((2, 4), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(seed + 1)}, audio, y, lens)
    # Perturb resweights so the decoder actually conditions on context.
    variables = jax.tree_util.tree_map(
        lambda x: x + 0.3 if x.ndim == 0 else x, variables
    )
    enc = model.apply(variables, audio, lens, False, method=ASRModel.encode)
    return model, variables, enc, cfg


def py_reference_beam(model, variables, enc, prime, k, max_new, vocab, eos):
    """Slow Python beam with the reference's exact bookkeeping."""
    b, p = prime.shape
    rows = [list(prime[i]) for i in range(b) for _ in range(k)]
    scores = np.zeros((b, k))
    scores[:, 1:] = -1e30  # fan-out from beam 0 at step 0
    done = np.zeros(b * k, bool)
    finished = [[] for _ in range(b)]

    def expand_enc(x):
        return np.repeat(np.asarray(x), k, axis=0) if x is not None else None

    enc_k = {
        "encoder_out": jnp.asarray(expand_enc(enc["encoder_out"])),
        "speaker_out": None,
        "encoder_padding_mask": jnp.asarray(expand_enc(enc["encoder_padding_mask"])),
    }

    for step in range(max_new):
        toks = jnp.asarray(np.array(rows, np.int32))
        logits, _ = model.apply(variables, toks, enc_k, True, method=ASRModel.decode)
        logp = np.asarray(jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), -1))
        total = logp + scores.reshape(-1, 1)
        total[done] = -1e30
        flat = total.reshape(b, k * vocab)
        idx = np.argsort(-flat, axis=1)[:, :k]
        new_scores = np.take_along_axis(flat, idx, axis=1)
        best_tok = idx % vocab
        best_beam = idx // vocab

        new_rows = []
        for i in range(b):
            for j in range(k):
                src = i * k + int(best_beam[i, j])
                new_rows.append(rows[src] + [int(best_tok[i, j])])
        rows = new_rows
        scores = new_scores
        for flat_i in range(b * k):
            i, j = divmod(flat_i, k)
            if int(best_tok[i, j]) == eos and not done[flat_i]:
                finished[i].append((rows[flat_i], scores[i, j] / len(rows[flat_i])))
                done[flat_i] = True
        if done.all():
            break

    outs = []
    for i in range(b):
        assert finished[i], "no finished beam in reference run"
        outs.append(max(finished[i], key=lambda t: t[1]))
    return outs


@pytest.mark.slow
def test_beam_matches_python_reference():
    model, variables, enc, cfg = build()
    vocab = cfg.vocab_size + cfg.num_speakers
    prime = np.full((2, 1), EOS, np.int32)
    k, max_new = 3, 12

    spec = BeamSearchSpec(
        beam_size=k, max_new_tokens=max_new, eos_id=EOS,
        vocab_size=vocab, text_vocab_size=cfg.vocab_size,
    )
    out = beam_search(model, variables, enc, jnp.asarray(prime), spec)
    ref = py_reference_beam(model, variables, enc, prime, k, max_new, vocab, EOS)

    for i in range(2):
        ref_row, ref_score = ref[i]
        got_len = int(out["lengths"][i])
        got_row = list(np.asarray(out["tokens"][i][:got_len]))
        assert got_row == ref_row, (i, got_row, ref_row)
        np.testing.assert_allclose(float(out["scores"][i]), ref_score, rtol=1e-3)


@pytest.mark.slow
def test_greedy_is_beam_one():
    model, variables, enc, cfg = build(seed=3)
    vocab = cfg.vocab_size + cfg.num_speakers
    prime = jnp.full((2, 1), EOS, jnp.int32)
    spec = BeamSearchSpec(
        beam_size=1, max_new_tokens=10, eos_id=EOS,
        vocab_size=vocab, text_vocab_size=cfg.vocab_size, force_output=True,
    )
    out = beam_search(model, variables, enc, prime, spec)
    assert out["tokens"].shape == (2, 11)
    assert np.asarray(out["found"]).all()

    # Manual greedy rollout through full causal decode must agree.
    for i in range(2):
        row = [EOS]
        enc_i = {
            "encoder_out": enc["encoder_out"][i : i + 1],
            "speaker_out": None,
            "encoder_padding_mask": enc["encoder_padding_mask"][i : i + 1],
        }
        for _ in range(10):
            logits, _ = model.apply(
                variables, jnp.asarray([row], jnp.int32), enc_i, True,
                method=ASRModel.decode,
            )
            nxt = int(jnp.argmax(logits[0, -1]))
            row.append(nxt)
            if nxt == EOS:
                break
        got_len = int(out["lengths"][i])
        got = list(np.asarray(out["tokens"][i][:got_len]))
        assert got == row, (got, row)


@pytest.mark.slow
def test_speaker_track_collection():
    model, variables, enc, cfg = build(seed=5, use_spk=True)
    prime = jnp.full((2, 1), EOS, jnp.int32)
    spec = BeamSearchSpec(
        beam_size=2, max_new_tokens=8, eos_id=EOS,
        vocab_size=cfg.vocab_size, text_vocab_size=cfg.vocab_size,
        force_output=True, collect_spk=True, num_speakers=cfg.num_speakers,
    )
    out = beam_search(model, variables, enc, prime, spec)
    assert out["spk"].shape == (2, 8, cfg.num_speakers)
    assert np.isfinite(np.asarray(out["spk"], np.float32)).all()


def test_beam_search_jits():
    model, variables, enc, cfg = build(seed=7)
    vocab = cfg.vocab_size + cfg.num_speakers
    spec = BeamSearchSpec(
        beam_size=2, max_new_tokens=6, eos_id=EOS,
        vocab_size=vocab, text_vocab_size=cfg.vocab_size, force_output=True,
    )
    f = jax.jit(lambda v, e, p: beam_search(model, v, e, p, spec))
    out = f(variables, enc, jnp.full((2, 1), EOS, jnp.int32))
    assert out["tokens"].shape == (2, 7)


def test_spk_embed_track_expected_embedding():
    """collect_spk_embed tracks softmax(speaker logits) @ speaker embedding
    rows per emitted token (the reference's spk_embeds beam track,
    system.py:185-192)."""
    model, variables, enc, cfg = build(seed=9)
    vocab = cfg.vocab_size + cfg.num_speakers
    prime = jnp.full((2, 1), EOS, jnp.int32)
    spec = BeamSearchSpec(
        beam_size=1, max_new_tokens=5, eos_id=-1,  # never terminates
        vocab_size=vocab, text_vocab_size=cfg.vocab_size,
        force_output=True, collect_spk_embed=True,
        num_speakers=cfg.num_speakers,
    )
    out = beam_search(model, variables, enc, prime, spec)
    emb = np.asarray(out["spk_embed"], np.float32)
    assert emb.shape == (2, 5, cfg.embed_size)
    assert np.isfinite(emb).all()

    # Independent recomputation of step 0: greedy decode_step from the prime,
    # expected embedding = softmax over speaker-slice logits @ E[vocab:].
    state = model.apply(variables, {
        "encoder_out": enc["encoder_out"],
        "speaker_out": None,
        "encoder_padding_mask": enc["encoder_padding_mask"],
    }, 2, 6, method=ASRModel.init_decode_state)
    logits, _, _, state = model.apply(
        variables, prime, state, method=ASRModel.decode_step
    )
    probs = np.asarray(
        jax.nn.softmax(jnp.asarray(logits)[:, cfg.vocab_size:].astype(jnp.float32), -1)
    )
    rows = np.asarray(
        variables["params"]["embedding"]["embedding"][cfg.vocab_size:],
        np.float32,
    )
    expected0 = probs @ rows
    np.testing.assert_allclose(emb[:, 0], expected0, rtol=0.05, atol=0.05)
