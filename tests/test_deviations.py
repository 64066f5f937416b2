"""Quantify this framework's documented deviations from the reference.

Three deliberate TPU-first deviations are defaulted on; each test here
measures how much decoded output/loss actually diverges on a trained tiny
model and asserts the divergence stays within the budget recorded in
ARCHITECTURE.md ("Deviation budgets"). If a refactor grows the divergence,
these fail — flip the corresponding parity switch
(DecodeConfig.self_attn_mode='noncausal_ref', history_evict_block=1,
ModelConfig.pad_mask_mode='batch_max') or re-justify the budget.

  A. causal+cached decoding vs the reference's non-causal full-prefix
     re-decode per step (system.py:113-114);
  B. history eviction in blocks of 64 vs the reference's slide-by-1
     (system.py:478-488);
  C. bucketed ('buffer') encoder_padding_mask scaling vs the reference's
     batch-max integer division (models.py:177-187).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tal_asrd_tpu.core.config import (
    FrontendConfig,
    ModelConfig,
    SpecAugmentConfig,
    TrainConfig,
)
from tal_asrd_tpu.data import AlignedDataset, BucketedCollater
from tal_asrd_tpu.decode.reference_mode import greedy_noncausal
from tal_asrd_tpu.decode.unaligned import UnalignedSpec, unaligned_decode
from tal_asrd_tpu.models.asr import ASRModel, encoder_padding_mask
from tal_asrd_tpu.train import ASRSystem
from tests.synthetic_corpus import build_corpus, build_tokenizer

FE = FrontendConfig(n_mels=8, n_fft=64, win_length=64, hop_length=32,
                    mean_subtract=False)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """A tiny model overfit on 4 synthetic utterances (same recipe as
    test_end_to_end) — divergence on random weights is meaningless."""
    root = str(tmp_path_factory.mktemp("corpus"))
    build_corpus(root, n_episodes=1, episode_seconds=40.0)
    tok = build_tokenizer(root, vocab_size=200)
    cfg = ModelConfig(
        model_type="1x", num_speakers=4, n_mels=8, vocab_size=len(tok),
        n_head=2, max_positions=64, dropout=0.0, embed_size=16,
        tds_depths=(1, 1, 1), tds_kernel=5,
    )
    tc = TrainConfig(batch_size=4, lr=2e-3, max_steps=5000, smoothing=0.0,
                     token_replace_prob=0.0)
    no_aug = SpecAugmentConfig(num_freq_masks=0, num_time_masks=0)
    system = ASRSystem(cfg, tc, FE, no_aug, dtype=jnp.float32)
    ds = AlignedDataset(
        root, tok, num_utterances=1, min_segment_duration=1.0,
        speaker_map_loc=os.path.join(root, "speaker_map.json"),
        tokenizer_speakers=True, return_spk_ids=True,
    )
    coll = BucketedCollater(tok.pad_token_id, audio_bucket_seconds=(5,),
                            text_buckets=(24,))
    batch = coll([ds[i] for i in range(4)])
    rng = jax.random.PRNGKey(0)
    state = system.init_state(rng, batch)
    step = system.make_train_step()
    for i in range(220):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
    assert float(metrics["loss"]) < 0.5, float(metrics["loss"])
    return system, tok, batch, state.params


def _token_agreement(a, b):
    n = min(len(a), len(b))
    if n == 0:
        return 0.0
    same = sum(int(x == y) for x, y in zip(a[:n], b[:n]))
    return same / max(len(a), len(b))


@pytest.mark.slow
def test_deviation_causal_vs_noncausal_decode(trained):
    """Deviation A. Greedy causal+cached vs reference-exact non-causal
    re-decode on the overfit model: sequences must agree (the deviation is
    real but must not change outputs on confident models; ARCHITECTURE.md
    budget: >= 90% token agreement on overfit data)."""
    from tal_asrd_tpu.decode.beam import BeamSearchSpec, beam_search

    system, tok, batch, params = trained
    model = system.model
    variables = {"params": params}
    enc = model.apply(variables, jnp.asarray(batch["audio"]),
                      jnp.asarray(batch["audio_lens"]), False,
                      method=ASRModel.encode)
    prime = jnp.asarray(batch["text"][:, :1])
    max_new = int(batch["text"].shape[1])

    spec = BeamSearchSpec(
        beam_size=1, max_new_tokens=max_new, eos_id=tok.eos_token_id,
        vocab_size=model.cfg.num_tokens, text_vocab_size=len(tok),
        force_output=True,
    )
    causal = beam_search(model, variables, enc, prime, spec)
    noncausal = greedy_noncausal(model, variables, enc, prime,
                                 max_len=max_new + 1, eos_id=tok.eos_token_id)

    agreements = []
    for i in range(batch["text"].shape[0]):
        nc_len = int(noncausal["lengths"][i])
        c_len = int(causal["lengths"][i])
        # both buffers carry the 1-token prime at index 0; compare generated
        c_toks = [int(t) for t in np.asarray(causal["tokens"])[i, 1:c_len]]
        nc_toks = [int(t) for t in np.asarray(noncausal["tokens"])[i, 1:nc_len]]
        agreements.append(_token_agreement(c_toks, nc_toks))
    mean_agree = float(np.mean(agreements))
    print(f"[deviation A] causal-vs-noncausal token agreement: "
          f"{mean_agree:.3f} per-sample {np.round(agreements, 3)}")
    assert mean_agree >= 0.90, agreements


@pytest.mark.slow
def test_deviation_history_evict_block(trained):
    """Deviation B. history_evict_block=64 (fast default) vs =1 (reference's
    slide-by-one) on a full-episode unaligned decode with a tiny history cap
    (forces many evictions). Reported as token agreement; budget >= 80%."""
    system, tok, batch, params = trained
    model = system.model
    variables = {"params": params}
    # one "episode": concatenate the 4 overfit utterances
    audio = jnp.asarray(batch["audio"]).reshape(1, -1)
    lens = jnp.asarray([audio.shape[1]])
    enc = model.apply(variables, audio, lens, False, method=ASRModel.encode)
    enc_len = (
        (~np.asarray(enc["encoder_padding_mask"][0])).sum()
        if enc["encoder_padding_mask"] is not None else enc["encoder_out"].shape[1]
    )

    def run(evict):
        spec = UnalignedSpec(
            eos_id=tok.eos_token_id, chunk_size=48,
            max_positions=24,            # small cap -> frequent evictions
            stall_patience=8, max_tokens=196, max_iters=600, max_outer=96,
            history_evict_block=evict,
        )
        out = unaligned_decode(model, variables, enc, jnp.asarray(enc_len), spec)
        n = int(out["num_tokens"])
        return [int(t) for t in np.asarray(out["tokens"])[0, 1:n]]

    fast = run(16)   # block eviction (production default, scaled to the cap)
    ref = run(1)     # reference slide-by-one
    agree = _token_agreement(fast, ref)
    print(f"[deviation B] evict-block 16 vs 1: agreement {agree:.3f} "
          f"(len {len(fast)} vs {len(ref)})")
    assert agree >= 0.80, (agree, fast[:32], ref[:32])


@pytest.mark.slow
def test_deviation_padding_mask_modes(trained):
    """Deviation C. The two mask scalings must COINCIDE when the buffer is
    exactly the batch max (the reference's collation, so 'buffer' is exact
    parity there), and their divergence under an underfilled bucket is
    quantified. The reference's batch-max divisor applied to a bucketed
    buffer mis-scales every sample (it unmasks encoder frames past the true
    audio), so under bucketing 'buffer' is the correct semantics — the
    measured loss blow-up below is WHY the default deviates."""
    system, tok, batch, params = trained
    buf_len = batch["audio"].shape[1]
    lens = np.asarray(batch["audio_lens"])
    assert lens.max() < buf_len, "fixture must underfill the bucket"

    model = system.model
    variables = {"params": params}
    from tal_asrd_tpu.train.losses import masked_token_loss

    # (a) exact-parity check: buffer trimmed to the batch max -> same mask
    trim = int(lens.max())
    m_buffer = np.asarray(encoder_padding_mask(jnp.asarray(lens), trim, 155))
    m_ref = np.asarray(encoder_padding_mask(jnp.asarray(lens), trim, 155,
                                            mode="batch_max"))
    np.testing.assert_array_equal(m_buffer, m_ref)

    # (b) divergence quantification on the underfilled bucket
    losses = {}
    masks = {}
    for mode in ("buffer", "batch_max"):
        cfg2 = ModelConfig(**{**model.cfg.__dict__, "pad_mask_mode": mode})
        m2 = ASRModel(cfg2, model.frontend, model.specaug, dtype=model.dtype)
        (logits, _), _ = m2.apply(
            variables, jnp.asarray(batch["audio"]),
            jnp.asarray(batch["text"][:, :-1]),
            jnp.asarray(batch["audio_lens"]), train=False,
        )
        enc = m2.apply(variables, jnp.asarray(batch["audio"]),
                       jnp.asarray(batch["audio_lens"]), False,
                       method=ASRModel.encode)
        masks[mode] = np.asarray(enc["encoder_padding_mask"])
        losses[mode] = float(masked_token_loss(
            logits, jnp.asarray(batch["text"][:, 1:]),
            jnp.asarray(batch["text_mask"])[:, 1:],
        ))

    frames_differ = int((masks["buffer"] != masks["batch_max"]).sum())
    total = int(np.prod(masks["buffer"].shape))
    print(f"[deviation C] bucketed-mask frames differing: {frames_differ}/{total} "
          f"({100*frames_differ/total:.1f}%); loss buffer={losses['buffer']:.4f} "
          f"batch_max-on-bucket={losses['batch_max']:.4f}")
    assert frames_differ > 0
    # the trained-with-buffer model must be (much) better under its own mask
    assert losses["buffer"] < losses["batch_max"]
