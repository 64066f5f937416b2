"""End-to-end integration: the BASELINE.json config chain in miniature.

Train the joint model (speaker tokens in the vocabulary) on a tiny synthetic
corpus until it overfits, run the aligned evaluation pipeline (EvalRunner ->
test_result.pkl -> WDER converter -> WER/WDER scoring), and check that
training actually moved the needle: the trained model's corpus WER must be
far below the untrained model's, and the output plumbing must be the exact
format the eval CLIs consume.
"""
import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tal_asrd_tpu.core.config import (
    DecodeConfig,
    FrontendConfig,
    ModelConfig,
    SpecAugmentConfig,
    TrainConfig,
)
from tal_asrd_tpu.data import AlignedDataset, BucketedCollater
from tal_asrd_tpu.eval.convert import convert_results
from tal_asrd_tpu.eval.runner import EvalRunner
from tal_asrd_tpu.eval.wder import corpus_wder
from tal_asrd_tpu.train import ASRSystem
from tests.synthetic_corpus import build_corpus, build_tokenizer

FE = FrontendConfig(n_mels=8, n_fft=64, win_length=64, hop_length=32,
                    mean_subtract=False)


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
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
    items = [ds[i] for i in range(4)]
    batch = coll(items)
    refs = [ds.index[i][1] for i in range(4)]
    return system, tok, batch, refs, cfg


def run_eval(system, tok, params, batch, refs, out_dir):
    runner = EvalRunner(system.model, {"params": params}, tok,
                        DecodeConfig(beam_size=2), out_dir=out_dir)
    runner.test_step_aligned(batch, refs)
    with open(os.path.join(out_dir, "test_result.pkl"), "rb") as f:
        results = pickle.load(f)
    ready = convert_results(results)
    # ready entries: ([(text, speaker, role)], [(text, (emb, sid), role)])
    pairs = [
        ([(t, s) for t, s, _ in ref], [(t, sid) for t, (_, sid), _ in hyp])
        for ref, hyp in ready
    ]
    pairs = [(r, h) for r, h in pairs if r and h]
    if not pairs:
        return 1.0, 1.0
    *_, wder, _, _, wer = corpus_wder(pairs)
    return wer, wder


@pytest.mark.slow
def test_train_decode_score_loop(pipeline, tmp_path):
    system, tok, batch, refs, cfg = pipeline
    rng = jax.random.PRNGKey(0)
    state = system.init_state(rng, batch)
    untrained_params = state.params

    wer_before, _ = run_eval(system, tok, untrained_params, batch, refs,
                             str(tmp_path / "before"))

    step = system.make_train_step()
    loss = None
    for i in range(220):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
        loss = float(metrics["loss"])
    assert np.isfinite(loss)
    assert loss < 0.5, f"did not overfit: final loss {loss}"

    wer_after, wder_after = run_eval(system, tok, state.params, batch, refs,
                                     str(tmp_path / "after"))
    # Untrained decodes garbage (WER >~ 1); overfit model should be far lower.
    assert wer_after < wer_before, (wer_before, wer_after)
    assert wer_after < 0.5, (wer_before, wer_after)
