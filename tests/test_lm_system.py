"""LM training-system tests: dataset chunking, training reduces loss,
perplexity finite, and shallow-fusion wiring through the beam search."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tal_asrd_tpu.core.config import LMConfig
from tal_asrd_tpu.train.lm_system import LMSystem, LMTextDataset, batch_iterator
from tests.synthetic_corpus import SENTENCES, build_tokenizer


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    return build_tokenizer(str(tmp_path_factory.mktemp("tok")), vocab_size=150)


def test_lm_dataset_rows(tok):
    ds = LMTextDataset(SENTENCES * 5, tok, max_len=32)
    assert len(ds) >= 1
    row, mask = ds[0]
    assert row.shape == (32,) and mask.shape == (32,)
    assert mask.sum() > 0


@pytest.mark.slow
def test_lm_training_reduces_loss(tok):
    cfg = LMConfig(vocab_size=len(tok), hidden_size=32, n_head=2, n_layers=2,
                   max_positions=32)
    system = LMSystem(cfg, lr=2e-4, batch_size=4)
    ds = LMTextDataset(SENTENCES * 20, tok, max_len=32)
    losses = system.fit(batch_iterator(ds, 4, epochs=8))
    assert losses[-1] < losses[0]
    ppl = system.perplexity(batch_iterator(ds, 4))
    assert np.isfinite(ppl) and ppl > 1.0


@pytest.mark.slow
def test_lm_fusion_in_beam_search(tok):
    """lm_weight shifts beam-search scores (system.py:127-138 fusion path)."""
    from tal_asrd_tpu.core.config import FrontendConfig, ModelConfig
    from tal_asrd_tpu.decode import BeamSearchSpec, beam_search
    from tal_asrd_tpu.models import ASRModel, DecoderLMModel

    # num_speakers=0 so every candidate token is inside the LM vocabulary —
    # fusion only touches the text-vocab slice (system.py:137 parity), so a
    # speaker-token winner would legitimately be unaffected.
    mcfg = ModelConfig(
        model_type="1x", num_speakers=0, n_mels=8, vocab_size=len(tok),
        n_head=2, max_positions=48, dropout=0.0, embed_size=8,
        tds_depths=(1, 1, 1), tds_kernel=5,
    )
    fe = FrontendConfig(n_mels=8, n_fft=64, win_length=64, hop_length=32)
    model = ASRModel(mcfg, fe)
    audio = jax.random.normal(jax.random.PRNGKey(0), (1, 4800)) * 0.1
    lens = jnp.array([4800])
    variables = model.init({"params": jax.random.PRNGKey(1)}, audio,
                           jnp.zeros((1, 4), jnp.int32), lens)
    enc = model.apply(variables, audio, lens, False, method=ASRModel.encode)

    lcfg = LMConfig(vocab_size=len(tok), hidden_size=32, n_head=2, n_layers=2,
                    max_positions=48)
    lm = DecoderLMModel(lcfg)
    lm_vars = lm.init(jax.random.PRNGKey(2), jnp.zeros((1, 4), jnp.int32))
    lm_vars = jax.tree_util.tree_map(
        lambda x: x + 0.2 if x.ndim == 0 else x, lm_vars
    )

    prime = jnp.ones((1, 1), jnp.int32)
    base_spec = BeamSearchSpec(
        beam_size=2, max_new_tokens=6, eos_id=-1,
        vocab_size=mcfg.vocab_size + mcfg.num_speakers,
        text_vocab_size=len(tok), force_output=True,
    )
    no_lm = beam_search(model, variables, enc, prime, base_spec)
    fused_spec = BeamSearchSpec(**{**base_spec.__dict__, "lm_weight": 5.0})
    with_lm = beam_search(model, variables, enc, prime, fused_spec,
                          lm=lm, lm_params=lm_vars)
    assert float(no_lm["scores"][0]) != float(with_lm["scores"][0])
