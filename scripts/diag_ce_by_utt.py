"""Per-utterance-position CE diagnostic for the multi-utterance bridge.

Teacher-forced CE on exact-aligned 4-utterance windows, grouped by the
utterance index of each target token (utterance index = number of EOS tokens
already emitted in the target prefix). Distinguishes the two failure
hypotheses for the stuck val CE (~2.4 vs the 0.5 single-utterance floor):

  * catastrophic forgetting only -> CE roughly flat across positions;
  * continuation structurally blocked (mask / attention can't advance) ->
    CE escalates with utterance index (the r4 signature: 38 -> 69).

    TAL_JAX_PLATFORMS=cpu python scripts/diag_ce_by_utt.py CKPT [--num-utt 4]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tal_asrd_tpu.core.checkpoint import load_pytree
from tal_asrd_tpu.core.config import ModelConfig, SpecAugmentConfig, TrainConfig
from tal_asrd_tpu.data.aligned import AlignedDataset
from tal_asrd_tpu.data.collate import BucketedCollater
from tal_asrd_tpu.text import BpeTokenizer
from tal_asrd_tpu.train.system import ASRSystem


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--acc-dir", default="accuracy")
    ap.add_argument("--num-utt", type=int, default=4)
    ap.add_argument("--max-secs", type=float, default=28.5)
    ap.add_argument("--speakers", type=int, default=8)
    ap.add_argument("--batches", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--enc-posenc", action="store_true", default=False)
    args = ap.parse_args()

    d = args.acc_dir
    tok = BpeTokenizer(model_path=f"{d}/bpe.model")
    mcfg = ModelConfig(model_type="1x", num_speakers=args.speakers,
                       vocab_size=len(tok), enc_posenc=args.enc_posenc)
    sys_ = ASRSystem(mcfg, TrainConfig(), specaug_cfg=SpecAugmentConfig(
        num_freq_masks=0, num_time_masks=0))
    params = load_pytree(args.ckpt)
    coll = BucketedCollater(tok.pad_token_id)

    ds = AlignedDataset(f"{d}/valid", tok, num_utterances=args.num_utt,
                        max_segment_duration=args.max_secs,
                        speaker_map_loc=f"{d}/valid/speaker_map.json",
                        tokenizer_speakers=True, return_spk_ids=True)

    @jax.jit
    def token_ce(params, batch):
        y = batch["text"]
        y = jnp.minimum(y, mcfg.vocab_size + mcfg.num_speakers - 1)
        y_prev, y_target = y[:, :-1], y[:, 1:]
        (lm_logits, _), _ = sys_.model.apply(
            {"params": params}, batch["audio"], y_prev,
            batch["audio_lens"], train=False)
        logp = jax.nn.log_softmax(lm_logits.astype(jnp.float32), axis=-1)
        ce = -jnp.take_along_axis(logp, y_target[..., None], axis=-1)[..., 0]
        return ce, y_target, batch["text_mask"][:, 1:]

    eos = tok.eos_token_id
    # CE sums/counts per utterance index (EOS count in the target prefix)
    sums = np.zeros(args.num_utt + 2)
    cnts = np.zeros(args.num_utt + 2)
    spk_sums = np.zeros(args.num_utt + 2)  # speaker-token positions only
    spk_cnts = np.zeros(args.num_utt + 2)
    n = 0
    for s in range(0, min(args.batches * args.batch_size, len(ds)),
                   args.batch_size):
        items = [ds[i] for i in range(s, min(s + args.batch_size, len(ds)))]
        b = {k: jnp.asarray(v) for k, v in coll(items).items()}
        ce, y_t, mask = jax.device_get(token_ce(params, b))
        prev_eos = np.cumsum(y_t == eos, axis=1) - (y_t == eos)
        uidx = np.clip(prev_eos, 0, args.num_utt + 1)
        is_spk = y_t >= mcfg.vocab_size
        m = np.asarray(mask, bool)
        for u in range(args.num_utt + 2):
            sel = m & (uidx == u)
            sums[u] += ce[sel].sum(); cnts[u] += sel.sum()
            sel_s = sel & is_spk
            spk_sums[u] += ce[sel_s].sum(); spk_cnts[u] += sel_s.sum()
        n += len(items)

    out = {"ckpt": args.ckpt, "num_utt": args.num_utt, "windows": n,
           "ce_by_utt": [round(s / c, 3) if c else None
                         for s, c in zip(sums, cnts)],
           "tokens_by_utt": cnts.astype(int).tolist(),
           "spk_ce_by_utt": [round(s / c, 3) if c else None
                             for s, c in zip(spk_sums, spk_cnts)],
           "overall": round(sums.sum() / max(cnts.sum(), 1), 4)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
