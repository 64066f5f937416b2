"""Unaligned decode-heuristic sweep (ROADMAP r4 branch 3 / r5 gap).

The published r5 numbers show aligned WER 58.5 vs unaligned 92.0 on the SAME
checkpoint: the long-form state machine, not the model, is leaving ~33 WER
points on the table. The diagnosed mechanism (diag_ce_by_utt: continuation CE
pinned at the unigram floor): the model decodes the first utterance of every
fresh window well, then emits unanchored tokens; the reference loop
(tal/asr/system.py:404-456) only notices via the stall detector after
`stall_patience` steps and keeps all of those tokens in the transcript.

This sweeps the state-machine knobs plus the two opt-in extensions
(decode/unaligned.py: eos_advance — EOS fires a window event, advancing to
the attention centroid and re-priming history; stall_rollback — stall resets
roll back the unanchored tail) against WER/WDER, end to end on the real test
split. Each config decodes the full test set through EvalRunner and is scored
with the same wder-format + corpus_wder path as scripts/accuracy.sh, so the
winning row is directly publishable (and reproducible via the new cli.test
flags: --eos-advance --stall-rollback --stall-patience ... ).

    python scripts/unaligned_sweep.py [--acc-dir accuracy] [--configs NAME..]

Appends one JSON row per config to <acc-dir>/unaligned_sweep.jsonl.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

import jax
import jax.numpy as jnp

CONFIGS = {
    # reference-parity defaults == the published r5 leg (control row)
    "base": {},
    # faster stall detection: less garbage committed per utterance boundary
    "stall8": {"stall_patience": 8},
    # + roll the unanchored tail back out of the transcript
    "stall8_rb": {"stall_patience": 8, "stall_rollback": True},
    # EOS fires the window advance (centroid-targeted), zero garbage tail
    "eos": {"eos_advance": True},
    # belt and braces: EOS advance, and stalls (no EOS emitted) both trimmed
    "eos_stall8_rb": {"eos_advance": True, "stall_patience": 8,
                      "stall_rollback": True},
    # coarser skip for the stall path
    "eos_skip25": {"eos_advance": True, "skip_prct": 0.25},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--acc-dir", default="accuracy")
    ap.add_argument("--ckpt", default=None,
                    help="params msgpack (default <acc-dir>/avg_last_3.msgpack)")
    ap.add_argument("--configs", nargs="*", default=list(CONFIGS),
                    help=f"subset of {sorted(CONFIGS)}")
    ap.add_argument("--speakers", type=int, default=8)
    ap.add_argument("--lanes", type=int, default=8)
    ap.add_argument("--out", default=None,
                    help="default <acc-dir>/unaligned_sweep.jsonl")
    args = ap.parse_args()

    d = args.acc_dir
    ckpt = args.ckpt or f"{d}/avg_last_3.msgpack"
    out_path = args.out or f"{d}/unaligned_sweep.jsonl"

    from tal_asrd_tpu.core.checkpoint import load_pytree
    from tal_asrd_tpu.core.config import DecodeConfig, ModelConfig, TrainConfig
    from tal_asrd_tpu.data import AlignedDataset
    from tal_asrd_tpu.data.audio_io import load_audio_segment
    from tal_asrd_tpu.decode.unaligned import UnalignedSpec
    from tal_asrd_tpu.eval.convert import convert_results
    from tal_asrd_tpu.eval.runner import EvalRunner
    from tal_asrd_tpu.eval.wder import corpus_wder
    from tal_asrd_tpu.text import BpeTokenizer
    from tal_asrd_tpu.train import ASRSystem

    tok = BpeTokenizer(model_path=f"{d}/bpe.model")
    params = load_pytree(ckpt)
    mcfg = ModelConfig(model_type="1x", num_speakers=args.speakers,
                       vocab_size=len(tok),
                       enc_posenc="mem_pos_alpha" in params)
    system = ASRSystem(mcfg, TrainConfig())
    variables = {"params": params}

    data_dir = f"{d}/test"
    ds = AlignedDataset(
        data_dir, tok, num_utterances=None, min_segment_duration=None,
        max_segment_duration=None,
        speaker_map_loc=os.path.join(data_dir, "speaker_map.json"),
        tokenizer_speakers=True, return_spk_ids=True,
    )
    groups: dict = {}
    for i in range(len(ds)):
        stub, utts = ds.index[i]
        wav = load_audio_segment(os.path.join(data_dir, f"{stub}.wav"), 0.0, None)
        groups.setdefault(len(wav), []).append((wav, utts))
    n_eps = sum(len(v) for v in groups.values())
    print(f"sweep: {n_eps} episodes in {len(groups)} length groups, "
          f"ckpt {ckpt}", flush=True)

    base_cfg = DecodeConfig()
    for name in args.configs:
        over = CONFIGS[name]
        t0 = time.time()
        with tempfile.TemporaryDirectory() as td:
            runner = EvalRunner(system.model, variables, tok,
                                base_cfg, out_dir=td)
            spec_kw = dict(
                eos_id=tok.eos_token_id,
                chunk_size=base_cfg.chunk_size,
                max_positions=mcfg.max_positions,
                thresh_prct=base_cfg.thresh_prct,
                shift_prct=base_cfg.shift_prct,
                stall_patience=base_cfg.stall_patience,
                rep_n=base_cfg.rep_n,
                skip_prct=base_cfg.skip_prct,
                text_vocab_size=len(tok),
            )
            spec_kw.update(over)
            spec = UnalignedSpec(**spec_kw)
            try:
                for wav_len, items in groups.items():
                    for j in range(0, len(items), args.lanes):
                        part = items[j:j + args.lanes]
                        if len(part) == 1:
                            runner.test_step_unaligned(
                                part[0][0], wav_len, part[0][1], spec=spec)
                        else:
                            runner.test_step_unaligned_batched(
                                [w for w, _ in part], wav_len,
                                [u for _, u in part], spec=spec)
                pairs = convert_results(runner.test_outputs)
                (_, _, wder, _, _, wer) = corpus_wder(
                    pairs, workers=1, verbose=False)
                row = {"config": name, "spec": over,
                       "wer_pct": round(100 * wer, 3),
                       "wder_pct": round(100 * wder, 3),
                       "episodes": n_eps,
                       "secs": round(time.time() - t0, 1),
                       "ckpt": os.path.basename(ckpt)}
            except Exception as e:  # honest failure rows (sweep contract)
                row = {"config": name, "spec": over,
                       "error": f"{type(e).__name__}: {e}"[:2000],
                       "secs": round(time.time() - t0, 1)}
        print(json.dumps(row), flush=True)
        with open(out_path, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
