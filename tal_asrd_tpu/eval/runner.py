"""Test/evaluation runner: the reference test_step workflow as a library.

Parity target: System.test_step + test_end (/root/reference/tal/asr/
system.py:625-762):
  * aligned mode: teacher-forced CE on unpadded positions + KV-cached beam
    generation terminated on EOS, decode_speakers segmentation, speakerId
    metadata per utterance;
  * unaligned mode: full-episode sliding-window decode, attaching the
    per-utterance attention/chunkStart/utteranceTokens slices consumed by the
    WDER converter (system.py:696-707 index arithmetic mirrored exactly);
  * outputs: accumulated test_result.pkl [(ref_utts, hyp_utts)], plus
    hyp.txt / ref.txt ASR-only lines (system.py:721-735), and the mean test
    CE loss (system.py:744-762).
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from tal_asrd_tpu.core.config import DecodeConfig
from tal_asrd_tpu.decode.beam import BeamSearchSpec, beam_search
from tal_asrd_tpu.decode.unaligned import (
    UnalignedSpec,
    unaligned_decode,
    unaligned_decode_batched,
)
from tal_asrd_tpu.models.asr import ASRModel
from tal_asrd_tpu.train.losses import masked_token_loss


class EvalRunner:
    def __init__(self, model: ASRModel, variables, tokenizer,
                 decode_cfg: DecodeConfig = DecodeConfig(),
                 out_dir: str = "out", spk_weight: float = 0.0,
                 lm=None, lm_variables=None):
        self.model = model
        self.variables = variables
        self.tokenizer = tokenizer
        self.cfg = decode_cfg
        self.out_dir = out_dir
        self.spk_weight = spk_weight
        # Fused Pallas decode path (DecodeConfig.use_fused_decode): replaces
        # the per-token flax decode_step in both generate paths; the state
        # machines themselves are unchanged (decode/fused_step.py).
        self._decode_model = model
        if decode_cfg.use_fused_decode and not model.cfg.use_speaker_head:
            from tal_asrd_tpu.decode.fused_step import FusedASRDecoder

            self._decode_model = FusedASRDecoder(model)
        # Shallow-fusion LM (test.py:47-55); used by both decode paths when
        # decode_cfg.lm_weight > 0.
        self.lm = lm
        self.lm_variables = lm_variables
        self.test_outputs: List = []
        self._losses: List[float] = []
        self._jit = {}
        os.makedirs(out_dir, exist_ok=True)
        # fresh output files (test.py:63-66 clears them)
        for name in ("hyp.txt", "ref.txt"):
            open(os.path.join(out_dir, name), "w").close()

    # ------------------------------------------------------------------
    def _teacher_forced_loss(self, batch) -> float:
        cfg = self.model.cfg
        y = jnp.asarray(batch["text"])
        if cfg.num_speakers > 0 and self.spk_weight == 0:
            y = jnp.minimum(y, cfg.vocab_size + cfg.num_speakers - 1)
        (logits, _), _ = self.model.apply(
            self.variables, jnp.asarray(batch["audio"]), y[:, :-1],
            jnp.asarray(batch["audio_lens"]), train=False,
        )
        loss = masked_token_loss(
            logits, y[:, 1:], jnp.asarray(batch["text_mask"])[:, 1:]
        )
        return float(loss)

    def _generate_fn(self, shape, max_new):
        key = (shape, max_new)
        if key in self._jit:
            return self._jit[key]
        spec = BeamSearchSpec(
            beam_size=self.cfg.beam_size,
            max_new_tokens=max_new,
            eos_id=self.tokenizer.eos_token_id,
            vocab_size=self.model.cfg.num_tokens,
            text_vocab_size=len(self.tokenizer),
            collect_spk=self.model.cfg.use_speaker_head,
            num_speakers=self.model.cfg.num_speakers,
            # Speaker-token models: track expected speaker embeddings per
            # step (system.py:185-192) for the embedding-clustering WDER
            # chain (wder_search_emb.py).
            collect_spk_embed=(
                self.model.cfg.num_speakers > 0
                and not self.model.cfg.use_speaker_head
            ),
            lm_weight=self.cfg.lm_weight if self.lm is not None else 0.0,
        )
        model, lm, lm_vars = self.model, self.lm, self.lm_variables
        dec_model = self._decode_model

        @jax.jit
        def run(variables, audio, lens, prime):
            enc = model.apply(variables, audio, lens, False, method=ASRModel.encode)
            return beam_search(dec_model, variables, enc, prime, spec,
                               lm=lm, lm_params=lm_vars)

        self._jit[key] = run
        return run

    # ------------------------------------------------------------------
    def test_step_aligned(self, batch, ref_utts_per_sample: List[List[dict]]):
        """One aligned test batch. ref_utts_per_sample: the original
        utterance dicts for each sample (the reference's test_index hack,
        system.py:714-716)."""
        loss = self._teacher_forced_loss(batch)
        self._losses.append(loss)

        b, l = batch["text"].shape
        max_new = int(l * 1.1) + 2
        run = self._generate_fn(batch["audio"].shape, max_new)
        prime = jnp.asarray(batch["text"][:, :1])
        out = run(self.variables, jnp.asarray(batch["audio"]),
                  jnp.asarray(batch["audio_lens"]), prime)

        tokens = np.asarray(out["tokens"])
        lengths = np.asarray(out["lengths"])
        found = np.asarray(out["found"])
        spk = np.asarray(out["spk"], np.float32) if "spk" in out else None
        emb = (np.asarray(out["spk_embed"], np.float32)
               if "spk_embed" in out else None)
        text_vocab = self.model.cfg.vocab_size

        hyp_dec, ref_dec = [], []
        for i in range(b):
            if found[i] and lengths[i] > 1:
                hyp = list(tokens[i, : lengths[i] - 1])  # drop final EOS token
                utts, splits = self.tokenizer.decode_speakers(hyp)
                entries = [
                    {"utterance": text, "speakerId": sid} for text, sid in utts
                ]
                if spk is not None:
                    # per-utterance speaker-logit track slices
                    last = 0
                    for e, s in zip(entries, splits):
                        e["speakerLogits"] = spk[i, last : s + 1]
                        last = s
                if emb is not None:
                    # Expected speaker embedding at each utterance's speaker
                    # token. hyp[j] was emitted at beam step j-1 (index 0 is
                    # the prime EOS), so its track row is emb[i, j-1].
                    last = 0
                    for e, s in zip(entries, splits):
                        for j in range(last, min(s + 1, len(hyp))):
                            if hyp[j] >= text_vocab and j >= 1:
                                e["speakerEmbed"] = emb[i, j - 1]
                                break
                        last = s
                hyp_dec.append(entries)
            else:
                hyp_dec.append([])
            ref_dec.append(ref_utts_per_sample[i])

        self._append_outputs(ref_dec, hyp_dec)
        return {"loss": loss}

    # ------------------------------------------------------------------
    def _default_unaligned_spec(self) -> UnalignedSpec:
        return UnalignedSpec(
            eos_id=self.tokenizer.eos_token_id,
            chunk_size=self.cfg.chunk_size,
            max_positions=self.model.cfg.max_positions,
            thresh_prct=self.cfg.thresh_prct,
            shift_prct=self.cfg.shift_prct,
            stall_patience=self.cfg.stall_patience,
            rep_n=self.cfg.rep_n,
            skip_prct=self.cfg.skip_prct,
            history_evict_block=self.cfg.history_evict_block,
            eos_advance=self.cfg.eos_advance,
            stall_rollback=self.cfg.stall_rollback,
            lm_weight=self.cfg.lm_weight if self.lm is not None else 0.0,
            text_vocab_size=len(self.tokenizer),
        )

    def _finish_unaligned(self, gen: List[int], attn: np.ndarray,
                          chunks: np.ndarray, ref_utts: List[dict]):
        hyp = gen[:-1]  # system.py:689 drops the final token
        utts, splits = self.tokenizer.decode_speakers(hyp)
        entries = []
        last = 0
        for (text, sid), split_i in zip(utts, splits):
            e = {
                "utterance": text,
                "speakerId": sid,
                "attention": attn[last : split_i + 1],
                "chunkStart": chunks[last : split_i + 1],
                "utteranceTokens": hyp[last : split_i + 1],
            }
            entries.append(e)
            last = split_i
        self._append_outputs([ref_utts], [entries])
        self._losses.append(0.0)
        return {"num_tokens": len(gen), "num_utterances": len(entries)}

    def test_step_unaligned(self, audio: np.ndarray, audio_len: int,
                            ref_utts: List[dict],
                            spec: Optional[UnalignedSpec] = None):
        """One full episode (batch of 1, as upstream)."""
        model = self.model
        enc = model.apply(
            self.variables, jnp.asarray(audio[None]),
            jnp.asarray([audio_len]), False, method=ASRModel.encode,
        )
        enc_len = (
            int((~np.asarray(enc["encoder_padding_mask"][0])).sum())
            if enc["encoder_padding_mask"] is not None
            else enc["encoder_out"].shape[1]
        )
        if spec is None:
            spec = self._default_unaligned_spec()
        out = unaligned_decode(self._decode_model, self.variables, enc,
                               jnp.asarray(enc_len), spec,
                               lm=self.lm, lm_variables=self.lm_variables)
        n = int(out["num_tokens"])
        gen = list(np.asarray(out["tokens"][0, :n]))
        attn = np.asarray(out["align_attn"][: n - 1], np.float32)
        chunks = np.asarray(out["align_chunk"][: n - 1])
        return self._finish_unaligned(gen, attn, chunks, ref_utts)

    def test_step_unaligned_batched(self, audios: List[np.ndarray],
                                    audio_len: int,
                                    ref_utts_list: List[List[dict]],
                                    spec: Optional[UnalignedSpec] = None):
        """N equal-length episodes in lockstep (unaligned_decode_batched).

        Lanes are token-identical to standalone test_step_unaligned runs
        (the vmapped machine freezes finished lanes; the bf16 attention
        sidecar agrees to ULP — vmap reorders fusions), but wall time is the
        slowest lane instead of the sum — the unaligned eval leg over a
        test split of same-length episodes drops ~Nx in chip time.
        Equal lengths are REQUIRED (callers group by length) so no lane is
        ever padded: padding would perturb the encoder boundary and break
        the token-identity contract."""
        assert all(len(a) == audio_len for a in audios), (
            "batched unaligned eval requires equal-length episodes; "
            "group by length at the call site"
        )
        model = self.model
        a = jnp.asarray(np.stack(audios))
        lens = jnp.full((len(audios),), audio_len, jnp.int32)
        enc = model.apply(self.variables, a, lens, False,
                          method=ASRModel.encode)
        mask = enc.get("encoder_padding_mask")
        if mask is not None:
            enc_lens = jnp.asarray(
                (~np.asarray(mask)).sum(-1), jnp.int32)
        else:
            enc_lens = jnp.full((len(audios),), enc["encoder_out"].shape[1],
                                jnp.int32)
        if spec is None:
            spec = self._default_unaligned_spec()
        out = unaligned_decode_batched(
            self._decode_model, self.variables, enc, enc_lens, spec,
            lm=self.lm, lm_variables=self.lm_variables)
        infos = []
        for lane, ref_utts in enumerate(ref_utts_list):
            n = int(out["num_tokens"][lane])
            gen = list(np.asarray(out["tokens"][lane, :n]))
            attn = np.asarray(out["align_attn"][lane, : n - 1], np.float32)
            chunks = np.asarray(out["align_chunk"][lane, : n - 1])
            infos.append(self._finish_unaligned(gen, attn, chunks, ref_utts))
        return infos

    def test_step_unaligned_vad(self, audio: np.ndarray, audio_len: int,
                                ref_utts: List[dict],
                                max_window_s: float = 20.0,
                                vad_cfg=None, batch_lanes: int = 16):
        """Long-form decode via VAD-gated windows (the reference's OTHER
        long-form path: transcribe.py:113-121,266-310 — VAD pre-gating +
        windowed decode — rather than the sliding-window state machine of
        system.py:254-524).

        Each speech region becomes an independent decode window through the
        jitted aligned beam search (window-initial utterances are the
        model's best distribution: CE ~2.0 vs ~3.8 on continuations,
        scripts/diag_ce_by_utt.py). Windows are bucketed to the collater's
        fixed audio lengths and decoded in fixed-size batches so XLA
        compiles O(buckets) programs, not O(windows)."""
        from tal_asrd_tpu.data.collate import pick_bucket
        from tal_asrd_tpu.vad.windows import vad_decode_windows

        sr = 16000
        wav = np.asarray(audio[:audio_len], np.float32)
        windows = vad_decode_windows(wav, sr, vad_cfg=vad_cfg,
                                     max_window_s=max_window_s)
        buckets = [int(s * sr) for s in (5, 10, 20, 30)]
        eos = self.tokenizer.eos_token_id

        # windows grouped by bucket, decoded in fixed [batch_lanes, bucket]
        # batches (zero-padded rows carry audio_lens=1 and are dropped)
        by_bucket: Dict[int, List[int]] = {}
        for w_ix, (s, e) in enumerate(windows):
            by_bucket.setdefault(pick_bucket(e - s, buckets), []).append(w_ix)

        results: Dict[int, List[int]] = {}
        for bucket, ixs in sorted(by_bucket.items()):
            max_new = max(32, int(bucket / sr * 6))
            for g in range(0, len(ixs), batch_lanes):
                part = ixs[g : g + batch_lanes]
                batch_audio = np.zeros((batch_lanes, bucket), np.float32)
                lens = np.ones((batch_lanes,), np.int32)
                for row, w_ix in enumerate(part):
                    s, e = windows[w_ix]
                    n = min(e - s, bucket)
                    batch_audio[row, :n] = wav[s : s + n]
                    lens[row] = n
                run = self._generate_fn(batch_audio.shape, max_new)
                prime = jnp.full((batch_lanes, 1), eos, jnp.int32)
                out = run(self.variables, jnp.asarray(batch_audio),
                          jnp.asarray(lens), prime)
                tokens = np.asarray(out["tokens"])
                lengths = np.asarray(out["lengths"])
                found = np.asarray(out["found"])
                for row, w_ix in enumerate(part):
                    if found[row] and lengths[row] > 1:
                        results[w_ix] = list(tokens[row, : lengths[row] - 1])
                    else:
                        # no EOS inside max_new: keep the tokens anyway
                        # (transcribe.py keeps truncated windows too)
                        results[w_ix] = list(tokens[row, : lengths[row]])

        # stitch in window order; attach the window's encoder-frame offset as
        # chunkStart so the embedding WDER variant can still window SD
        # features (uniform attention over the window stands in for the
        # state machine's per-token attention rows)
        entries = []
        n_tok_total = 2
        for w_ix, (s, _e) in enumerate(windows):
            hyp = results.get(w_ix, [])
            if not hyp:
                continue
            utts, splits = self.tokenizer.decode_speakers(hyp)
            # encoder-frame index of the window start: 10 ms logmel hop x
            # the TDS time reduction (same scale as align_chunk in the
            # sliding-window machine)
            chunk0 = s // (sr // 100 * self.model.cfg.time_reduction)
            last = 0
            for (text, sid), split_i in zip(utts, splits):
                u_tok = hyp[last : split_i + 1]
                entries.append({
                    "utterance": text,
                    "speakerId": sid,
                    "utteranceTokens": u_tok,
                    "attention": np.full((len(u_tok), 1), 1.0, np.float32),
                    "chunkStart": np.full((len(u_tok),), chunk0, np.int64),
                })
                last = split_i
            n_tok_total += len(hyp)
        self._append_outputs([ref_utts], [entries])
        self._losses.append(0.0)
        return {"num_tokens": n_tok_total, "num_utterances": len(entries),
                "num_windows": len(windows)}

    # ------------------------------------------------------------------
    def _append_outputs(self, ref_dec, hyp_dec):
        self.test_outputs += list(zip(ref_dec, hyp_dec))
        with open(os.path.join(self.out_dir, "test_result.pkl"), "wb") as f:
            pickle.dump(self.test_outputs, f)
        with open(os.path.join(self.out_dir, "hyp.txt"), "a") as f:
            for utts in hyp_dec:
                f.write(" ".join(u["utterance"] for u in utts) + "\n")
        with open(os.path.join(self.out_dir, "ref.txt"), "a") as f:
            for utts in ref_dec:
                f.write(" ".join(u["utterance"] for u in utts) + "\n")

    def test_end(self) -> Dict[str, float]:
        mean = float(np.mean(self._losses)) if self._losses else float("nan")
        print("Loss", mean)
        return {"test_loss": mean}
