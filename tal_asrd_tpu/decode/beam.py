"""Batched beam search as an on-device lax.while_loop with KV caches.

Re-design of System.generate (/root/reference/tal/asr/system.py:68-252). The
reference's loop re-decodes the entire prefix per token with causal_mask=False
and syncs `done`/finished bookkeeping to host every step (system.py:105,198,
209-211); here the whole search runs on device with static shapes:

  * score accumulation + top-k over [B, K*V] with first-step fan-out expressed
    as -inf initial scores on beams 1..K-1 (equivalent to the reference's
    repeat_interleave expansion at system.py:162-171);
  * beam reordering gathers the self-attention KV caches (and the speaker
    track and LM caches) along the flat beam axis;
  * retirement semantics match the reference exactly: `done` flags are
    per-SLOT and are NOT reordered with the beams (system.py:105,215), so a
    slot that produced EOS stays masked for the rest of the search — including
    the reference's quirk that a live continuation written into a dead slot is
    lost. Reproduced for parity; the searcher stores each retired row into a
    fixed [B, K] finished pool;
  * length-normalized selection at the end: score / row_length
    (system.py:240-252), considering the live rows too when `force_output`
    or no terminate token (system.py:221-238);
  * optional LM shallow fusion with speaker-token clamping on the LM input
    (system.py:127-138) through a KV-cached DecoderLMModel;
  * optional per-step speaker-head logits track (the reference's `spk_embeds`
    parallel beam track, system.py:185-192).

Self-attention during decode is causal + cached by default; the reference
decodes with causal_mask=False (bidirectional prefix re-encode). See
DecodeConfig.self_attn_mode for the parity switch — the slow reference mode is
implemented in decode/reference_mode.py.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@dataclass
class BeamSearchSpec:
    """Static parameters of a beam search invocation."""

    beam_size: int
    max_new_tokens: int
    eos_id: int
    vocab_size: int            # full output vocab (text + speaker tokens)
    text_vocab_size: int       # LM vocab (speaker tokens clamped away)
    lm_weight: float = 0.0
    force_output: bool = False
    collect_spk: bool = False
    num_speakers: int = 0
    # Track the EXPECTED speaker embedding per emitted token (speaker-token
    # models): softmax over the speaker-token logit slice x the speaker rows
    # of the tied embedding table — the reference's `spk_embeds` parallel
    # beam track (system.py:185-192) that feeds the embedding-clustering
    # WDER chain (wder_search_emb.py).
    collect_spk_embed: bool = False


def _gather_beams(x: jax.Array, flat_beams: jax.Array) -> jax.Array:
    """Gather rows of a [B*K, ...] tensor by flat beam indices [B*K]."""
    return jnp.take(x, flat_beams, axis=0)


def beam_search(
    model,
    params,
    encoder_out: Dict[str, jax.Array],
    prime: jax.Array,              # [B, P] prime tokens (first is usually EOS)
    spec: BeamSearchSpec,
    lm=None,
    lm_params=None,
):
    """Run beam search. Returns a dict of device arrays:
      tokens   [B, P + max_new]   best row per batch (padded with eos after end)
      lengths  [B]                valid row length (incl. prime and EOS)
      scores   [B]                length-normalized score of the chosen row
      found    [B]                whether any beam terminated
      spk      [B, max_new, S]    speaker-head logits track (if collect_spk)
    """
    b, p = prime.shape
    k = spec.beam_size
    bk = b * k
    l_buf = p + spec.max_new_tokens
    use_lm = lm is not None and spec.lm_weight > 0

    # --- Expand encoder outputs across beams (system.py:162-171 equivalent) --
    enc = {
        "encoder_out": jnp.repeat(encoder_out["encoder_out"], k, axis=0),
        "speaker_out": (
            jnp.repeat(encoder_out["speaker_out"], k, axis=0)
            if encoder_out.get("speaker_out") is not None
            else None
        ),
        "encoder_padding_mask": (
            jnp.repeat(encoder_out["encoder_padding_mask"], k, axis=0)
            if encoder_out.get("encoder_padding_mask") is not None
            else None
        ),
    }

    state = model.apply(
        params, enc, bk, l_buf, method=type(model).init_decode_state
    )

    tokens = jnp.zeros((bk, l_buf), jnp.int32)
    tokens = tokens.at[:, :p].set(jnp.repeat(prime, k, axis=0))

    # Prefill the caches on the prime prefix (static small P; last token feeds
    # the first search step).
    cur_tok = jnp.repeat(prime[:, :1], k, axis=0)  # [BK, 1]
    logits = None
    spk_logits = None
    lm_caches = None
    lm_index = jnp.zeros((), jnp.int32)
    if use_lm:
        lm_caches = lm.apply(params if lm_params is None else lm_params,
                             bk, l_buf, method=type(lm).init_cache)
    lm_logits = None
    for i in range(p):
        logits, spk_logits, _, state = model.apply(
            params, cur_tok, state, method=type(model).decode_step
        )
        if use_lm:
            lm_in = jnp.minimum(cur_tok, spec.text_vocab_size - 1)
            lm_logits, lm_caches = lm.apply(
                lm_params, lm_in, lm_caches, lm_index,
                method=type(lm).decode_step,
            )
            lm_index = lm_index + 1
        if i + 1 < p:
            cur_tok = jnp.repeat(prime[:, i + 1 : i + 2], k, axis=0)

    # --- Search state -------------------------------------------------------
    # Beams 1..K-1 start at -inf so step 0 fans out from beam 0 only.
    scores = jnp.full((b, k), NEG_INF, jnp.float32).at[:, 0].set(0.0)
    done = jnp.zeros((bk,), bool)
    fin_tokens = jnp.zeros((b, k, l_buf), jnp.int32)
    fin_norm = jnp.full((b, k), NEG_INF, jnp.float32)
    fin_len = jnp.zeros((b, k), jnp.int32)
    fin_valid = jnp.zeros((b, k), bool)
    spk_track = (
        jnp.zeros((bk, spec.max_new_tokens, spec.num_speakers), jnp.bfloat16)
        if spec.collect_spk
        else jnp.zeros((bk, 1, 1), jnp.bfloat16)
    )
    fin_spk = jnp.zeros_like(spk_track).reshape((b, k) + spk_track.shape[1:])
    if spec.collect_spk_embed:
        spk_rows = params["params"]["embedding"]["embedding"][
            spec.vocab_size - spec.num_speakers :
        ].astype(jnp.float32)                                   # [S, E]
        emb_track = jnp.zeros(
            (bk, spec.max_new_tokens, spk_rows.shape[1]), jnp.bfloat16
        )
    else:
        spk_rows = None
        emb_track = jnp.zeros((bk, 1, 1), jnp.bfloat16)
    fin_emb = jnp.zeros_like(emb_track).reshape((b, k) + emb_track.shape[1:])

    batch_offset = (jnp.arange(b) * k)[:, None]  # [B, 1]

    def fuse_lm(logprobs, lm_logits_step):
        lm_logprobs = jax.nn.log_softmax(lm_logits_step.astype(jnp.float32), -1)
        width = min(spec.text_vocab_size, spec.vocab_size)
        return logprobs.at[:, :width].add(spec.lm_weight * lm_logprobs[:, :width])

    carry0 = dict(
        step=jnp.zeros((), jnp.int32),
        logits=logits,
        spk_logits=spk_logits if spec.collect_spk else None,
        lm_logits=lm_logits if use_lm else None,
        tokens=tokens,
        scores=scores,
        done=done,
        state=state,
        lm_caches=lm_caches,
        lm_index=lm_index,
        fin_tokens=fin_tokens,
        fin_norm=fin_norm,
        fin_len=fin_len,
        fin_valid=fin_valid,
        spk_track=spk_track,
        fin_spk=fin_spk,
        emb_track=emb_track,
        fin_emb=fin_emb,
    )

    def cond(c):
        return (c["step"] < spec.max_new_tokens) & ~jnp.all(c["done"])

    def body(c):
        step = c["step"]
        logprobs = jax.nn.log_softmax(c["logits"].astype(jnp.float32), -1)  # [BK, V]
        if use_lm:
            logprobs = fuse_lm(logprobs, c["lm_logits"])

        total = logprobs + c["scores"].reshape(-1, 1)
        total = jnp.where(c["done"][:, None], NEG_INF, total)
        flat = total.reshape(b, k * spec.vocab_size)
        new_scores, idx = jax.lax.top_k(flat, k)                 # [B, K]
        best_tok = (idx % spec.vocab_size).astype(jnp.int32)      # [B, K]
        best_beam = idx // spec.vocab_size                        # [B, K]
        flat_beams = (best_beam + batch_offset).reshape(-1)       # [BK]

        # Reorder rows + caches by source beam; with beam_size == 1 the
        # gather is the identity — skipping it saves ~2 full KV-cache copies
        # of HBM traffic per greedy step.
        def reorder(x):
            return x if k == 1 else _gather_beams(x, flat_beams)

        tokens = reorder(c["tokens"])
        write_pos = p + step
        tokens = jax.lax.dynamic_update_slice(
            tokens, best_tok.reshape(-1, 1), (0, write_pos)
        )
        state = dict(c["state"])
        if k > 1:
            # The stacked fused decoder keys its self-attention caches
            # [L, B*K, cap, D] — the beam axis is 1, not 0 (model advertises
            # it via cache_beam_axis; per-layer layouts default to 0).
            cache_axis = getattr(model, "cache_beam_axis", 0)
            reorder_cache = (
                reorder if cache_axis == 0
                else lambda x: jnp.take(x, flat_beams, axis=cache_axis)
            )
            state["caches"] = jax.tree_util.tree_map(
                reorder_cache, c["state"]["caches"]
            )
            if "spk_caches" in state:
                state["spk_caches"] = jax.tree_util.tree_map(
                    reorder, c["state"]["spk_caches"]
                )
        lm_caches = c["lm_caches"]
        if use_lm and k > 1:
            lm_caches = jax.tree_util.tree_map(reorder, lm_caches)

        spk_track = c["spk_track"]
        if spec.collect_spk:
            spk_track = reorder(spk_track)
            spk_track = jax.lax.dynamic_update_slice(
                spk_track,
                c["spk_logits"].astype(jnp.bfloat16)[:, None, :],
                (0, step, 0),
            )
        emb_track = c["emb_track"]
        if spec.collect_spk_embed:
            probs = jax.nn.softmax(
                c["logits"][:, spec.vocab_size - spec.num_speakers :]
                .astype(jnp.float32), axis=-1,
            )
            expected = probs @ spk_rows                       # [BK, E]
            emb_track = reorder(emb_track)
            emb_track = jax.lax.dynamic_update_slice(
                emb_track,
                expected.astype(jnp.bfloat16)[:, None, :],
                (0, step, 0),
            )

        # Retirement (system.py:194-219): slots whose chosen token is EOS and
        # that are not already dead store their row and die. Slot done flags
        # are NOT reordered — reference parity.
        is_eos = (best_tok.reshape(-1) == spec.eos_id)
        newly = is_eos & ~c["done"]
        row_len = (p + step + 1).astype(jnp.float32)
        norm = new_scores.reshape(-1) / row_len                  # [BK]
        newly_bk = newly.reshape(b, k)
        fin_tokens = jnp.where(newly_bk[..., None], tokens.reshape(b, k, -1),
                               c["fin_tokens"])
        fin_norm = jnp.where(newly_bk, norm.reshape(b, k), c["fin_norm"])
        fin_len = jnp.where(newly_bk, p + step + 1, c["fin_len"])
        fin_valid = c["fin_valid"] | newly_bk
        fin_spk = c["fin_spk"]
        if spec.collect_spk:
            fin_spk = jnp.where(
                newly_bk[..., None, None],
                spk_track.reshape((b, k) + spk_track.shape[1:]),
                c["fin_spk"],
            )
        fin_emb = c["fin_emb"]
        if spec.collect_spk_embed:
            fin_emb = jnp.where(
                newly_bk[..., None, None],
                emb_track.reshape((b, k) + emb_track.shape[1:]),
                c["fin_emb"],
            )
        done = c["done"] | is_eos

        # Next-step logits from the chosen tokens.
        cur = best_tok.reshape(-1, 1)
        logits, spk_logits, _, state = model.apply(
            params, cur, state, method=type(model).decode_step
        )
        lm_logits = c["lm_logits"]
        lm_index = c["lm_index"]
        if use_lm:
            lm_in = jnp.minimum(cur, spec.text_vocab_size - 1)
            lm_logits, lm_caches = lm.apply(
                lm_params, lm_in, lm_caches, lm_index, method=type(lm).decode_step
            )
            lm_index = lm_index + 1

        return dict(
            step=step + 1,
            logits=logits,
            spk_logits=spk_logits if spec.collect_spk else None,
            lm_logits=lm_logits if use_lm else None,
            tokens=tokens,
            scores=new_scores,
            done=done,
            state=state,
            lm_caches=lm_caches,
            lm_index=lm_index,
            fin_tokens=fin_tokens,
            fin_norm=fin_norm,
            fin_len=fin_len,
            fin_valid=fin_valid,
            spk_track=spk_track,
            fin_spk=fin_spk,
            emb_track=emb_track,
            fin_emb=fin_emb,
        )

    c = jax.lax.while_loop(cond, body, carry0)

    # --- Final selection (system.py:221-252) -------------------------------
    fin_norm = c["fin_norm"]
    fin_valid = c["fin_valid"]
    fin_tokens = c["fin_tokens"]
    fin_len = c["fin_len"]
    fin_spk = c["fin_spk"]
    fin_emb = c["fin_emb"]
    if spec.force_output:
        # Add the live rows as candidates with length-normalized running scores.
        live_len = (p + c["step"]).astype(jnp.float32)
        live_norm = c["scores"] / live_len
        live_valid = ~c["done"].reshape(b, k)
        take_live = live_valid & (~fin_valid | (live_norm > fin_norm))
        fin_norm = jnp.where(take_live, live_norm, fin_norm)
        fin_tokens = jnp.where(
            take_live[..., None], c["tokens"].reshape(b, k, -1), fin_tokens
        )
        fin_len = jnp.where(take_live, p + c["step"], fin_len)
        if spec.collect_spk:
            fin_spk = jnp.where(
                take_live[..., None, None],
                c["spk_track"].reshape((b, k) + c["spk_track"].shape[1:]),
                fin_spk,
            )
        if spec.collect_spk_embed:
            fin_emb = jnp.where(
                take_live[..., None, None],
                c["emb_track"].reshape((b, k) + c["emb_track"].shape[1:]),
                fin_emb,
            )
        fin_valid = fin_valid | live_valid

    sel_norm = jnp.where(fin_valid, fin_norm, NEG_INF)
    best = jnp.argmax(sel_norm, axis=1)                            # [B]
    take = lambda x: jnp.take_along_axis(
        x, best.reshape((b,) + (1,) * (x.ndim - 1)), axis=1
    )[:, 0]
    out = {
        "tokens": take(fin_tokens),
        "lengths": take(fin_len),
        "scores": take(fin_norm),
        "found": jnp.any(fin_valid, axis=1),
    }
    if spec.collect_spk:
        out["spk"] = take(fin_spk)
    if spec.collect_spk_embed:
        out["spk_embed"] = take(fin_emb)
    return out


def make_generate_fn(model, spec: BeamSearchSpec, lm=None):
    """Build a jitted generate: (params, audio, audio_lens, prime) -> results.

    Encoder + beam search in one XLA program; audio shapes are static per
    bucket (recompiled per distinct shape, cached thereafter)."""

    @partial(jax.jit, static_argnames=())
    def generate(params, audio, audio_lens, prime, lm_params=None):
        enc = model.apply(
            params, audio, audio_lens, False, method=type(model).encode
        )
        return beam_search(model, params, enc, prime, spec, lm, lm_params)

    return generate
