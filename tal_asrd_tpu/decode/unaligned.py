"""Unaligned full-episode decoding: the sliding-window attention-tracked
state machine, as nested on-device while_loops.

Re-design of System.generate_unaligned (/root/reference/tal/asr/system.py:
254-524), the reference's long-context mechanism: a `chunk_size`-frame encoder
window (357 frames ~ 28.5 s) and a <= max_positions text-history window walk
over an hour-long episode; per generated token, the mean cross-attention
(across layers+heads) gives an attention-centroid progress estimate that
drives the state machine:

  * progress > thresh_prct      -> advance the audio window by shift_prct and
                                   delete the proportional text-history prefix
                                   (system.py:458-476);
  * stall (no progress for stall_patience steps) or n-gram repetition
                                -> skip ahead skip_prct, roll back repeated
                                   tokens, reset history to EOS
                                   (system.py:438-456);
  * a reset inside the last window terminates (system.py:509-519).

TPU structure (static shapes, no host syncs):
  * OUTER while_loop = one iteration per window configuration: clamp + slice
    the encoder window, precompute its cross-attention K/V, and causally
    prefill the decoder KV cache over the current history slice (positions
    restart at 0 per slice, as upstream);
  * INNER while_loop = single-token KV-cached decode steps until a window
    event / history-full / termination; repetition detection runs the
    on-device n-gram mask (ops/ngram.py) instead of the reference's per-step
    host Python loop (util.py:5-17);
  * generated tokens and per-token (chunk_start, attention) alignments
    accumulate into fixed-size device buffers, returned once at the end (the
    reference appends to Python lists and `.cpu()`s attention every token).

Parity notes / deliberate deviations:
  * self-attention is causal+cached (training-matched); the reference decodes
    the full history bidirectionally every step (causal_mask=False) — see
    DecodeConfig.self_attn_mode.
  * when the text history reaches max_positions the reference slides it by 1
    token per step (re-encoding everything each step); we evict
    `history_evict_block` tokens at once and re-prefill (evict_block=1
    reproduces the reference's window contents exactly).

Batch: the reference's implementation is single-episode in practice (its
progress/stall scalars call .item(), system.py:411-421). This function is
written for batch=1 and can be vmapped across episodes; multi-episode
throughput on TPU comes from window-batched transcription (decode/transcribe).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from tal_asrd_tpu.ops.ngram import ngram_repeat_mask


@dataclass
class UnalignedSpec:
    eos_id: int
    chunk_size: int = 357
    max_positions: int = 512
    thresh_prct: float = 0.5
    shift_prct: float = 0.25
    stall_patience: int = 25
    rep_n: int = 5
    skip_prct: float = 0.1
    max_tokens: int = 4096        # generated-token buffer (fixed)
    max_iters: int = 100000       # total decode-step budget
    max_outer: int = 4096         # window-reconfiguration budget
    history_evict_block: int = 64 # tokens evicted when history hits cap (1 = reference)
    warmup_window_steps: int = 5  # progress floor not raised in first steps (system.py:415-417)
    # LM shallow fusion (system.py:368-384): logprobs[:lm_vocab] +=
    # lm_weight * lm_logprobs; the LM never sees speaker tokens (input ids
    # clamped to text_vocab_size - 1, system.py:370-371).
    lm_weight: float = 0.0
    text_vocab_size: Optional[int] = None
    # --- Extensions beyond the reference (both default OFF = parity) -------
    # eos_advance: treat an emitted EOS as a window event — advance the
    # window by the current attention centroid (floored at skip_prct) and
    # make the just-emitted EOS the new history prime. The reference has no
    # EOS handling in this loop; its stall detector needs `stall_patience`
    # garbage tokens to notice an utterance boundary, all of which stay in
    # the transcript (only n-gram repeats are rolled back). For models whose
    # continuation quality collapses at utterance boundaries this removes
    # that garbage tail entirely. Terminates when the window can no longer
    # advance (mirrors "reset inside the last window terminates").
    eos_advance: bool = False
    # stall_rollback: on a stall reset, also roll back the `no_improve`
    # tokens emitted since the last attention progress (the reference rolls
    # back only on n-gram repetition, system.py:438-456) — those tokens were
    # produced while the attention centroid was stuck, i.e. unanchored.
    stall_rollback: bool = False


def unaligned_decode(
    model,
    variables,
    encoder_out: Dict[str, jax.Array],
    encoder_len: jax.Array,            # scalar: valid encoder frames
    spec: UnalignedSpec,
    lm=None,
    lm_variables=None,
):
    """Decode one episode. encoder_out['encoder_out']: [1, S_full, D].

    Returns dict:
      tokens      [1, max_tokens]  (starts with the EOS prime)
      num_tokens  []               total tokens incl. prime
      align_attn  [max_tokens, chunk_size]  attention per generated token
      align_chunk [max_tokens]     window offset per generated token
      iters       []               decode steps executed
    """
    use_lm = lm is not None and spec.lm_weight > 0
    if use_lm:
        assert spec.text_vocab_size is not None, "LM fusion needs text_vocab_size"
        lm_vars = lm_variables if lm_variables is not None else variables

    enc = encoder_out["encoder_out"]          # [1, S, D]
    s_full = enc.shape[1]
    chunk = spec.chunk_size
    p_max = spec.max_positions
    l_max = spec.max_tokens
    skip_amt = int(chunk * spec.skip_prct)
    shift_amt = int(chunk * spec.shift_prct)
    del_prct = spec.shift_prct / spec.thresh_prct
    rollback = 2 * spec.rep_n - 1

    encoder_len = jnp.minimum(encoder_len, s_full)
    last_chunk_start = jnp.maximum(encoder_len - chunk, 0)

    gen = jnp.zeros((1, l_max), jnp.int32).at[0, 0].set(spec.eos_id)
    carry0 = dict(
        gen=gen,
        gen_len=jnp.ones((), jnp.int32),
        align_attn=jnp.zeros((l_max, chunk), jnp.bfloat16),
        align_chunk=jnp.zeros((l_max,), jnp.int32),
        chunk_start=jnp.zeros((), jnp.int32),
        history_start=jnp.zeros((), jnp.int32),
        highest=jnp.zeros((), jnp.float32),
        no_improve=jnp.zeros((), jnp.int32),
        window_time=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), bool),
        iters=jnp.zeros((), jnp.int32),
        outer=jnp.zeros((), jnp.int32),
    )

    def outer_cond(c):
        return (
            ~c["done"]
            & (c["iters"] < spec.max_iters)
            & (c["outer"] < spec.max_outer)
            & (c["gen_len"] < l_max - 1)
        )

    def _guard(cond_val, new, old):
        """Freeze state when cond_val is False. A no-op for the single-lane
        while_loop (the body only runs when cond held), but REQUIRED under
        vmap: batched while_loops run the body for every lane until all lanes
        finish, so finished lanes must keep their state bit-for-bit."""
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(cond_val, a, b), new, old
        )

    def outer_body(c):
        chunk_start = jnp.minimum(c["chunk_start"], last_chunk_start)

        # ---- Window slice + cross-attention K/V (one-time per window) ----
        window = jax.lax.dynamic_slice(
            enc, (0, chunk_start, 0), (1, min(chunk, s_full), enc.shape[2])
        )
        if chunk > s_full:  # short episode: pad window to chunk frames
            window = jnp.pad(window, ((0, 0), (0, chunk - s_full), (0, 0)))
        wmask = (chunk_start + jnp.arange(chunk))[None, :] >= encoder_len

        mem_kvs = model.apply(
            variables, window, method=type(model).precompute_mem_kvs
        )

        # ---- Prefill the decoder cache over the current history slice ----
        hist = jax.lax.dynamic_slice(c["gen"], (0, c["history_start"]), (1, p_max))
        valid = c["gen_len"] - c["history_start"]          # history length
        logits_all, attn_all, caches = model.apply(
            variables, hist, mem_kvs, wmask, p_max,
            method=type(model).decode_prefill,
        )
        last_logits = jax.lax.dynamic_index_in_dim(
            logits_all[0], valid - 1, axis=0, keepdims=False
        )                                                   # [V]
        last_attn = jax.lax.dynamic_index_in_dim(
            attn_all[0], valid - 1, axis=0, keepdims=False
        ).astype(jnp.float32)                               # [chunk]

        attn_range = jnp.arange(chunk, dtype=jnp.float32) / chunk
        is_last = (encoder_len - chunk_start) <= chunk

        lm_extra = {}
        if use_lm:
            # LM prefill over the SAME history slice, speaker tokens clamped
            # out of its input (system.py:368-377).
            lm_hist = jnp.minimum(hist, spec.text_vocab_size - 1)
            lm_logits_all, lm_caches = lm.apply(
                lm_vars, lm_hist, p_max, method=type(lm).decode_prefill
            )
            lm_extra = dict(
                lm_caches=lm_caches,
                lm_last=jax.lax.dynamic_index_in_dim(
                    lm_logits_all[0], valid - 1, axis=0, keepdims=False
                ),
            )

        inner0 = dict(
            **lm_extra,
            gen=c["gen"],
            gen_len=c["gen_len"],
            align_attn=c["align_attn"],
            align_chunk=c["align_chunk"],
            caches=caches,
            cache_idx=valid,
            last_logits=last_logits,
            last_attn=last_attn,
            chunk_start=chunk_start,
            history_start=c["history_start"],
            highest=c["highest"],
            no_improve=c["no_improve"],
            window_time=c["window_time"],
            event=jnp.zeros((), bool),
            done=c["done"],
            iters=c["iters"],
        )

        def inner_cond(ic):
            return (
                ~ic["event"]
                & ~ic["done"]
                & (ic["iters"] < spec.max_iters)
                & (ic["gen_len"] < l_max - 1)
                & (ic["cache_idx"] < p_max)
            )

        def inner_body(ic):
            gen_len = ic["gen_len"]
            # -- Emit token from the previous step's logits (system.py:386),
            # shallow-fused with the LM over the text vocab (system.py:368-384)
            if use_lm:
                logprobs = jax.nn.log_softmax(
                    ic["last_logits"].astype(jnp.float32), -1
                )
                lm_logprobs = jax.nn.log_softmax(
                    ic["lm_last"].astype(jnp.float32), -1
                )
                width = min(logprobs.shape[-1], lm_logprobs.shape[-1])
                fused = logprobs.at[:width].add(
                    spec.lm_weight * lm_logprobs[:width]
                )
                next_tok = jnp.argmax(fused).astype(jnp.int32)
            else:
                next_tok = jnp.argmax(ic["last_logits"]).astype(jnp.int32)
            gen = jax.lax.dynamic_update_slice(
                ic["gen"], next_tok.reshape(1, 1), (0, gen_len)
            )
            align_attn = jax.lax.dynamic_update_slice(
                ic["align_attn"],
                ic["last_attn"].astype(jnp.bfloat16)[None, :],
                (gen_len - 1, 0),
            )
            align_chunk = jax.lax.dynamic_update_slice(
                ic["align_chunk"], ic["chunk_start"].reshape(1), (gen_len - 1,)
            )
            gen_len = gen_len + 1

            # -- Progress tracking (system.py:404-421) --
            prct = jnp.sum(ic["last_attn"] * attn_range)
            improved = prct > ic["highest"]
            no_improve = jnp.where(improved, 0, ic["no_improve"] + 1)
            highest = jnp.where(
                improved & (ic["window_time"] > spec.warmup_window_steps),
                prct, ic["highest"],
            )
            stalling = no_improve >= spec.stall_patience

            # -- Repetition over the model input (system.py:426-429) --
            hist_now = jax.lax.dynamic_slice(
                ic["gen"], (0, ic["history_start"]), (1, p_max)
            )
            valid_now = (gen_len - 1) - ic["history_start"]
            rep = ngram_repeat_mask(hist_now, spec.rep_n, valid_now.reshape(1))
            repeating = jnp.sum(rep) > 2 * spec.rep_n

            # -- EOS-gated window advance (extension; off by default) --
            if spec.eos_advance:
                eos_fire = next_tok == spec.eos_id
            else:
                eos_fire = jnp.zeros((), bool)
            at_end = ic["chunk_start"] >= last_chunk_start
            eos_go = eos_fire & ~at_end
            eos_adv = jnp.maximum(
                (prct * chunk).astype(jnp.int32), skip_amt
            )

            reset = (stalling | repeating) & ~eos_fire
            do_shift = (
                (~reset) & ~eos_fire & (prct > spec.thresh_prct) & ~is_last
            )
            do_reset = reset & ~is_last
            done = ic["done"] | (reset & is_last) | (eos_fire & at_end)

            # -- Reset: skip ahead, roll back repeats (and, with the
            #    stall_rollback extension, the unanchored stall tokens),
            #    history -> EOS --
            rollback_amt = jnp.where(repeating, rollback, 0)
            if spec.stall_rollback:
                rollback_amt = jnp.maximum(
                    rollback_amt, jnp.where(stalling, no_improve, 0)
                )
            gen_len_r = jnp.where(
                do_reset,
                jnp.maximum(gen_len - rollback_amt, 1),
                gen_len,
            )
            gen = jnp.where(
                do_reset,
                jax.lax.dynamic_update_slice(
                    gen, jnp.full((1, 1), spec.eos_id, jnp.int32), (0, gen_len_r - 1)
                ),
                gen,
            )
            gen_len = gen_len_r
            chunk_start = ic["chunk_start"] + jnp.where(
                do_reset, skip_amt, 0
            ) + jnp.where(do_shift, shift_amt, 0) + jnp.where(
                eos_go, eos_adv, 0
            )
            history_size = gen_len - ic["history_start"]
            history_start = jnp.where(
                do_reset | eos_go,
                gen_len - 1,
                ic["history_start"]
                + jnp.where(
                    do_shift,
                    jnp.floor(del_prct * (history_size - 1).astype(jnp.float32)).astype(jnp.int32),
                    0,
                ),
            )
            highest = jnp.where(do_reset | do_shift | eos_go, 0.0, highest)
            window_time = jnp.where(do_reset | do_shift | eos_go, 0,
                                    ic["window_time"] + 1)

            # -- Bounds (system.py:478-488) --
            chunk_start = jnp.minimum(chunk_start, last_chunk_start)
            history_start = jnp.maximum(history_start, jnp.maximum(gen_len - p_max, 0))
            # History at capacity: evict a block and re-prefill (the reference
            # slides by 1/step because it re-encodes everything anyway).
            hit_cap = (gen_len - history_start) >= p_max
            history_start = jnp.where(
                hit_cap,
                jnp.minimum(history_start + spec.history_evict_block, gen_len - 1),
                history_start,
            )
            event = do_reset | do_shift | hit_cap | eos_go

            # -- Next decode step (used only if no event fired) --
            state = {
                "mem_kvs": mem_kvs,
                "caches": ic["caches"],
                "index": ic["cache_idx"],
                "mask": wmask,
            }
            logits, _, attn_mean, new_state = model.apply(
                variables, next_tok.reshape(1, 1), state,
                method=type(model).decode_step,
            )

            lm_new = {}
            if use_lm:
                lm_in = jnp.minimum(next_tok, spec.text_vocab_size - 1)
                lm_logits, lm_caches = lm.apply(
                    lm_vars, lm_in.reshape(1, 1), ic["lm_caches"],
                    ic["cache_idx"], method=type(lm).decode_step,
                )
                lm_new = dict(lm_caches=lm_caches, lm_last=lm_logits[0])

            new_ic = dict(
                **lm_new,
                gen=gen,
                gen_len=gen_len,
                align_attn=align_attn,
                align_chunk=align_chunk,
                caches=new_state["caches"],
                cache_idx=ic["cache_idx"] + 1,
                last_logits=logits[0],
                last_attn=attn_mean[0].astype(jnp.float32),
                chunk_start=chunk_start,
                history_start=history_start,
                highest=highest,
                no_improve=no_improve,
                window_time=window_time,
                event=event,
                done=done,
                iters=ic["iters"] + 1,
            )
            return _guard(inner_cond(ic), new_ic, ic)

        ic = jax.lax.while_loop(inner_cond, inner_body, inner0)

        new_c = dict(
            gen=ic["gen"],
            gen_len=ic["gen_len"],
            align_attn=ic["align_attn"],
            align_chunk=ic["align_chunk"],
            chunk_start=ic["chunk_start"],
            history_start=ic["history_start"],
            highest=ic["highest"],
            no_improve=ic["no_improve"],
            window_time=ic["window_time"],
            done=ic["done"],
            iters=ic["iters"],
            outer=c["outer"] + 1,
        )
        return _guard(outer_cond(c), new_c, c)

    c = jax.lax.while_loop(outer_cond, outer_body, carry0)
    return {
        "tokens": c["gen"],
        "num_tokens": c["gen_len"],
        "align_attn": c["align_attn"],
        "align_chunk": c["align_chunk"],
        "iters": c["iters"],
    }


def unaligned_decode_batched(
    model,
    variables,
    encoder_outs: Dict[str, jax.Array],   # encoder_out [N, S, D] (+ mask)
    encoder_lens: jax.Array,              # [N]
    spec: UnalignedSpec,
    lm=None,
    lm_variables=None,
):
    """Decode N episodes in lockstep via vmap over the single-episode state
    machine. The body guards (`_guard`) freeze finished lanes, so each lane's
    result is bit-identical to its standalone unaligned_decode run; wall time
    is max over lanes instead of sum. Episode encoder outputs must be padded
    to a common S (mask the tail via encoder_lens)."""

    def one(enc, mask, n):
        eo = {"encoder_out": enc[None], "encoder_padding_mask": None if mask is None else mask[None]}
        return unaligned_decode(model, variables, eo, n, spec,
                                lm=lm, lm_variables=lm_variables)

    mask = encoder_outs.get("encoder_padding_mask")
    if mask is None:
        out = jax.vmap(lambda e, n: one(e, None, n))(
            encoder_outs["encoder_out"], encoder_lens
        )
    else:
        out = jax.vmap(one)(encoder_outs["encoder_out"], mask, encoder_lens)
    # squeeze the inner batch=1 axis of tokens: [N, 1, L] -> [N, L]
    out["tokens"] = out["tokens"][:, 0]
    return out
