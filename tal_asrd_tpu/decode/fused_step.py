"""Fused-kernel decode driver: ASRModel-compatible decode surface backed by
the Pallas fused layer-step kernel (ops/pallas_decode.py).

`FusedASRDecoder` duck-types the four methods the decode loops use —
`init_decode_state`, `decode_step`, `precompute_mem_kvs`, `decode_prefill` —
so it can be passed AS the model into decode/beam.py beam_search and
decode/unaligned.py unaligned_decode (they only touch `model.apply(...,
method=type(model).X)`). The surrounding state machines are unchanged; only
the per-token inner step runs as 1 fused kernel per layer instead of ~20 XLA
ops per layer.

Numerics: attention math in f32 like models/decoder.py; hidden dtype follows
the wrapped model (bf16 in production). Token embedding, positional add and
the tied-factorized output head stay as plain XLA ops (5 ops total — they
fuse well already). Prefill goes through the flax full-sequence path (it is
large-matmul-bound, not overhead-bound) and its caches are flattened into the
kernel layout ([B, L, H*dh]).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from tal_asrd_tpu.models.asr import ASRModel
from tal_asrd_tpu.models.decoder import sinusoidal_positions
from tal_asrd_tpu.ops.pallas_decode import (
    fused_layer_step,
    pack_decoder,
    quantize_mem_kv,
    quantize_packed,
)
from tal_asrd_tpu.ops.pallas_decode_stacked import (
    pack_decoder_stacked,
    stacked_decoder_step,
)


class FusedASRDecoder:
    """Drop-in decode-surface replacement for an ASRModel (inference only).

    kv8=True stores the precomputed cross-attention K/V int8 with per-channel
    f32 scales (ops/pallas_decode.py quantize_mem_kv): the cross-K/V re-read
    is the decode step's dominant HBM traffic, so int8 halves the memory-bound
    floor vs bf16. Greedy-token agreement vs the flax path is the accept gate
    (bench.py fused numerics probe).

    w8=True additionally stores the decoder matmul weights int8 with
    per-output-channel scales (quantize_packed) — the next-largest HBM stream
    after kv8. Quantization runs once in init_decode_state and rides in the
    decode state, so the beam/greedy loops never re-quantize per token; a
    decode_step call whose state lacks the packed weights (the unaligned
    machine builds its state by hand) falls back to the unquantized path."""

    def __init__(self, model: ASRModel, interpret: bool = False,
                 block_b: Optional[int] = None, kv8: bool = False,
                 w8: bool = False, stacked: bool = False):
        assert not model.cfg.use_speaker_head, (
            "fused decode path covers the speaker-token mode; the speaker "
            "head adds a second decoder stack (use the flax path)"
        )
        self.model = model
        self.cfg = model.cfg
        self.dtype = model.dtype
        self.interpret = interpret
        self.block_b = block_b
        self.kv8 = kv8
        self.w8 = w8
        # stacked=True: ONE pallas_call per token over grid=(batch_block,
        # layer) (ops/pallas_decode_stacked.py) instead of one call per
        # layer — Mosaic double-buffers the next layer's weight/K/V DMA
        # behind the current layer's compute and the hidden never leaves
        # VMEM between layers. State layout changes: caches/mem-K/V carry a
        # leading layer axis ([L, B, cap, D]), so beam.py must gather beams
        # along axis 1 (see cache_beam_axis).
        self.stacked = stacked
        # Beam axis of the self-attention cache arrays for beam_search's
        # per-step reorder gather: 0 for per-layer dicts keyed [B*K, ...],
        # 1 for the stacked [L, B*K, cap, D] layout.
        self.cache_beam_axis = 1 if stacked else 0
        self._pe = jnp.asarray(
            sinusoidal_positions(model.cfg.max_positions, model.cfg.d_decoder),
            model.dtype,
        )

    # -- flax-compatible dispatch ---------------------------------------
    def apply(self, variables, *args, method=None, **kwargs):
        assert method is not None
        return method(self, variables, *args, **kwargs)

    # -- shared pieces ---------------------------------------------------
    def _packed(self, variables):
        return pack_decoder(
            variables["params"]["decoder"], self.cfg.n_decoder_layers, self.dtype
        )

    def _packed_stacked(self, variables):
        return pack_decoder_stacked(
            variables["params"]["decoder"], self.cfg.n_decoder_layers,
            self.dtype, w8=self.w8,
        )

    def _embed(self, variables, y_tok: jax.Array) -> jax.Array:
        p = variables["params"]
        e = jnp.take(
            jnp.asarray(p["embedding"]["embedding"], self.dtype), y_tok, axis=0
        )
        if self.cfg.embed_size:
            e = e @ jnp.asarray(p["embedding_proj"], self.dtype)
        return e

    def _logits(self, variables, h: jax.Array) -> jax.Array:
        p = variables["params"]
        if self.cfg.embed_size:
            h = h @ jnp.asarray(p["embedding_proj"], self.dtype).T
        return h @ jnp.asarray(p["embedding"]["embedding"], self.dtype).T

    # -- decode surface --------------------------------------------------
    def encode(self, *args, **kwargs):
        raise AttributeError(
            "FusedASRDecoder is decode-only; run ASRModel.encode separately"
        )

    def init_decode_state(self, variables, encoder_out: Dict[str, Any],
                          batch: int, max_len: int):
        mem = encoder_out["encoder_out"]
        mem_kvs = self.precompute_mem_kvs(variables, mem)
        d = self.cfg.d_decoder
        n_layers = self.cfg.n_decoder_layers
        if self.stacked:
            caches = {
                "k": jnp.zeros((n_layers, batch, max_len, d), self.dtype),
                "v": jnp.zeros((n_layers, batch, max_len, d), self.dtype),
            }
        else:
            caches = tuple(
                {
                    "k": jnp.zeros((batch, max_len, d), self.dtype),
                    "v": jnp.zeros((batch, max_len, d), self.dtype),
                }
                for _ in range(n_layers)
            )
        state = {
            "mem_kvs": mem_kvs,
            "caches": caches,
            "index": jnp.zeros((), jnp.int32),
            "mask": encoder_out["encoder_padding_mask"],
        }
        if self.stacked:
            # Always carried for the stacked kernel: re-stacking per token
            # would be an [L, ...] concat inside the while_loop body; packed
            # once here it rides as an invariant carry (int8 when w8).
            state["packed"] = self._packed_stacked(variables)
        elif self.w8:
            # Quantize ONCE here (outside the token loop) and carry the packed
            # int8 weights in the state: beam.py reorders only caches/
            # spk_caches, so these ride through the while_loop as invariant
            # carries with no per-step requantize.
            state["packed"] = tuple(
                quantize_packed(w) for w in self._packed(variables)
            )
        return state

    def precompute_mem_kvs(self, variables, memory: jax.Array):
        """Per-layer cross K/V, flattened [B, S, H*dh]; int8+scales if kv8.

        stacked=True returns ONE dict of layer-stacked arrays
        ({"k": [L, B, S, D], "v": [L, B, S, D]} + "sk"/"sv" [L, D] under kv8)
        matching stacked_decoder_step's operand layout."""
        out = []
        for li in range(self.cfg.n_decoder_layers):
            lp = variables["params"]["decoder"][f"layers_{li}"]["cross_attn"]
            kv = memory @ jnp.asarray(lp["kv"]["kernel"], self.dtype)
            kv = kv + jnp.asarray(lp["kv"]["bias"], self.dtype)
            k, v = jnp.split(kv, 2, axis=-1)
            if self.kv8:
                k8, sk, v8, sv = quantize_mem_kv(k, v)
                out.append({"k": k8, "v": v8, "sk": sk, "sv": sv})
            else:
                out.append({"k": k, "v": v})
        if self.stacked:
            return {
                key: jnp.stack([kv[key] for kv in out])
                for key in out[0]
            }
        return tuple(out)

    def decode_step(self, variables, y_tok: jax.Array, state: Dict[str, Any]):
        """[B, 1] token -> (logits [B, V], None, mean-layer cross-attn [B, S],
        new_state). Matches ASRModel.decode_step's contract."""
        idx = state["index"]
        x = self._embed(variables, y_tok[:, 0])                    # [B, D]
        x = x + jax.lax.dynamic_slice_in_dim(self._pe, idx, 1, axis=0)[0]

        mask = state["mask"]
        b = x.shape[0]
        if self.stacked:
            s = state["mem_kvs"]["k"].shape[2]
        else:
            s = state["mem_kvs"][0]["k"].shape[1]
        if mask is None:
            bias = jnp.zeros((b, s), jnp.float32)
        else:
            bias = jnp.where(mask, -1e9, 0.0).astype(jnp.float32)
            if bias.shape[0] == 1 and b > 1:
                bias = jnp.broadcast_to(bias, (b, s))

        if self.stacked:
            # One pallas_call for the whole stack; attn comes back already
            # meaned over heads AND layers. The hand-built unaligned state
            # lacks "packed" — fall back to packing here (loop-invariant, so
            # XLA hoists it out of while_loop bodies, same as the per-layer
            # path's fallback).
            stacked_w = state.get("packed") or self._packed_stacked(variables)
            mem = state["mem_kvs"]
            caches = state["caches"]
            x, attn_mean, ck, cv = stacked_decoder_step(
                x, stacked_w, caches["k"], caches["v"], mem["k"], mem["v"],
                bias, idx, n_head=self.cfg.n_head,
                mem_k_scale=mem.get("sk"), mem_v_scale=mem.get("sv"),
                interpret=self.interpret, block_b=self.block_b,
            )
            logits = self._logits(variables, x)
            new_state = dict(state, caches={"k": ck, "v": cv}, index=idx + 1)
            return logits, None, attn_mean, new_state

        packed = state.get("packed") or self._packed(variables)
        caches = state["caches"]
        new_caches = []
        attn_sum = None
        for li, w in enumerate(packed):
            kv = state["mem_kvs"][li]
            x, attn, ck, cv = fused_layer_step(
                x, w, caches[li]["k"], caches[li]["v"], kv["k"], kv["v"],
                bias, idx,
                n_head=self.cfg.n_head, interpret=self.interpret,
                block_b=self.block_b,
                mem_k_scale=kv.get("sk"), mem_v_scale=kv.get("sv"),
            )
            new_caches.append({"k": ck, "v": cv})
            attn_sum = attn if attn_sum is None else attn_sum + attn

        logits = self._logits(variables, x)
        attn_mean = attn_sum / len(packed)
        new_state = dict(state, caches=tuple(new_caches), index=idx + 1)
        return logits, None, attn_mean, new_state

    def decode_prefill(self, variables, y: jax.Array, mem_kvs,
                       mem_mask: Optional[jax.Array], cache_len: int):
        """Flax full-sequence prefill, caches re-flattened to kernel layout.

        mem_kvs here are the FLATTENED per-layer dicts from this class's
        precompute_mem_kvs (or the single layer-stacked dict when
        stacked=True); they are reshaped to [B, S, H, dh] for flax, and the
        returned caches are re-flattened to the kernel layout ([B, L, H*dh]
        per layer, or [L, B, cap, H*dh] stacked).
        """
        h, d = self.cfg.n_head, self.cfg.d_decoder
        dh = d // h

        def unflat(kv):
            b, s, _ = kv["k"].shape
            k, v = kv["k"], kv["v"]
            if "sk" in kv:  # kv8: dequantize for the flax prefill path
                # (prefill happens once per window event — off the hot loop)
                k = (k.astype(jnp.float32) * kv["sk"]).astype(self.dtype)
                v = (v.astype(jnp.float32) * kv["sv"]).astype(self.dtype)
            return {
                "k": k.reshape(b, s, h, dh),
                "v": v.reshape(b, s, h, dh),
            }

        if self.stacked:
            n_layers = self.cfg.n_decoder_layers
            per_layer = tuple(
                {key: mem_kvs[key][li] for key in mem_kvs}
                for li in range(n_layers)
            )
            flax_kvs = tuple(unflat(kv) for kv in per_layer)
        else:
            flax_kvs = tuple(unflat(kv) for kv in mem_kvs)
        logits, attn, caches = self.model.apply(
            variables, y, flax_kvs, mem_mask, cache_len,
            method=ASRModel.decode_prefill,
        )
        if self.stacked:
            stacked_caches = {
                "k": jnp.stack([
                    c["k"].reshape(c["k"].shape[0], c["k"].shape[1], d)
                    for c in caches
                ]),
                "v": jnp.stack([
                    c["v"].reshape(c["v"].shape[0], c["v"].shape[1], d)
                    for c in caches
                ]),
            }
            return logits, attn, stacked_caches
        flat = tuple(
            {
                "k": c["k"].reshape(c["k"].shape[0], c["k"].shape[1], d),
                "v": c["v"].reshape(c["v"].shape[0], c["v"].shape[1], d),
            }
            for c in caches
        )
        return logits, attn, flat
