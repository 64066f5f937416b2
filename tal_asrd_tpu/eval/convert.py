"""Generation results -> WDER-ready format.

Parity target: /root/reference/tal/utils/aligned_to_wder_format.py — converts
test_result.pkl entries (ref utterance dicts, hyp dicts with 'utterance',
'speakerId', and for unaligned runs 'attention' [n_tokens x chunk],
'chunkStart' [n_tokens], 'utteranceTokens') into the wder_ready.pkl spec:

    ref:  [(utt_text, speaker, role), ...]
    hyp:  [(utt_text, (speaker_embedding, speaker_id), role), ...]

For unaligned runs the hypothesis speaker embedding of an utterance is the
attention-weighted sum of separate-SD frame features under each token's
encoder window (aligned_to_wder_format.py:203-216): emb[t] = attn[t] .
sd_features[chunkStart[t] : chunkStart[t]+chunk]. The reference loops per
token with a GPU matmul per utterance; here the whole utterance is one
batched gather + einsum on the accelerator. The word-level variant
(:86-200) groups decoder tokens into words and additionally majority-votes
the separate-SD speaker ids under the word's attention mass.
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _window_embed(attention: np.ndarray, chunk_starts: np.ndarray,
                  sd_features: np.ndarray, use_device: bool = True) -> np.ndarray:
    """[n_tok, chunk] x [n_tok] x [T, D] -> [n_tok, D]."""
    attention = np.asarray(attention, np.float32)
    chunk_starts = np.asarray(chunk_starts, np.int64)
    n_tok, chunk = attention.shape
    t_total, d = sd_features.shape
    # clamp windows into range; zero-pad features at the tail
    pad = np.zeros((chunk, d), np.float32)
    feats = np.concatenate([np.asarray(sd_features, np.float32), pad], axis=0)
    idx = chunk_starts[:, None] + np.arange(chunk)[None, :]
    idx = np.minimum(idx, t_total + chunk - 1)
    # mask attention beyond the true feature length (reference truncates the
    # weight vector to len(feature_chunk))
    valid = idx < t_total
    attn = attention * valid
    if use_device:
        try:
            import jax.numpy as jnp

            out = jnp.einsum(
                "tc,tcd->td", jnp.asarray(attn), jnp.asarray(feats)[jnp.asarray(idx)]
            )
            return np.asarray(out)
        except Exception:
            pass
    return np.einsum("tc,tcd->td", attn, feats[idx])


def hyp_utterance_entry(
    hyp: dict,
    role_map: Optional[dict],
    sd_features: Optional[np.ndarray] = None,
    chunk: int = 357,
) -> Tuple:
    """One hypothesis dict -> (text, (embedding | None, speakerId), role)."""
    sid = hyp.get("speakerId")
    role = (role_map or {}).get(sid, "subject")
    emb = None
    if "speakerEmbed" in hyp:
        # Expected speaker embedding from the beam's parallel track
        # (aligned speaker-token decode; system.py:185-192).
        emb = np.asarray(hyp["speakerEmbed"], np.float32)
    elif sd_features is not None and "attention" in hyp and "chunkStart" in hyp:
        att = np.asarray(hyp["attention"], np.float32)
        if att.shape[-1] != chunk:
            att = att[..., :chunk]
        emb = _window_embed(att, hyp["chunkStart"], sd_features)
    return (hyp["utterance"], (emb, sid), role)


def hyp_word_entries(
    hyp: dict,
    tokenizer,
    role_map: Optional[dict],
    sd_features: np.ndarray,
    sd_ids: Optional[Sequence] = None,
    chunk: int = 357,
) -> List[Tuple]:
    """Word-level variant: per-word embeddings + attention-voted SD speaker
    ids (aligned_to_wder_format.py:86-200 semantics, with the token->word
    grouping done by decode-boundary detection)."""
    u_tok = list(hyp["utteranceTokens"])
    att = np.asarray(hyp["attention"], np.float32)
    cs = np.asarray(hyp["chunkStart"], np.int64)
    sid = hyp.get("speakerId")
    role = (role_map or {}).get(sid, "subject")

    # Group token indices into words: token i opens a new word when appending
    # it to the running slice introduces a space (the reference's boundary
    # scan, aligned_to_wder_format.py:91-100, corrected to fire on the token
    # that starts the word rather than one later).
    from tal_asrd_tpu.align.forced import token_word_groups

    groups = token_word_groups(tokenizer, u_tok)

    out = []
    for a, b in groups:
        word = tokenizer.decode(u_tok[a:b]).strip()
        if not word:
            continue
        emb = _window_embed(att[a:b], cs[a:b], sd_features)
        word_sid = sid
        if sd_ids is not None:
            weights: Dict = defaultdict(float)
            ids = np.asarray(sd_ids)
            for t in range(a, b):
                lo = int(cs[t])
                hi = min(lo + chunk, len(ids))
                w = att[t, : hi - lo]
                for wi, s in zip(w, ids[lo:hi]):
                    weights[int(s)] += float(wi)
            if weights:
                word_sid = max(weights.items(), key=lambda kv: kv[1])[0]
        out.append((word, (emb, word_sid), role))
    return out


def ref_utterance_entry(ref: dict, role_map: Optional[dict] = None) -> Tuple:
    role = ref.get("role") or (role_map or {}).get(ref.get("speaker"), "subject")
    return (ref["utterance"], ref.get("speaker"), role)


def convert_results(
    results: Sequence[Tuple[List[dict], List[dict]]],
    role_map: Optional[dict] = None,
    sd_features: Optional[np.ndarray] = None,
    sd_ids: Optional[Sequence] = None,
    word_level: bool = False,
    tokenizer=None,
    chunk: int = 357,
):
    """Full conversion of (ref_utts, hyp_utts) pairs into wder_ready format."""
    out = []
    for refs, hyps in results:
        ref_entries = [ref_utterance_entry(r, role_map) for r in refs]
        hyp_entries: List[Tuple] = []
        for h in hyps:
            if word_level and sd_features is not None and "utteranceTokens" in h:
                hyp_entries.extend(
                    hyp_word_entries(h, tokenizer, role_map, sd_features,
                                     sd_ids, chunk)
                )
            else:
                hyp_entries.append(
                    hyp_utterance_entry(h, role_map, sd_features, chunk)
                )
        out.append((ref_entries, hyp_entries))
    return out
