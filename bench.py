"""Benchmark: joint ASR+diarization decode throughput on one chip.

Three first-class configurations (VERDICT r1 #3 — bench the reference
configs, not just the friendly one):

  1. greedy window-batched decode (headline, serving path): log-mel + TDS
     encode over a batch of 28.5 s windows + fixed-budget greedy KV-cached
     decode, EOS disabled so every window pays the full token budget;
  2. beam-5 window-batched decode — the reference's aligned-eval default
     (tal/asr/args.py:25);
  3. the unaligned full-episode state machine (system.py:254-524 equivalent)
     over one long synthetic episode — the long-form product path.

Plus measured MFU: achieved FLOP/s of the jitted encode+decode against the
chip's bf16 peak (XLA cost_analysis FLOPs / wall time / PEAK_BF16).

Output: ONE JSON line; `metric`/`value`/`unit`/`vs_baseline` describe the
headline (config 1); the other configs ride as extra keys.

Env overrides: BENCH_BATCH, BENCH_STEPS, BENCH_BEAM, BENCH_ITERS,
BENCH_EPISODE_SECS (unaligned episode length), BENCH_SKIP_EXTRAS=1 (headline
only), BENCH_PEAK_TFLOPS (default 197 = TPU v5e bf16).
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from tal_asrd_tpu.core.config import ModelConfig
from tal_asrd_tpu.decode import BeamSearchSpec, beam_search
from tal_asrd_tpu.decode.fused_step import FusedASRDecoder
from tal_asrd_tpu.decode.unaligned import (
    UnalignedSpec,
    unaligned_decode_batched,
)
from tal_asrd_tpu.models import ASRModel
from tal_asrd_tpu.utils.flops import greedy_decode_flops, greedy_decode_roofline

WINDOW_SECS = 28.56  # 357 encoder frames ~ 28.5 s (system.py:658 chunk)
SR = 16000


def _timed(fn, fetch, iters):
    """Pipelined serving-style timing: dispatch iters calls back-to-back and
    fence once (block_until_ready does not reliably fence the axon tunnel)."""
    out = fn()
    np.asarray(fetch(out))  # warmup + compile fence
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(fetch(out))
    return (time.perf_counter() - t0) / iters


def _flops_of(jitted, *args):
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception:
        return None


def _deadline_guard():
    """The axon tunnel fails by HANGING, not erroring (observed 2026-08-17
    and 2026-08-18 overnight outages): a dead backend blocks the first device
    dispatch forever, so without a guard the driver's end-of-round bench run
    records a timeout with NO output (BENCH_r03 failure mode). This timer
    emits the one-line JSON contract with an explicit error and hard-exits,
    so a dead tunnel yields a fast, self-describing artifact instead.

    Default 2100 s comfortably covers a healthy full run (compile ~40 s +
    three decode legs, ~5-15 min on one v5e); override with BENCH_DEADLINE_S.
    """
    secs = float(os.environ.get("BENCH_DEADLINE_S", "2100"))

    def fire():
        print(json.dumps({
            "metric": "joint_decode_audio_hours_per_hour_per_chip",
            "value": 0.0,
            "unit": "audio-hours/hour",
            "vs_baseline": 0.0,
            "error": f"bench deadline {secs:.0f}s exceeded — backend hang "
                     "(the axon tunnel fails by hanging; see "
                     "accuracy/chain/outages.log)",
        }), flush=True)
        os._exit(1)

    t = threading.Timer(secs, fire)
    t.daemon = True
    t.start()
    return t


def main():
    # BENCH_PLATFORM=cpu: reliable platform pin for CPU smokes (the env-var
    # JAX_PLATFORMS route is sometimes pre-empted by the axon plugin; the
    # in-process config update is not).
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    guard = _deadline_guard()
    # Default 256 per the pre-committed flip criteria (ROADMAP): the real-chip
    # sweep (PERF_SWEEP.jsonl, 2026-08-18) shows 14156 audio-h/h at 256 vs
    # 7898 at 32 (+79%, >> the 10% gate); throughput-per-chip is the metric.
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    max_new = int(os.environ.get("BENCH_STEPS", "96"))
    beam = int(os.environ.get("BENCH_BEAM", "1"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    episode_secs = float(os.environ.get("BENCH_EPISODE_SECS", "600"))
    # N full episodes decoded in lockstep through the vmapped state machine
    # (decode/unaligned.py unaligned_decode_batched): serving throughput for
    # the long-form path is lanes x episode time / max-lane wall, which the
    # reference cannot express (its machine is host-sequential per episode,
    # system.py:411-421). Lane-equivalent single-episode numbers from earlier
    # rounds = value / unaligned_episodes.
    episodes = int(os.environ.get("BENCH_EPISODES", "4"))
    skip_extras = os.environ.get("BENCH_SKIP_EXTRAS", "0") == "1"
    # BENCH_COMPILE_ONLY=1: lower+compile the headline decode graph and exit
    # without executing — the sweep's pre-probe (VERDICT r4 #8). A Mosaic
    # rejection of a new kernel config then costs seconds of XLA time, not a
    # timed row's full timeout (PERF_SWEEP.jsonl rows 5-8 burned ~1 h of the
    # r4 recovery window on a known-broken config).
    compile_only = os.environ.get("BENCH_COMPILE_ONLY", "0") == "1"
    peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "197")) * 1e12

    t = int(WINDOW_SECS * SR)
    # TAL_TINY_ARCH: same debug shrink as cli/args.py:119 — makes the full
    # bench CPU-smokeable (tests/test_bench_smoke.py). Numbers are flagged.
    tiny = bool(os.environ.get("TAL_TINY_ARCH"))
    # BENCH_CONV_IMPL: grouped-conv lowering A/B (ops/grouped_conv.py —
    # "xla" | "packed" | "tap"; default "auto" = current per-backend choice)
    cfg = ModelConfig(model_type="2x", num_speakers=64, vocab_size=10000,
                      conv_impl=os.environ.get("BENCH_CONV_IMPL", "auto"),
                      **(dict(tds_depths=(1, 1, 1), width_mult=0.1,
                              d_decoder_override=64) if tiny else {}))
    model = ASRModel(cfg, dtype=jnp.bfloat16)
    # BENCH_FUSED: decode through the fused Pallas layer-step kernel
    # (ops/pallas_decode.py); encode stays on the flax/XLA path.
    # Default ON for TPU per the pre-committed flip criteria (ROADMAP): the
    # real-chip sweep row batch=256/block=8 measured 18588 audio-h/h vs the
    # flax path's 14156 at the same batch (+31%, >> the 5% gate) with the
    # greedy-token-match numerics probe TRUE (PERF_SWEEP.jsonl, 2026-08-18).
    # Mosaic compiles only on TPU, so non-TPU runs (CPU smokes, dryruns)
    # default to the flax path unless BENCH_FUSED is set explicitly.
    try:
        on_tpu = any(d.platform == "tpu" for d in jax.devices())
    except Exception:
        on_tpu = False
    use_fused = os.environ.get("BENCH_FUSED", "1" if on_tpu else "0") == "1"
    fused_block = int(os.environ.get("BENCH_FUSED_BLOCK", "8"))
    # BENCH_FUSED_INTERPRET=1: CPU smoke of the fused code path (Mosaic
    # compiles only on TPU); numbers are meaningless, plumbing is real.
    fused_interp = os.environ.get("BENCH_FUSED_INTERPRET", "0") == "1"
    # BENCH_FUSED_KV8=1: int8 cross-K/V in the fused step (halves the decode
    # step's dominant HBM read); the fused numerics probe below carries the
    # accept gate (greedy-token agreement vs flax).
    fused_kv8 = os.environ.get("BENCH_FUSED_KV8", "0") == "1"
    # BENCH_FUSED_W8=1: int8 decoder weights in the fused step (halves the
    # next-largest HBM stream after kv8); same accept gate.
    fused_w8 = os.environ.get("BENCH_FUSED_W8", "0") == "1"
    # BENCH_FUSED_STACKED=1: all 4 layers in ONE pallas_call per token
    # (grid=(batch_block, layer); ops/pallas_decode_stacked.py) — Mosaic
    # double-buffers the next layer's weight DMA behind the current layer's
    # compute and the hidden never leaves VMEM between layers. The stacked
    # VMEM plan only fits with int8 weights, so stacked forces w8 (and uses
    # the same greedy-token accept gate as every fused variant).
    fused_stacked = os.environ.get("BENCH_FUSED_STACKED", "0") == "1"
    fused_w8 = fused_w8 or fused_stacked
    dec_model = (FusedASRDecoder(model, block_b=fused_block,
                                 interpret=fused_interp, kv8=fused_kv8,
                                 w8=fused_w8, stacked=fused_stacked)
                 if use_fused else model)

    rng = jax.random.PRNGKey(0)
    audio = jax.random.normal(rng, (batch, t), jnp.float32) * 0.1
    audio_lens = jnp.full((batch,), t, jnp.int32)
    y0 = jnp.zeros((batch, 4), jnp.int32)
    variables = model.init({"params": rng}, audio, y0, audio_lens)
    # Inference-width params: cast the f32 master weights to the model's bf16
    # compute dtype ONCE, outside the decode loops. Flax casts per use, but
    # the cast then sits INSIDE the decode while_loop body (the weights enter
    # the loop carry at f32 width — verified in the lowered HLO), so every
    # decode step re-reads the weights at twice the roofline's assumed bf16
    # width unless XLA happens to hoist the converts. BENCH_BF16_PARAMS=0
    # restores f32 master weights for A/B runs.
    if os.environ.get("BENCH_BF16_PARAMS", "1") == "1":
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            variables)
        extras_bf16 = True
    else:
        extras_bf16 = False

    extras = {}
    extras["bf16_params"] = extras_bf16
    if tiny:
        extras["tiny_arch"] = True  # debug smoke — numbers are meaningless
    if use_fused and not compile_only:
        # On-silicon numerics gate (VERDICT r3 #3): throughput alone must not
        # flip the fused default — a Mosaic miscompile would be silent in a
        # timing-only sweep. Three fused decode steps vs the flax path at
        # bench shapes; the max |Δlogits| rides in the output JSON so
        # perf_sweep rows carry their own correctness evidence. Runs BEFORE
        # the headline so a kernel compile failure surfaces with a clear
        # traceback instead of mid-timing.
        #
        # The probe weights MUST NOT be the raw init: ReZero residual scalars
        # initialize to 0, which multiplies every decoder branch (self-attn,
        # cross-attn, FF) by zero — the probe would compare x to x and pass
        # for a kernel that miscompiles all three. Bumping the scalars to 0.3
        # (both paths, so the comparison stays fair) makes every branch
        # contribute to the compared logits.
        probe_vars = jax.tree_util.tree_map(
            lambda a: a + 0.3 if a.ndim == 0 else a, variables)

        @jax.jit
        def _enc_probe(v, a, l):
            return model.apply(v, a, l, False, method=ASRModel.encode)

        @jax.jit
        def _step_flax(v, tk, s):
            return model.apply(v, tk, s, method=ASRModel.decode_step)

        @jax.jit
        def _step_fused(v, tk, s):
            return dec_model.apply(v, tk, s,
                                   method=FusedASRDecoder.decode_step)

        enc_p = _enc_probe(probe_vars, audio, audio_lens)
        st_r = model.apply(probe_vars, enc_p, batch, 8,
                           method=ASRModel.init_decode_state)
        st_f = dec_model.apply(probe_vars, enc_p, batch, 8,
                               method=FusedASRDecoder.init_decode_state)
        toks = jnp.ones((batch, 1), jnp.int32)
        maxdiff, rel, match = 0.0, 0.0, True
        for _ in range(3):
            lo_r, _, _, st_r = _step_flax(probe_vars, toks, st_r)
            lo_f, _, _, st_f = _step_fused(probe_vars, toks, st_f)
            lo_r32 = lo_r.astype(jnp.float32)
            lo_f32 = lo_f.astype(jnp.float32)
            diff_lane = jnp.max(jnp.abs(lo_f32 - lo_r32), -1)   # [B]
            maxdiff = max(maxdiff, float(jnp.max(diff_lane)))
            rel = max(rel, float(jnp.max(diff_lane)
                                 / (jnp.max(lo_r32) - jnp.min(lo_r32) + 1e-9)))
            nxt_r = jnp.argmax(lo_r, -1)[:, None].astype(jnp.int32)
            nxt_f = jnp.argmax(lo_f, -1)[:, None].astype(jnp.int32)
            # Margin-aware agreement: a correct kernel cannot flip an argmax
            # whose top-1 margin exceeds 2x that lane's max logit deviation
            # (flipping needs Δtop1+Δtop2 >= margin, each <= diff). Flips on
            # narrower margins are expected int8/bf16 rounding, NOT errors —
            # a strict equality gate on random probe weights falsely rejects
            # correct int8 kernels on near-ties. The large-deviation hole
            # this opens (huge diff excuses every flip) is closed by the
            # relative-deviation bound below.
            t2 = jax.lax.top_k(lo_r32, 2)[0]
            margin = t2[:, 0] - t2[:, 1]
            ok = (nxt_r[:, 0] == nxt_f[:, 0]) | (margin <= 2.0 * diff_lane)
            match = match and bool(jnp.all(ok))
            toks = nxt_r
        # rel bound: deviations above 10% of the logit RANGE are never
        # rounding — fail the gate even if every flip was excused.
        match = match and rel <= 0.10
        extras["fused_logit_maxdiff"] = round(maxdiff, 5)
        extras["fused_logit_rel_maxdiff"] = round(rel, 4)
        extras["fused_kv8"] = fused_kv8
        extras["fused_w8"] = fused_w8
        extras["fused_stacked"] = fused_stacked
        extras["fused_greedy_token_match"] = match

    def make_decode(k, decoder=None):
        spec = BeamSearchSpec(
            beam_size=k,
            max_new_tokens=max_new,
            eos_id=-1,  # never fires: every window pays the full token budget
            vocab_size=cfg.num_tokens,
            text_vocab_size=cfg.vocab_size,
            force_output=True,
        )
        dm = dec_model if decoder is None else decoder

        @jax.jit
        def decode(variables, audio, audio_lens):
            enc = model.apply(variables, audio, audio_lens, False,
                              method=ASRModel.encode)
            return beam_search(dm, variables, enc,
                               jnp.ones((batch, 1), jnp.int32), spec)

        return decode

    # ---- 1. headline: greedy window-batched --------------------------------
    decode1 = make_decode(beam)
    if compile_only:
        t0 = time.perf_counter()
        decode1.lower(variables, audio, audio_lens).compile()
        print(json.dumps({
            "metric": "compile_only", "ok": True,
            "compile_secs": round(time.perf_counter() - t0, 1),
            "batch": batch, "fused": int(use_fused),
            "fused_block": fused_block, "kv8": int(fused_kv8),
            "w8": int(fused_w8), "stacked": int(fused_stacked)}))
        return
    per_batch = _timed(lambda: decode1(variables, audio, audio_lens),
                       lambda o: o["tokens"], iters)
    audio_secs = batch * WINDOW_SECS
    headline = audio_secs / per_batch  # audio-hours per wall-hour

    # ---- MFU of the headline graph ----------------------------------------
    flops = _flops_of(decode1, variables, audio, audio_lens)
    if flops:
        achieved = flops / per_batch
        extras["headline_tflops"] = round(achieved / 1e12, 2)
        extras["headline_mfu_pct"] = round(100.0 * achieved / peak, 2)
    # Independent analytic count (utils/flops.py) — cross-checks XLA
    # cost_analysis, whose while-loop trip-count assumptions are opaque.
    af = greedy_decode_flops(cfg, batch, t, max_new, beam)
    extras["analytic_tflops"] = round(af / per_batch / 1e12, 2)
    extras["analytic_mfu_pct"] = round(100.0 * af / per_batch / peak, 2)
    if flops:
        extras["xla_vs_analytic_flops"] = round(flops / af, 3)
    # The honest MFU denominator (VERDICT r3 #4): this architecture's
    # achievable ceiling on this chip (grouped convs + per-step KV re-reads
    # make the graph memory-bound; see utils/flops.py roofline). Headline
    # efficiency is pct_of_achievable, not raw MFU vs dense peak.
    rl = greedy_decode_roofline(cfg, batch, t, max_new, beam, peak=peak,
                                kv8=(use_fused and fused_kv8),
                                w8=(use_fused and fused_w8))
    extras["achievable_mfu_pct"] = round(rl["achievable_mfu_pct"], 2)
    extras["pct_of_achievable"] = round(
        100.0 * (af / per_batch / peak)
        / (rl["achievable_mfu_pct"] / 100.0), 1)
    extras["sol_audio_hours_per_hour"] = round(audio_secs / rl["sol_secs"], 2)

    if not skip_extras:
        # ---- 2. beam-5 aligned decode (reference default) ------------------
        decode5 = make_decode(5)
        per_b5 = _timed(lambda: decode5(variables, audio, audio_lens),
                        lambda o: o["tokens"], max(iters // 3, 2))
        extras["beam5_audio_hours_per_hour"] = round(audio_secs / per_b5, 2)

        # Beam-level fused-vs-flax token agreement ON SILICON (VERDICT r4
        # weak #5 / next #10): the greedy probe above cannot see beam-search
        # tie-break divergence under the fused kernel's logit deviation
        # (maxdiff 0.125 abs could flip a near-tie at k=5). One beam5 decode
        # per path on the bumped probe weights; guarded so a failure records
        # itself without erasing the round's whole perf artifact.
        if use_fused and os.environ.get("BENCH_BEAM5_PARITY", "1") == "1":
            try:
                out5_f = decode5(probe_vars, audio, audio_lens)
                out5_r = make_decode(5, decoder=model)(
                    probe_vars, audio, audio_lens)
                t5f = np.asarray(out5_f["tokens"])
                t5r = np.asarray(out5_r["tokens"])
                frac = float((t5f == t5r).mean())
                extras["beam5_fused_token_agreement_pct"] = round(
                    100.0 * frac, 3)
                extras["beam5_fused_token_match"] = bool(frac == 1.0)
            except Exception as e:  # record, don't erase the artifact
                extras["beam5_fused_parity_error"] = f"{type(e).__name__}"

        # ---- 3. unaligned full-episode state machine -----------------------
        # N episodes in lockstep through the vmapped machine: wall time is
        # the slowest lane, so throughput scales ~linearly in lanes until
        # the per-step tensors stop being dispatch-bound.
        ep_t = int(episode_secs * SR)
        ep_audio = jax.random.normal(jax.random.PRNGKey(1), (episodes, ep_t),
                                     jnp.float32) * 0.1
        ep_lens = jnp.full((episodes,), ep_t, jnp.int32)
        spec_u = UnalignedSpec(
            eos_id=1, chunk_size=357, max_positions=cfg.max_positions,
            max_tokens=8192, max_iters=int(episode_secs * 6),  # ~6 tok/s budget
            max_outer=4096,
        )

        # The unaligned machine is vmapped over lanes; pallas_call under
        # vmap is interpret-parity-tested (tests/test_unaligned_batched.py
        # ::test_batched_with_fused_model_matches_flax) but Mosaic-under-vmap
        # on real silicon is not, so the fused kernel keeps its own opt-in —
        # a headline BENCH_FUSED=1 default must not be able to take down the
        # whole bench artifact via this leg.
        un_fused = os.environ.get("BENCH_FUSED_UNALIGNED", "0") == "1"
        un_model = FusedASRDecoder(model) if (use_fused and un_fused) else model

        @jax.jit
        def unaligned(variables, a, l):
            enc = model.apply(variables, a, l, False, method=ASRModel.encode)
            mask = enc.get("encoder_padding_mask")
            ns = (
                (~mask).sum(-1).astype(jnp.int32)
                if mask is not None
                else jnp.full((a.shape[0],), enc["encoder_out"].shape[1],
                              jnp.int32)
            )
            return unaligned_decode_batched(un_model, variables, enc, ns,
                                            spec_u)

        out = unaligned(variables, ep_audio, ep_lens)
        int(np.asarray(out["num_tokens"]).sum())  # compile fence
        t0 = time.perf_counter()
        out = unaligned(variables, ep_audio, ep_lens)
        n_tok = int(np.asarray(out["num_tokens"]).sum())
        wall = time.perf_counter() - t0
        extras["unaligned_audio_hours_per_hour"] = round(
            episodes * episode_secs / wall, 2)
        extras["unaligned_episodes"] = episodes
        extras["unaligned_episode_secs"] = episode_secs
        extras["unaligned_tokens"] = n_tok
        extras["unaligned_iters"] = int(np.asarray(out["iters"]).max())

        # ---- 3b. unaligned decode on TRAINED weights + real synth episode --
        # The noise+random-init variant above is a stress case (the state
        # machine mostly stall-cycles); this one exercises the real shift/
        # reset cadence of a working model over in-distribution audio.
        acc_dir = os.environ.get("ACC_DIR", "accuracy")
        trained = os.path.join(acc_dir, "avg_last_3.msgpack")
        bpe = os.path.join(acc_dir, "bpe.model")
        if not (os.path.exists(trained) and os.path.exists(bpe)):
            # Reboot/round-durable fallback (scripts/persist_ckpt.py): the
            # gitignored accuracy/ tree can vanish with the machine; the
            # tracked bf16 release artifact keeps this leg on real weights.
            rel = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "accuracy_release")
            rt = os.path.join(rel, "avg_last_3.bf16.msgpack")
            rb = os.path.join(rel, "bpe.model")
            if os.path.exists(rt) and os.path.exists(rb):
                trained, bpe = rt, rb
        if os.path.exists(trained) and os.path.exists(bpe):
            import tempfile

            from tal_asrd_tpu.core.checkpoint import load_pytree
            from tal_asrd_tpu.data.audio_io import load_audio_segment
            from tal_asrd_tpu.data.synth import build_synth_corpus
            from tal_asrd_tpu.text import BpeTokenizer

            tok = BpeTokenizer(model_path=bpe)
            tparams = load_pytree(trained)
            emb_rows = tparams["embedding"]["embedding"]
            n_spk = int(np.asarray(emb_rows).shape[0]) - len(tok)
            # Architecture flags are inferred from the checkpoint itself so
            # the bench leg always matches how the chain trained it
            # (mem_pos_alpha present <=> enc_posenc, core/config.py).
            tcfg = ModelConfig(model_type="1x", num_speakers=n_spk,
                               vocab_size=len(tok),
                               enc_posenc="mem_pos_alpha" in tparams)
            tmodel = ASRModel(tcfg, dtype=jnp.bfloat16)
            with tempfile.TemporaryDirectory() as td:
                build_synth_corpus(td, n_episodes=episodes,
                                   episode_seconds=120.0,
                                   n_speakers=n_spk, seed=999)
                eps = [np.asarray(load_audio_segment(
                    os.path.join(td, f"ep{i}.wav"), 0.0, None))
                    for i in range(episodes)]
            ep_len = min(len(e) for e in eps)
            ta = jnp.asarray(np.stack([e[:ep_len] for e in eps]))
            tl = jnp.full((episodes,), ep_len, jnp.int32)
            tvars = {"params": tparams}
            if extras_bf16:
                tvars = jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.bfloat16)
                    if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
                    tvars)
            tspec = UnalignedSpec(
                eos_id=tok.eos_token_id, chunk_size=357,
                max_positions=tcfg.max_positions, max_tokens=4096,
                max_iters=20000, max_outer=2048,
            )

            @jax.jit
            def unaligned_trained(variables, a, l):
                enc = tmodel.apply(variables, a, l, False,
                                   method=ASRModel.encode)
                mask = enc.get("encoder_padding_mask")
                ns = (
                    (~mask).sum(-1).astype(jnp.int32)
                    if mask is not None
                    else jnp.full((a.shape[0],),
                                  enc["encoder_out"].shape[1], jnp.int32)
                )
                return unaligned_decode_batched(tmodel, variables, enc, ns,
                                                tspec)

            out_t = unaligned_trained(tvars, ta, tl)
            int(np.asarray(out_t["num_tokens"]).sum())  # compile fence
            t0 = time.perf_counter()
            out_t = unaligned_trained(tvars, ta, tl)
            n_tok_t = int(np.asarray(out_t["num_tokens"]).sum())
            wall_t = time.perf_counter() - t0
            ep_secs = ta.shape[1] / SR
            extras["unaligned_trained_audio_hours_per_hour"] = round(
                episodes * ep_secs / wall_t, 2)
            extras["unaligned_trained_episodes"] = episodes
            extras["unaligned_trained_tokens"] = n_tok_t
            extras["unaligned_trained_iters"] = int(
                np.asarray(out_t["iters"]).max())

    # ---- standing accuracy regression numbers (scripts/accuracy.sh) --------
    root = os.path.dirname(os.path.abspath(__file__))
    acc_metrics = os.environ.get(
        "ACC_METRICS", os.path.join(root, "accuracy", "metrics.json"))
    if not os.path.exists(acc_metrics):
        acc_metrics = os.path.join(root, "ACCURACY.json")
    if os.path.exists(acc_metrics):
        with open(acc_metrics) as f:
            acc = json.load(f)
        for acc_k, acc_v in acc.items():
            if isinstance(acc_v, (int, float)):
                extras[f"accuracy_{acc_k}"] = acc_v
        # Provenance: accuracy numbers are measured by scripts/accuracy.sh,
        # not by this bench run — stamp where they came from so stale metrics
        # are detectable downstream.
        if acc.get("commit"):
            extras["accuracy_commit"] = acc["commit"]
        extras["accuracy_age_hours"] = round(
            (time.time() - os.path.getmtime(acc_metrics)) / 3600.0, 1)

    guard.cancel()
    print(json.dumps({
        "metric": "joint_decode_audio_hours_per_hour_per_chip",
        "value": round(headline, 2),
        "unit": "audio-hours/hour",
        "vs_baseline": round(headline / 50.0, 3),
        **extras,
    }))


if __name__ == "__main__":
    main()
