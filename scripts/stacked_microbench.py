"""Stacked-kernel silicon microbench (ROADMAP gap 0 / VERDICT r4 #4).

Times the EXPERIMENTAL all-layers decoder-step kernel
(ops/pallas_decode_stacked.py: one pallas_call per token, layer minormost in
the grid so Mosaic prefetches layer l+1's weights during layer l) against the
proven per-layer kernel chain (ops/pallas_decode.py, the 18770 audio-h/h
headline configuration) at the headline decode shapes: batch 256, 4 x 2x
decoder layers (D=512, FF=2048, H=4), S=357 memory frames, 104-token cache.

The stacked kernel's VMEM plan only closes in the int8 configuration
(module docstring: bf16 weights 2x7 MB blow the ~16 MB/core budget), so the
stacked arm runs w8+kv8 at block 8 and the chain arm runs the proven bf16
block-8 config. Both arms are compile-probed before timing (sweep contract,
VERDICT r4 #8). Emits one JSON line per arm.

    python scripts/stacked_microbench.py [--batch 256] [--steps 96] [--iters 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

# STACKED_PLATFORM=cpu: reliable platform pin for CPU smokes (the env-var
# JAX_PLATFORMS route is sometimes pre-empted by the axon plugin; the
# in-process config update is not — same fix as bench.py BENCH_PLATFORM).
if os.environ.get("STACKED_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["STACKED_PLATFORM"])

import jax.numpy as jnp

from tal_asrd_tpu.models.decoder import RZDecoderLayer
from tal_asrd_tpu.ops.pallas_decode import (
    fused_layer_step, pack_decoder, quantize_mem_kv)
from tal_asrd_tpu.ops.pallas_decode_stacked import (
    pack_decoder_stacked, stacked_decoder_step)

D, H, FF, L = 512, 4, 2048, 4   # the 2x decoder (core/config.py:57)
S, CAP = 357, 104               # window memory frames, token cache


def build(batch, dtype):
    ly = RZDecoderLayer(d_model=D, n_head=H, dim_feedforward=FF, dropout=0.0,
                        dtype=dtype)
    x0 = jnp.zeros((batch, 1, D), dtype)
    mem = jax.random.normal(jax.random.PRNGKey(1), (batch, S, D), dtype) * 0.3
    decoder_params, mem_kvs = {}, []
    for li in range(L):
        variables = ly.init(jax.random.PRNGKey(10 + li), x0, mem)
        params = jax.tree_util.tree_map(
            lambda a: a + 0.4 if a.ndim == 0 else a, variables["params"])
        decoder_params[f"layers_{li}"] = params
        kv = ly.apply({"params": params}, mem,
                      method=RZDecoderLayer.precompute_mem_kv)
        mem_kvs.append({"k": kv["k"].reshape(batch, S, D).astype(dtype),
                        "v": kv["v"].reshape(batch, S, D).astype(dtype)})
    return decoder_params, mem_kvs


def time_arm(fn, args, steps, iters, label):
    import numpy as np

    lowered = jax.jit(fn).lower(*args)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    print(f"{label}: compile ok in {compile_s:.1f}s", file=sys.stderr,
          flush=True)
    # Fence with a host fetch: block_until_ready does not reliably fence the
    # axon tunnel (same workaround as bench.py:54).
    np.asarray(compiled(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(compiled(*args))
        best = min(best, time.perf_counter() - t0)
    return {"label": label, "compile_secs": round(compile_s, 1),
            "wall_secs": round(best, 4),
            "us_per_token": round(1e6 * best / steps, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--block", type=int, default=8)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    b, steps, blk = args.batch, args.steps, args.block
    dtype = jnp.bfloat16
    decoder_params, mem_kvs = build(b, dtype)
    x0 = jax.random.normal(jax.random.PRNGKey(2), (b, D), dtype) * 0.5
    bias = jnp.zeros((b, S), jnp.float32)

    # --- arm 1: proven per-layer chain, bf16, block 8 -----------------------
    packed = pack_decoder(decoder_params, L, dtype=dtype)
    mks = [kv["k"] for kv in mem_kvs]
    mvs = [kv["v"] for kv in mem_kvs]

    # Weights/bias must be ARGUMENTS, not closure constants: closed-over
    # arrays bake into the HLO as literals (~28 MB of weight constants) and
    # stall XLA constant processing for many minutes.
    def chain_decode(x0, packed, bias, mks, mvs):
        cks = [jnp.zeros((b, CAP, D), dtype) for _ in range(L)]
        cvs = [jnp.zeros((b, CAP, D), dtype) for _ in range(L)]

        def body(i, carry):
            x, cks, cvs = carry
            cks, cvs = list(cks), list(cvs)
            for li in range(L):
                x, _, cks[li], cvs[li] = fused_layer_step(
                    x, packed[li], cks[li], cvs[li], mks[li], mvs[li],
                    bias, i.astype(jnp.int32), n_head=H, block_b=blk,
                    interpret=args.interpret)
            return x, tuple(cks), tuple(cvs)

        x, cks, cvs = jax.lax.fori_loop(
            0, steps, body,
            (x0, tuple(cks), tuple(cvs)))
        return x

    rows = []
    rows.append(time_arm(chain_decode,
                         (x0, packed, bias, tuple(mks), tuple(mvs)),
                         steps, args.iters, f"chain_bf16_block{blk}"))

    # --- arm 2: stacked kernel, w8+kv8, block 8 (the VMEM-fitting config) ---
    stacked = pack_decoder_stacked(decoder_params, L, dtype=dtype, w8=True)
    qs = [quantize_mem_kv(kv["k"], kv["v"]) for kv in mem_kvs]
    mk = jnp.stack([q[0] for q in qs])
    ks = jnp.stack([q[1] for q in qs])
    mv = jnp.stack([q[2] for q in qs])
    vs = jnp.stack([q[3] for q in qs])

    def stacked_decode(x0, stacked, bias, ks, vs, mk, mv):
        ck = jnp.zeros((L, b, CAP, D), dtype)
        cv = jnp.zeros((L, b, CAP, D), dtype)

        def body(i, carry):
            x, ck, cv = carry
            x, _, ck, cv = stacked_decoder_step(
                x, stacked, ck, cv, mk, mv, bias, i.astype(jnp.int32),
                n_head=H, mem_k_scale=ks, mem_v_scale=vs,
                interpret=args.interpret, block_b=blk)
            return x, ck, cv

        x, ck, cv = jax.lax.fori_loop(0, steps, body, (x0, ck, cv))
        return x

    try:
        rows.append(time_arm(stacked_decode,
                             (x0, stacked, bias, ks, vs, mk, mv),
                             steps, args.iters,
                             f"stacked_w8kv8_block{blk}"))
    except Exception as e:
        rows.append({"label": f"stacked_w8kv8_block{blk}",
                     "error": f"{type(e).__name__}: {e}"[:4000]})

    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
