"""Compile-only bisection probes for the stacked decoder-step kernel.

The stacked kernel's first silicon attempt crashed the axon remote-compile
helper (HTTP 500, subprocess exit 1) with the Mosaic diagnostic truncated by
the microbench's 4000-char error cap. This probe compiles ONE
stacked_decoder_step (no fori_loop, no execution — the helper is chipless)
per variant and prints the COMPLETE exception, so a Mosaic rejection costs
seconds and names itself (sweep contract, VERDICT r4 #8).

Variants bisect the features that differ from the proven per-layer kernel
(ops/pallas_decode.py): the 2D grid with layer minormost, the SMEM rw block,
the grid-accumulator x_out/attn_out pattern, int8 stacked weights, and the
input/output cache aliasing.

    python scripts/stacked_probe.py [--variants full l1 bf16 ...] [--batch 256]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

if os.environ.get("STACKED_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["STACKED_PLATFORM"])

import jax.numpy as jnp

from tal_asrd_tpu.models.decoder import RZDecoderLayer
from tal_asrd_tpu.ops.pallas_decode import quantize_mem_kv
from tal_asrd_tpu.ops.pallas_decode_stacked import (
    pack_decoder_stacked, stacked_decoder_step)

D, H, FF, L = 512, 4, 2048, 4
S, CAP = 357, 104


def build(batch, dtype, n_layers):
    ly = RZDecoderLayer(d_model=D, n_head=H, dim_feedforward=FF, dropout=0.0,
                        dtype=dtype)
    x0 = jnp.zeros((batch, 1, D), dtype)
    mem = jax.random.normal(jax.random.PRNGKey(1), (batch, S, D), dtype) * 0.3
    decoder_params, mem_kvs = {}, []
    for li in range(n_layers):
        variables = ly.init(jax.random.PRNGKey(10 + li), x0, mem)
        params = jax.tree_util.tree_map(
            lambda a: a + 0.4 if a.ndim == 0 else a, variables["params"])
        decoder_params[f"layers_{li}"] = params
        kv = ly.apply({"params": params}, mem,
                      method=RZDecoderLayer.precompute_mem_kv)
        mem_kvs.append({"k": kv["k"].reshape(batch, S, D).astype(dtype),
                        "v": kv["v"].reshape(batch, S, D).astype(dtype)})
    return decoder_params, mem_kvs


def probe(name, batch, blk, *, n_layers=L, w8=True, kv8=True):
    dtype = jnp.bfloat16
    decoder_params, mem_kvs = build(batch, dtype, n_layers)
    stacked = pack_decoder_stacked(decoder_params, n_layers, dtype=dtype,
                                   w8=w8)
    if kv8:
        qs = [quantize_mem_kv(kv["k"], kv["v"]) for kv in mem_kvs]
        mk = jnp.stack([q[0] for q in qs])
        ks = jnp.stack([q[1] for q in qs])
        mv = jnp.stack([q[2] for q in qs])
        vs = jnp.stack([q[3] for q in qs])
    else:
        mk = jnp.stack([kv["k"] for kv in mem_kvs])
        mv = jnp.stack([kv["v"] for kv in mem_kvs])
        ks = vs = None
    x0 = jax.random.normal(jax.random.PRNGKey(2), (batch, D), dtype) * 0.5
    bias = jnp.zeros((batch, S), jnp.float32)
    ck = jnp.zeros((n_layers, batch, CAP, D), dtype)
    cv = jnp.zeros((n_layers, batch, CAP, D), dtype)

    def one_step(x0, stacked, ck, cv, mk, mv, bias, ks, vs):
        x, attn, ck, cv = stacked_decoder_step(
            x0, stacked, ck, cv, mk, mv, bias, jnp.int32(3), n_head=H,
            mem_k_scale=ks, mem_v_scale=vs, block_b=blk)
        return x, attn, ck, cv

    args = (x0, stacked, ck, cv, mk, mv, bias, ks, vs)
    t0 = time.perf_counter()
    try:
        jax.jit(one_step).lower(*args).compile()
        row = {"variant": name, "batch": batch, "block": blk,
               "layers": n_layers, "w8": w8, "kv8": kv8, "ok": True,
               "compile_secs": round(time.perf_counter() - t0, 1)}
    except Exception as e:
        row = {"variant": name, "batch": batch, "block": blk,
               "layers": n_layers, "w8": w8, "kv8": kv8, "ok": False,
               "compile_secs": round(time.perf_counter() - t0, 1),
               "error_type": type(e).__name__}
        sys.stderr.write(f"\n===== FULL ERROR [{name}] =====\n")
        sys.stderr.write("".join(traceback.format_exception(e)))
        sys.stderr.write(f"===== END [{name}] =====\n")
        sys.stderr.flush()
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--block", type=int, default=8)
    ap.add_argument("--variants", nargs="*",
                    default=["full"],
                    help="full | l1 | bf16kv | bf16all | b8 | nokv8")
    args = ap.parse_args()
    for v in args.variants:
        if v == "full":
            probe("full_w8kv8", args.batch, args.block)
        elif v == "l1":          # single layer: kills the 2D-grid suspects
            probe("l1_w8kv8", args.batch, args.block, n_layers=1)
        elif v == "nokv8":       # bf16 cross-KV, int8 weights
            probe("w8_bf16kv", args.batch, args.block, kv8=False)
        elif v == "bf16all":     # no int8 anywhere (may exceed VMEM: that
            probe("bf16", args.batch, args.block, w8=False, kv8=False)
        elif v == "b8":          # whole-batch-8, single batch block
            probe("b8_w8kv8", 8, args.block)
        else:
            raise SystemExit(f"unknown variant {v}")


if __name__ == "__main__":
    main()
