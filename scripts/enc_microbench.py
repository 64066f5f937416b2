"""Per-op encoder micro-benchmark: where do encode's 124.7 ms (B=32) go?

PERF_PROFILE.json (2026-08-18, real v5e) shows encode at 5-8% of its
compute-bound speed-of-light while its FLOPs are ~95% dense 1x1 convs that
should run near MXU peak — the prime suspect is the grouped TDS convs
(feature_group_count = 80, 1..18 channels per group), whose tiny per-group
channel counts XLA is expected to lane-pad catastrophically (10 -> 128).

This script times, at the real bench shapes ([B, 2856, 80] mels, 28.56 s
window, channel plan 80 -> 800 -> 1120 -> 1440):

  * every distinct grouped-conv shape in the encoder (3 stride-2 VALID
    downsamples + 3 SAME block convs), under several mathematically
    equivalent lowerings (same flax weight layout [K, c_in_pg, C_out]):
      xla_grouped   lax.conv_general_dilated, feature_group_count=G
                    (what nn.Conv emits today — the baseline)
      tap_einsum    sum_k einsum('btgc,cgd->btgd', x_k, w_k): K strided
                    slices, one small batched matmul per tap
      tap_glast     same contraction but G in the minor (lane) dim:
                    einsum('btcg,cdg->btdg') on pre-transposed operands —
                    the VPU-friendly layout a hand kernel would use
      unfold_einsum one einsum over [B,T,K,g,c] unfolded windows
  * the dense 1x1 convs (fc1/fc2) per block shape, as matmuls
  * an HBM copy at the activation size (roofline reference)

Numerics: every variant is asserted against xla_grouped (<=2e-2 bf16 rtol)
before timing, so a fast-but-wrong lowering can't win.

Usage:  python scripts/enc_microbench.py [--batch 32] [--json-out FILE]
        (runs on whatever backend JAX picks; pin with BENCH_PLATFORM=cpu)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

WINDOW_SECS = 28.56
SR = 16000
HOP = 160


def mel_len(secs: float = WINDOW_SECS) -> int:
    return int(secs * SR) // HOP + 1


# --------------------------------------------------------------------------
# Grouped-conv lowerings. All take x [B, T, C_in] and the flax nn.Conv
# kernel layout w [K, c_in_pg, C_out] (+ bias [C_out]) and produce the
# identical result to nn.Conv(feature_group_count=G).
# --------------------------------------------------------------------------

def xla_grouped(x, w, b, stride, padding, groups):
    y = lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=padding,
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups)
    return y + b


def _tap_slices(x, k_taps, stride, padding):
    """List of K views x_k [B, T_out, C] such that
    y[t] = sum_k x_k[t] * w[k]."""
    if padding == "SAME":
        pad = (k_taps - 1) // 2
        x = jnp.pad(x, ((0, 0), (pad, k_taps - 1 - pad), (0, 0)))
    t_out = (x.shape[1] - k_taps) // stride + 1
    return [lax.slice_in_dim(x, k, k + (t_out - 1) * stride + 1, stride, axis=1)
            for k in range(k_taps)], t_out


def tap_einsum(x, w, b, stride, padding, groups):
    k_taps, c_pg, c_out = w.shape
    d_pg = c_out // groups
    xs, _ = _tap_slices(x, k_taps, stride, padding)
    wg = w.reshape(k_taps, c_pg, groups, d_pg)      # out channels are g-major
    y = None
    for k, xk in enumerate(xs):
        bt = xk.reshape(*xk.shape[:2], groups, c_pg)
        yk = jnp.einsum("btgc,cgd->btgd", bt, wg[k])
        y = yk if y is None else y + yk
    return y.reshape(*y.shape[:2], c_out) + b


def tap_glast(x, w, b, stride, padding, groups):
    """G in the minor (lane) dim: transposed operands, elementwise-friendly."""
    k_taps, c_pg, c_out = w.shape
    d_pg = c_out // groups
    xs, _ = _tap_slices(x, k_taps, stride, padding)
    # w [K, c, G, d] -> [K, c, d, G]
    wt = w.reshape(k_taps, c_pg, groups, d_pg).transpose(0, 1, 3, 2)
    y = None
    for k, xk in enumerate(xs):
        bt = xk.reshape(*xk.shape[:2], groups, c_pg).transpose(0, 1, 3, 2)
        yk = jnp.einsum("btcg,cdg->btdg", bt, wt[k])
        y = yk if y is None else y + yk
    y = y.transpose(0, 1, 3, 2)                      # [B, T, G, d]
    return y.reshape(*y.shape[:2], c_out) + b


def unfold_einsum(x, w, b, stride, padding, groups):
    k_taps, c_pg, c_out = w.shape
    d_pg = c_out // groups
    xs, t_out = _tap_slices(x, k_taps, stride, padding)
    xu = jnp.stack(xs, axis=2)                       # [B, T_out, K, C]
    xu = xu.reshape(*xu.shape[:3], groups, c_pg)
    wg = w.reshape(k_taps, c_pg, groups, d_pg)
    y = jnp.einsum("btkgc,kcgd->btgd", xu, wg)
    return y.reshape(*y.shape[:2], c_out) + b


def packed(x, w, b, stride, padding, groups, pack=10):
    """Pack `pack` groups into one super-group via a zero-padded block-
    diagonal weight, so feature_group_count drops 80 -> 80/pack and each
    group's channel count rises to ~the 128-lane MXU tile. Trades `pack`x
    redundant FLOPs (on an op carrying 1/80th of dense FLOPs) for a lowering
    XLA handles like a normal conv. Numerically identical (padding is 0)."""
    k_taps, c_pg, c_out = w.shape
    d_pg = c_out // groups
    fgc = groups // pack
    # w [K, c, G, d] -> block-diag [K, pack*c, fgc, pack*d] -> [K, pack*c, C_out]
    wg = w.reshape(k_taps, c_pg, fgc, pack, d_pg)
    eye = jnp.eye(pack, dtype=w.dtype)                    # [p_in, p_out]
    wd = jnp.einsum("kcfpd,qp->kqcfpd", wg, eye)
    wd = wd.reshape(k_taps, pack * c_pg, c_out)
    return xla_grouped(x, wd, b, stride, padding, fgc)


VARIANTS = {
    "xla_grouped": xla_grouped,
    "tap_einsum": tap_einsum,
    "tap_glast": tap_glast,
    "unfold_einsum": unfold_einsum,
    "packed10": lambda *a: packed(*a, pack=10),
    "packed20": lambda *a: packed(*a, pack=20),
}

# Encoder grouped-conv shapes: (name, c_in, c_out, stride, padding, T_in)
def conv_shapes():
    t0 = mel_len()
    t1 = (t0 - 21) // 2 + 1
    t2 = (t1 - 21) // 2 + 1
    t3 = (t2 - 21) // 2 + 1
    return [
        ("down0", 80, 800, 2, "VALID", t0),
        ("block1", 800, 800, 1, "SAME", t1),
        ("down1", 800, 1120, 2, "VALID", t1),
        ("block2", 1120, 1120, 1, "SAME", t2),
        ("down2", 1120, 1440, 2, "VALID", t2),
        ("block3", 1440, 1440, 1, "SAME", t3),
    ]
    # block multiplicities in the full encoder: block1 x2, block2 x3, block3 x6


BLOCK_COUNT = {"down0": 1, "block1": 2, "down1": 1,
               "block2": 3, "down2": 1, "block3": 6}


def timed(fn, *args, iters=6):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--groups", type=int, default=80)
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--skip-checks", action="store_true",
                    help="skip numerics asserts (after they passed once)")
    args = ap.parse_args()

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    rng = np.random.default_rng(0)
    G = args.groups
    results = {"batch": args.batch, "platform": jax.devices()[0].platform}
    total = {v: 0.0 for v in VARIANTS}

    for name, c_in, c_out, stride, padding, t_in in conv_shapes():
        x = jnp.asarray(rng.standard_normal((args.batch, t_in, c_in)),
                        jnp.bfloat16)
        w = jnp.asarray(0.1 * rng.standard_normal((21, c_in // G, c_out)),
                        jnp.bfloat16)
        b = jnp.asarray(0.1 * rng.standard_normal((c_out,)), jnp.bfloat16)

        row = {}
        ref = None
        for vname, fn in VARIANTS.items():
            jitted = jax.jit(
                lambda x, w, b, fn=fn: fn(x, w, b, stride, padding, G))
            y = jitted(x, w, b)
            if vname == "xla_grouped":
                ref = np.asarray(y, np.float32)
            elif not args.skip_checks:
                got = np.asarray(y, np.float32)
                err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-6)
                assert err < 2e-2, f"{name}/{vname} numerics off: rel {err}"
            ms = timed(jitted, x, w, b, iters=args.iters) * 1e3
            row[vname] = round(ms, 2)
            total[vname] += ms * BLOCK_COUNT[name]
        # HBM roofline for this op: read x once + write y once
        t_out = (t_in - 21) // stride + 1 if padding == "VALID" else t_in
        gb = (x.size + args.batch * t_out * c_out) * 2 / 1e9
        row["hbm_gb"] = round(gb, 3)
        results[name] = row
        print(name, row, flush=True)

    results["encoder_totals_ms"] = {v: round(t, 1) for v, t in total.items()}

    # dense 1x1 convs (fc1+fc2 per block) as matmuls, for comparison
    fc = {}
    for name, c, t in [("fc_800", 800, (mel_len() - 21) // 2 + 1),
                       ("fc_1120", 1120, ((mel_len() - 21) // 2 + 1 - 21) // 2 + 1),
                       ("fc_1440", 1440, (((mel_len() - 21) // 2 + 1 - 21) // 2 + 1 - 21) // 2 + 1)]:
        x = jnp.asarray(rng.standard_normal((args.batch, t, c)), jnp.bfloat16)
        w1 = jnp.asarray(0.05 * rng.standard_normal((c, c)), jnp.bfloat16)
        f = jax.jit(lambda x, w: jnp.maximum(x @ w, 0) @ w)
        ms = timed(f, x, w1, iters=args.iters) * 1e3
        tflops = 2 * 2 * x.shape[0] * t * c * c / (ms / 1e3) / 1e12
        fc[name] = {"ms": round(ms, 2), "tflops": round(tflops, 2)}
        print(name, fc[name], flush=True)
    results["fc"] = fc

    # HBM copy roofline reference at the group-1 activation size
    xa = jnp.asarray(rng.standard_normal(
        (args.batch, (mel_len() - 21) // 2 + 1, 800)), jnp.bfloat16)
    cp = jax.jit(lambda a: a + 1.0)
    ms = timed(cp, xa, iters=args.iters) * 1e3
    results["hbm_copy"] = {
        "ms": round(ms, 2),
        "gbps": round(2 * xa.size * 2 / (ms / 1e3) / 1e9, 1)}
    print("hbm_copy", results["hbm_copy"], flush=True)

    print(json.dumps(results))
    if args.json_out:
        json.dump(results, open(args.json_out, "w"), indent=1)


if __name__ == "__main__":
    main()
