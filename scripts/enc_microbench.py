"""Per-op encoder micro-benchmark v2: where do encode's 124.7 ms (B=32) go?

v1 (2026-08-18 morning) timed one dispatch per op and was invalidated by its
own roofline row: a pure HBM copy measured 29.5 GB/s (~4% of v5e HBM), i.e.
every small-op number sat on a ~4.5 ms PER-DISPATCH LATENCY FLOOR of the
axon tunnel, not on compute. v2 times every op INSIDE one jit — a lax.scan
of N iterations whose input is perturbed by the loop counter (so XLA cannot
hoist the op out) and whose outputs feed a scalar reduction (so nothing is
dead-code-eliminated). Reported per-op time = (t_call - t_dispatch) / N.

Coverage, at the real bench shapes (28.56 s window, [B, 2856, 80] mels,
channel plan 80 -> 800 -> 1120 -> 1440):

  * log-mel frontend: spectrum_impl fft (XLA rFFT, n_fft=400 — not a power
    of two) vs dft (windowed DFT as two f32 MXU matmuls);
  * every distinct grouped-conv shape x lowering (ops/grouped_conv.py:
    xla / packed10 / packed20; the einsum variants lost by 2-10x in v1 and
    are dropped from the default grid — pass --variants to re-add);
  * the dense 1x1 convs (fc1+fc2) per block shape;
  * full ASRModel.encode (frontend + TDS) per (spectrum_impl, conv_impl);
  * an HBM copy roofline reference (validates the methodology: if this
    reads far below ~800 GB/s, the numbers are latency-bound again).

Numerics: conv variants are asserted against the xla lowering before timing.

Usage:  python scripts/enc_microbench.py [--batch 32] [--json-out FILE]
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

from tal_asrd_tpu.ops.grouped_conv import IMPLS, conv_packed

WINDOW_SECS = 28.56
SR = 16000
HOP = 160


def mel_len(secs: float = WINDOW_SECS) -> int:
    return int(secs * SR) // HOP + 1


VARIANTS = {
    "xla": lambda x, w, b, s, p, g: IMPLS["xla"](x, w, b, s, p, g),
    "packed10": lambda x, w, b, s, p, g: conv_packed(x, w, b, s, p, g, 10),
    "packed20": lambda x, w, b, s, p, g: conv_packed(x, w, b, s, p, g, 20),
    "tap": lambda x, w, b, s, p, g: IMPLS["tap"](x, w, b, s, p, g),
}

# (name, c_in, c_out, stride, padding, T_in)
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


BLOCK_COUNT = {"down0": 1, "block1": 2, "down1": 1,
               "block2": 3, "down2": 1, "block3": 6}

N_SCAN = 16


def measure(fn, x, t_dispatch, iters=3, n=N_SCAN):
    """Mean per-op seconds via an in-graph scan of n perturbed applications."""

    def body(carry, i):
        y = fn(x + i.astype(x.dtype) * 1e-6)
        return carry + y.astype(jnp.float32).mean(), None

    jitted = jax.jit(lambda x: lax.scan(body, jnp.float32(0),
                                        jnp.arange(n, dtype=jnp.int32))[0])
    jitted(x).block_until_ready()          # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(x)
    out.block_until_ready()
    t_call = (time.perf_counter() - t0) / iters
    return max(t_call - t_dispatch, 0.0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--groups", type=int, default=80)
    ap.add_argument("--variants", default="xla,packed10,packed20")
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--skip-encode", action="store_true",
                    help="skip the full-model encode rows (model init is "
                         "slow on CPU smokes)")
    ap.add_argument("--skip-checks", action="store_true")
    args = ap.parse_args()

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    rng = np.random.default_rng(0)
    G = args.groups
    variants = {v: VARIANTS[v] for v in args.variants.split(",")}
    results = {"batch": args.batch, "platform": jax.devices()[0].platform,
               "method": f"in-graph scan x{N_SCAN}, dispatch-corrected"}

    # dispatch floor: tiny jit, same call pattern
    tiny = jnp.zeros((8, 128), jnp.float32)
    disp = jax.jit(lambda x: x.sum())
    disp(tiny).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(6):
        out = disp(tiny)
    out.block_until_ready()
    t_dispatch = (time.perf_counter() - t0) / 6
    results["dispatch_ms"] = round(t_dispatch * 1e3, 3)
    print("dispatch_ms", results["dispatch_ms"], flush=True)

    # HBM roofline reference (scan-timed like everything else)
    xa = jnp.asarray(rng.standard_normal(
        (args.batch, (mel_len() - 21) // 2 + 1, 800)), jnp.bfloat16)
    s = measure(lambda a: a * 1.0001 + 1.0, xa, t_dispatch)
    results["hbm_copy"] = {"ms": round(s * 1e3, 3),
                           "gbps": round(2 * xa.size * 2 / s / 1e9, 1)}
    print("hbm_copy", results["hbm_copy"], flush=True)

    # frontend: fft vs dft
    from dataclasses import replace as dreplace
    from tal_asrd_tpu.core.config import FrontendConfig
    from tal_asrd_tpu.ops.logmel import log_mel_spectrogram
    audio = jnp.asarray(
        rng.standard_normal((args.batch, int(WINDOW_SECS * SR))) * 0.1,
        jnp.float32)
    fe = {}
    for impl in ("fft", "dft"):
        cfg = FrontendConfig(spectrum_impl=impl)
        s = measure(lambda a, cfg=cfg: log_mel_spectrogram(a, cfg),
                    audio, t_dispatch, n=4)
        fe[impl] = round(s * 1e3, 2)
        print("frontend", impl, fe[impl], "ms", flush=True)
    results["frontend_ms"] = fe

    totals = {v: 0.0 for v in variants}
    for name, c_in, c_out, stride, padding, t_in in conv_shapes():
        x = jnp.asarray(rng.standard_normal((args.batch, t_in, c_in)),
                        jnp.bfloat16)
        w = jnp.asarray(0.1 * rng.standard_normal((21, c_in // G, c_out)),
                        jnp.bfloat16)
        b = jnp.asarray(0.1 * rng.standard_normal((c_out,)), jnp.bfloat16)
        row = {}
        ref = None
        for vname, fn in variants.items():
            y = jax.jit(lambda x: fn(x, w, b, stride, padding, G))(x)
            if ref is None:
                ref = np.asarray(y, np.float32)
            elif not args.skip_checks:
                got = np.asarray(y, np.float32)
                err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-6)
                assert err < 2e-2, f"{name}/{vname} numerics off: rel {err}"
            s = measure(lambda x, fn=fn: fn(x, w, b, stride, padding, G),
                        x, t_dispatch)
            row[vname] = round(s * 1e3, 3)
            totals[vname] += s * 1e3 * BLOCK_COUNT[name]
        results[name] = row
        print(name, row, flush=True)
    results["grouped_totals_ms"] = {v: round(t, 2) for v, t in totals.items()}
    print("grouped_totals_ms", results["grouped_totals_ms"], flush=True)

    # dense 1x1 convs (fc1+fc2 per block) as matmuls
    fc = {}
    t1 = (mel_len() - 21) // 2 + 1
    t2 = (t1 - 21) // 2 + 1
    t3 = (t2 - 21) // 2 + 1
    for name, c, t in [("fc_800", 800, t1), ("fc_1120", 1120, t2),
                       ("fc_1440", 1440, t3)]:
        x = jnp.asarray(rng.standard_normal((args.batch, t, c)), jnp.bfloat16)
        w1 = jnp.asarray(0.05 * rng.standard_normal((c, c)), jnp.bfloat16)
        s = measure(lambda x: jnp.maximum(x @ w1, 0) @ w1, x, t_dispatch)
        tflops = 2 * 2 * args.batch * t * c * c / s / 1e12
        fc[name] = {"ms": round(s * 1e3, 3), "tflops": round(tflops, 1)}
        print(name, fc[name], flush=True)
    results["fc"] = fc

    # full model encode (frontend + TDS), per impl combo
    if not args.skip_encode:
        from tal_asrd_tpu.core.config import ModelConfig
        from tal_asrd_tpu.models import ASRModel
        enc = {}
        lens = jnp.full((args.batch,), audio.shape[1], jnp.int32)
        for sp in ("fft", "dft"):
            for ci in ("xla", "packed"):
                cfg = ModelConfig(model_type="2x", num_speakers=64,
                                  vocab_size=10000, conv_impl=ci)
                model = ASRModel(cfg, dtype=jnp.bfloat16,
                                 frontend=FrontendConfig(spectrum_impl=sp))
                variables = model.init(
                    {"params": jax.random.PRNGKey(0)}, audio,
                    jnp.zeros((args.batch, 4), jnp.int32), lens)
                variables = jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.bfloat16)
                    if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
                    variables)

                def enc_fn(a, model=model, variables=variables):
                    out = model.apply(variables, a, lens, False,
                                      method=ASRModel.encode)
                    return out["encoder_out"]

                s = measure(enc_fn, audio, t_dispatch, n=4)
                enc[f"{sp}+{ci}"] = round(s * 1e3, 2)
                print("encode", f"{sp}+{ci}", enc[f"{sp}+{ci}"], "ms",
                      flush=True)
        results["encode_ms"] = enc

    print(json.dumps(results))
    if args.json_out:
        json.dump(results, open(args.json_out, "w"), indent=1)


if __name__ == "__main__":
    main()
