"""CPU smoke of the full bench contract (bench.py).

bench.py is the driver's end-of-round artifact — a silent crash there means
the round has no perf datapoint at all (the BENCH_r03 failure mode). This
smoke runs the whole script as a subprocess on the tiny debug architecture
with the CPU platform pinned in-process (BENCH_PLATFORM), and checks the
one-line JSON contract, including the new multi-episode unaligned leg
(BENCH_EPISODES lanes through decode/unaligned.py unaligned_decode_batched).

Slow tier: three jitted decode graphs (greedy, beam-5, unaligned machine)
compile on the 1-core box.
"""
import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")


@pytest.mark.slow
def test_bench_cpu_smoke_contract():
    env = {
        **os.environ,
        "BENCH_PLATFORM": "cpu",
        "TAL_TINY_ARCH": "1",
        "BENCH_BATCH": "2",
        "BENCH_STEPS": "4",
        "BENCH_ITERS": "1",
        "BENCH_EPISODES": "2",
        "BENCH_EPISODE_SECS": "40",
        "BENCH_DEADLINE_S": "1700",
        # 3b needs accuracy/ artifacts; point ACC_DIR at nowhere so the leg
        # skips deterministically regardless of the chain's state.
        "ACC_DIR": "/nonexistent",
        "ACC_METRICS": "/nonexistent/metrics.json",
    }
    r = subprocess.run([sys.executable, "bench.py"], cwd=ROOT, env=env,
                       capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-3000:]
    line = r.stdout.strip().splitlines()[-1]
    row = json.loads(line)
    # the driver's contract
    assert row["metric"] == "joint_decode_audio_hours_per_hour_per_chip"
    assert row["unit"] == "audio-hours/hour"
    assert row["value"] > 0
    assert "vs_baseline" in row
    # tiny-arch runs must self-describe as meaningless numbers
    assert row["tiny_arch"] is True
    # extras ride along: beam-5 + the batched unaligned legs
    assert row["beam5_audio_hours_per_hour"] > 0
    assert row["unaligned_episodes"] == 2
    assert row["unaligned_audio_hours_per_hour"] > 0
    assert row["unaligned_tokens"] > 0
    # roofline fields (VERDICT r3 #4) always present
    assert "achievable_mfu_pct" in row and "pct_of_achievable" in row


@pytest.mark.slow
def test_bench_fused_probe_has_discriminating_power():
    """The fused numerics gate must probe with NONZERO ReZero scalars: on raw
    init (resweights = 0) every decoder branch is multiplied away and a
    miscompiled kernel passes with maxdiff 0.0. Pin maxdiff > 0 so the gate
    keeps its teeth (kv8+w8 perturb the compared logits measurably)."""
    env = {
        **os.environ,
        "BENCH_PLATFORM": "cpu",
        "TAL_TINY_ARCH": "1",
        "BENCH_BATCH": "2",
        "BENCH_STEPS": "2",
        "BENCH_ITERS": "1",
        "BENCH_SKIP_EXTRAS": "1",
        "BENCH_FUSED": "1",
        "BENCH_FUSED_INTERPRET": "1",
        "BENCH_FUSED_BLOCK": "2",
        "BENCH_FUSED_KV8": "1",
        "BENCH_FUSED_W8": "1",
        "BENCH_DEADLINE_S": "1700",
        "ACC_DIR": "/nonexistent",
        "ACC_METRICS": "/nonexistent/metrics.json",
    }
    r = subprocess.run([sys.executable, "bench.py"], cwd=ROOT, env=env,
                       capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-3000:]
    row = json.loads(r.stdout.strip().splitlines()[-1])
    assert row["fused_kv8"] is True and row["fused_w8"] is True
    assert row["fused_greedy_token_match"] is True
    assert row["fused_logit_maxdiff"] > 0, (
        "probe compared x to x — ReZero scalars are zero again?")
