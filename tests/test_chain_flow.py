"""End-to-end control-flow test of scripts/r4_chain.sh with stubbed training.

The chain runs unattended overnight against a tunnel that fails by hanging;
its control flow (version migration, phase short-circuits, post-phase CE
probes, the automated LM-prior-basin retry, force-publish fallbacks) has to
be exercisable without a chip or a corpus. A PATH shim intercepts `python`:

  * `-m tal_asrd_tpu.cli.train`  -> writes ckpt_<max_steps>.msgpack, logs the
    call (name, lr, load) to calls.log, exits 0;
  * `scripts/val_split.py`       -> emits the next scripted CE JSON from
    ce_script.txt (one val_segment per line) so the basin-retry branch can be
    steered from the test;
  * everything else              -> exec's the real interpreter
    (chain_decisions.py runs for real — it IS the logic under test).

CHAIN_SKIP_EVAL=1 stops before the multi-hour eval legs (accuracy.sh owns
those; they are smoked separately by scripts/smoke_accuracy.sh).
"""
import json
import os
import stat
import subprocess
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..")

SHIM = r'''#!/bin/bash
# python shim for the chain flow test (see tests/test_chain_flow.py)
REAL="__REAL_PYTHON__"
SANDBOX="__SANDBOX__"
args="$*"
case "$args" in
  *tal_asrd_tpu.cli.train*)
    name=""; steps=""; lr=""; load=""; ckpt_path=""
    prev=""
    for a in "$@"; do
      case "$prev" in
        --name) name=$a ;;
        --max-steps) steps=$a ;;
        --lr) lr=$a ;;
        --load) load=$a ;;
        --checkpoint-path) ckpt_path=$a ;;
      esac
      prev=$a
    done
    echo "train name=$name steps=$steps lr=$lr load=$load" >> "$SANDBOX/calls.log"
    mkdir -p "$ckpt_path/$name"
    printf 'fake' > "$ckpt_path/$name/ckpt_$(printf %08d "$steps").msgpack"
    exit 0
    ;;
  *scripts/val_split.py*)
    ce=$(head -1 "$SANDBOX/ce_script.txt")
    tail -n +2 "$SANDBOX/ce_script.txt" > "$SANDBOX/ce_script.tmp" \
      && mv "$SANDBOX/ce_script.tmp" "$SANDBOX/ce_script.txt"
    echo "valsplit ce=$ce" >> "$SANDBOX/calls.log"
    printf '{"ckpt": "%s", "val_aligned": 0.7, "val_segment": %s}\n' "$2" "$ce"
    exit 0
    ;;
esac
exec "$REAL" "$@"
'''


def _sandbox(tmp_path, ce_values):
    acc = tmp_path / "acc"
    # Corpus-ready markers: ensure_corpus.sh (the chain's reboot bootstrap)
    # must short-circuit, not synthesize a real 100-episode corpus in the
    # sandbox. The markers are exactly its corpus_ok() gate.
    (acc / "train").mkdir(parents=True)
    (acc / "train" / "transcript.pkl").write_text("fake")
    (acc / "train" / ".corpus_v2").write_text("")
    (acc / "bpe.model").write_text("fake")
    (acc / ".corpus_ready").write_text("")
    (acc / "ckpts" / "acc1x-p1b").mkdir(parents=True)
    (acc / "ckpts" / "acc1x-p1b" / "ckpt_00012000.msgpack").write_text("p1b")
    # r3 leftovers the migration must move aside
    (acc / "ckpts" / "acc1x").mkdir()
    (acc / "ckpts" / "acc1x" / "ckpt_00002400.msgpack").write_text("basin")
    (acc / "ce_script.txt").write_text(
        "\n".join(str(v) for v in ce_values) + "\n")
    (acc / "calls.log").write_text("")
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    shim = (SHIM.replace("__REAL_PYTHON__", sys.executable)
                .replace("__SANDBOX__", str(acc)))
    p = bin_dir / "python"
    p.write_text(shim)
    p.chmod(p.stat().st_mode | stat.S_IEXEC)
    return acc, bin_dir


def _run_chain(acc, bin_dir):
    env = {**os.environ,
           "PATH": f"{bin_dir}:{os.environ['PATH']}",
           "ACC_DIR": str(acc), "CHAIN_SKIP_EVAL": "1", "RETRIES": "1"}
    return subprocess.run(["bash", "scripts/r4_chain.sh"], cwd=ROOT, env=env,
                          capture_output=True, text=True, timeout=300)


def test_happy_path_bridge_learned(tmp_path):
    """p2m CE below the basin: no retry; acc1x trains from the p2m ckpt."""
    acc, bin_dir = _sandbox(tmp_path, ce_values=[1.8, 0.9])
    r = _run_chain(acc, bin_dir)
    assert r.returncode == 0, r.stdout + r.stderr
    calls = (acc / "calls.log").read_text()
    # migration happened
    assert (acc / "ckpts" / "r3-basin-acc1x").is_dir()
    # reboot bootstrap: p1 retrains from scratch (empty --load), p1b is
    # short-circuited by its surviving checkpoint
    assert "name=acc1x-p1 steps=14000 lr=4e-4 load=" in calls
    assert "name=acc1x-p1b" not in calls
    # p1c trained (no .done existed), then p2m at 1e-4, then acc1x
    assert "name=acc1x-p1c" in calls
    assert "name=acc1x-p2m steps=3000 lr=1e-4" in calls
    assert "name=acc1x steps=5000 lr=1e-4" in calls
    # NO basin retry
    assert "lr=3e-4 " not in calls.replace("lr=3e-4\n", "lr=3e-4 \n") or \
        "name=acc1x-p2m steps=3000 lr=3e-4" not in calls
    assert not (acc / "ckpts" / ".p2m_retry_done").exists()
    # acc1x warm-started from the p2m checkpoint
    acc1x_line = [l for l in calls.splitlines() if "name=acc1x " in l][0]
    assert "acc1x-p2m/ckpt_00003000.msgpack" in acc1x_line
    # CE probes merged with provenance
    merged = json.loads((acc / "VALSPLIT_r4.json").read_text())
    assert merged["p2m"]["val_segment"] == 1.8
    assert merged["acc1x"]["val_segment"] == 0.9
    # sandbox mode must not touch the repo-root artifact
    assert "commit" in merged


def test_basin_path_triggers_lr_retry(tmp_path):
    """p2m CE in the basin: the chain retries once from p1c at 3e-4, keeps
    the basin evidence under p2m_lr1e4, and feeds acc1x from the retry."""
    acc, bin_dir = _sandbox(tmp_path, ce_values=[4.2, 1.7, 0.8])
    r = _run_chain(acc, bin_dir)
    assert r.returncode == 0, r.stdout + r.stderr
    calls = (acc / "calls.log").read_text()
    assert "name=acc1x-p2m steps=3000 lr=1e-4" in calls
    assert "name=acc1x-p2m steps=3000 lr=3e-4" in calls
    assert (acc / "ckpts" / ".p2m_retry_done").exists()
    assert (acc / "ckpts" / "p2m-lr1e4-basin").is_dir()
    # the retry loaded p1c, not the basin p2m (p1c's nominal target is
    # 12000 steps since the 2026-08-18 bump; the stub writes ckpt_<max_steps>)
    retry = [l for l in calls.splitlines() if "lr=3e-4" in l][0]
    assert "acc1x-p1c/ckpt_00012000.msgpack" in retry
    merged = json.loads((acc / "VALSPLIT_r4.json").read_text())
    assert merged["p2m_lr1e4"]["val_segment"] == 4.2   # basin evidence kept
    assert merged["p2m"]["val_segment"] == 1.7          # retry's CE
    assert merged["acc1x"]["val_segment"] == 0.8


def test_relaunch_short_circuits_done_phases(tmp_path):
    """A second launch (watchdog relaunch) must skip every finished phase:
    no new train calls, same artifacts."""
    acc, bin_dir = _sandbox(tmp_path, ce_values=[1.8, 0.9])
    assert _run_chain(acc, bin_dir).returncode == 0
    n_calls = len((acc / "calls.log").read_text().splitlines())
    (acc / "ce_script.txt").write_text("9.9\n9.9\n")  # must not be consumed
    r = _run_chain(acc, bin_dir)
    assert r.returncode == 0, r.stdout + r.stderr
    calls = (acc / "calls.log").read_text().splitlines()
    assert len([l for l in calls if l.startswith("train")]) == \
        len([l for l in calls[:n_calls] if l.startswith("train")])
    # valsplit skip-if-fresh: CE probes not re-run either
    assert len(calls) == n_calls
