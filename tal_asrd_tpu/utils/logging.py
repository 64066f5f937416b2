"""Metrics / observability sink.

The reference logs through a Lightning WandbLogger wrapper (model watch,
config update, audio + ref/hyp generation tables, rank-zero guards —
tal/asr/logger.py:5-70). Offline-first here: a JSONL metrics stream + stdout,
with the same surface (`log_metrics`, `log_generation`, `update_config`) and
an optional live wandb backend when the package exists (it is absent in this
environment). Per-step wall-time is a first-class metric — the reference
never timed anything (SURVEY §5/§6).
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, out_dir: str = "out", name: str = "run",
                 project: str = "asr", config: Optional[dict] = None,
                 use_wandb: bool = True, rank: int = 0):
        self.rank = rank
        self.out_dir = out_dir
        self.name = name
        self._t0 = time.time()
        self._wandb = None
        if rank != 0:
            return
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, f"{name}.metrics.jsonl")
        self._f = open(self.path, "a")
        if config:
            self.update_config(config)
        if use_wandb:
            try:
                import wandb  # optional

                self._wandb = wandb.init(project=project, name=name,
                                         config=config or {})
            except Exception:
                self._wandb = None

    def update_config(self, config: Dict[str, Any]) -> None:
        if self.rank != 0:
            return
        with open(os.path.join(self.out_dir, f"{self.name}.config.json"), "w") as f:
            json.dump(config, f, indent=2, default=str)

    def log_metrics(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        if self.rank != 0:
            return
        rec = {"_time": round(time.time() - self._t0, 3)}
        if step is not None:
            rec["step"] = int(step)
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_generation(self, audio, ref_text: Optional[str],
                       hyp_text: Optional[str], step: Optional[int] = None) -> None:
        """Validation-time generation spot-check (logger.py:50-56 analog)."""
        if self.rank != 0:
            return
        rec = {"type": "generation", "ref": ref_text, "hyp": hyp_text}
        if step is not None:
            rec["step"] = int(step)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        print("\n=== CANDIDATE GENERATION ===")
        if ref_text is not None:
            print(f"GOLD:\n{ref_text}\n")
        if hyp_text is not None:
            print(f"GENERATED:\n{hyp_text}\n")

    def close(self) -> None:
        if self.rank == 0:
            self._f.close()
            if self._wandb is not None:
                self._wandb.finish()
