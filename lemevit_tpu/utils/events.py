"""Scalar event logging: JSONL writer with optional wandb passthrough.

Replaces the reference's wandb (main.py:505-511) / tensorboardX
(change_detection/train.py:117) observability without external deps: every
scalar lands in {out_dir}/events.jsonl (one JSON object per step), and if
wandb happens to be installed and WANDB_PROJECT is set, it mirrors there.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class EventWriter:
    def __init__(self, out_dir: str, enabled: bool = True):
        self.enabled = enabled
        self.path = os.path.join(out_dir, "events.jsonl")
        self._wandb = None
        if enabled:
            os.makedirs(out_dir, exist_ok=True)
            if os.environ.get("WANDB_PROJECT"):
                try:  # optional mirror
                    import wandb
                    wandb.init(project=os.environ["WANDB_PROJECT"],
                               dir=out_dir)
                    self._wandb = wandb
                except Exception:
                    self._wandb = None

    def log(self, step: int, scalars: Dict[str, float]):
        if not self.enabled:
            return
        rec = {"step": int(step), "time": time.time(),
               **{k: float(v) for k, v in scalars.items()}}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)

    def close(self):
        if self._wandb is not None:
            self._wandb.finish()
