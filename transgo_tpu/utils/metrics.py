"""Metrics / logging / observability.

The reference logged to three sinks from its SharedStorage scalar dict
(transgo.py:138-162): console prints, an append-only text file
(results1/train_record.txt), and tensorboardX. This logger keeps all three
(tensorboard only if importable) and adds a machine-readable JSONL stream,
plus optional jax.profiler trace capture — the tracing subsystem the
reference lacked (SURVEY.md section 5).
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Dict


class MetricLogger:
    def __init__(self, results_path: str, record_name: str = "train_record.txt",
                 use_tensorboard: bool = True, quiet: bool = False):
        self.dir = Path(results_path)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.record = open(self.dir / record_name, "a")
        self.jsonl = open(self.dir / "metrics.jsonl", "a")
        self.quiet = quiet
        self.tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter  # type: ignore

                self.tb = SummaryWriter(str(self.dir / "tb"))
            except Exception:
                self.tb = None
        self._t0 = time.time()

    # ------------------------------------------------------------------
    def log(self, step: int, scalars: Dict[str, float], prefix: str = "train"):
        rec = {"t": round(time.time() - self._t0, 3), "step": step}
        rec.update({k: float(v) for k, v in scalars.items()})
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(f"{prefix}/{k}", float(v), step)

    def console(self, msg: str):
        if not self.quiet:
            print(msg, flush=True)
        self.record.write(msg + "\n")
        self.record.flush()

    # ------------------------------------------------------------------
    @contextlib.contextmanager
    def profile(self, name: str = "trace"):
        """jax.profiler capture around a block (writes to results/profiles)."""
        import jax

        out = str(self.dir / "profiles" / name)
        jax.profiler.start_trace(out)
        try:
            yield
        finally:
            jax.profiler.stop_trace()

    def close(self):
        self.record.close()
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()
