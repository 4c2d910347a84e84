"""Training observability: scalar logging + throughput meter.

Replaces the reference's TensorBoard writer (train_sup.py:120) with a
JSONL scalar log (always) and a TensorBoard writer when available, plus
the images-per-second meter the vestigial trainer sketched
(ref models/trainer.py:165-171).
"""

from __future__ import annotations

import json
import os
import time

class ScalarLogger:
    def __init__(self, logdir: str, use_tensorboard: bool = True):
        os.makedirs(logdir, exist_ok=True)
        # multi-host: every process logs (scalars are identical under SPMD,
        # but per-host files keep shared-FS writes from interleaving);
        # process 0 owns the canonical name + the TensorBoard writer
        try:
            import jax
            pidx = jax.process_index()
        except Exception:
            pidx = 0
        name = "scalars.jsonl" if pidx == 0 else f"scalars.p{pidx}.jsonl"
        self.path = os.path.join(logdir, name)
        self._f = open(self.path, "a")
        self._tb = None
        if use_tensorboard and pidx == 0:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(logdir)
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value: float, step: int):
        self._f.write(json.dumps({"tag": tag, "value": float(value),
                                  "step": int(step), "time": time.time()}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def flush(self):
        self._f.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self.flush()
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class Throughput:
    """imgs/sec meter (ref models/trainer.py:165-171 Timer sketch)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._n = 0

    def update(self, n: int):
        self._n += n

    def rate(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._n / dt if dt > 0 else 0.0
