"""Preemption-safe training (beyond parity — the reference has none).

TPU fleet instances are routinely preempted/maintained: the runtime
delivers SIGTERM and gives the process a grace window. The reference's
entire recovery story is a manual ``load_model`` boolean that reloads a
best-weights file or prints "Will start from scratch"
(ref train_sup.py:61-69) — a preempted run loses the optimizer state and
every epoch since the last best. Here a signal handler flags the step
loop, which saves a FULL resume point (``CheckpointManager.save_last``:
params + opt_state + epoch + best metric, crash-safe replace) and exits
cleanly; restarting the same command with ``--resume`` continues from the
interrupted epoch.

Multi-host SPMD: every process must leave the step loop at the same
iteration — if one host stops mid-epoch while the others enter the next
collective, the program deadlocks. ``should_stop`` therefore OR-reduces
the local flag across processes on a fixed call cadence
(``sync_every``): between sync points it returns the last agreed value,
so a signal delivered to one host becomes visible to all hosts at the
same loop iteration. Single-process skips the collective entirely.
"""

from __future__ import annotations

import signal
import threading
from typing import Callable, Optional

import numpy as np


def _default_global_or(flag: bool) -> bool:
    """All-process OR of a host-local boolean (collective: every process
    must call this together, same cadence)."""
    import jax
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return flag
    g = multihost_utils.process_allgather(np.asarray([flag], np.int32))
    return bool(np.any(g))


class PreemptionGuard:
    """Installs signal handlers and answers "should this step loop stop?".

    Usage::

        guard = PreemptionGuard()           # installs SIGTERM handler
        run_training(..., preemption=guard)
        if guard.fired:
            print("preempted — resume with --resume")

    Parameters
    ----------
    signals: which signals flag a stop (default: SIGTERM — the
        preemption notice; SIGINT is left to KeyboardInterrupt).
    sync_every: multi-host OR-reduction cadence in ``should_stop`` calls.
        The collective costs one tiny allgather; every 16 steps it is
        noise next to a train step while bounding the stop latency.
    install: set False to use the guard as a plain flag (e.g. tests or
        embedding in a framework that owns signal handling); call
        ``trigger()`` to flag it programmatically.
    """

    def __init__(self, signals=(signal.SIGTERM,), sync_every: int = 16,
                 install: bool = True,
                 global_or: Optional[Callable[[bool], bool]] = None):
        self._flag = False
        self._agreed = False
        self._calls = 0
        self._nprocs: Optional[int] = None
        self.sync_every = max(1, int(sync_every))
        self._global_or = global_or or _default_global_or
        self._prev = {}
        self._installed = False
        if install:
            if threading.current_thread() is not threading.main_thread():
                raise RuntimeError(
                    "PreemptionGuard must be constructed in the main thread "
                    "(signal.signal requirement); pass install=False and "
                    "call trigger() from your own handler instead")
            for s in signals:
                self._prev[s] = signal.signal(s, self._handler)
            self._installed = True

    # -- signal side ------------------------------------------------------
    def _handler(self, signum, frame):
        self._flag = True
        prev = self._prev.get(signum)
        # chain a pre-existing Python-level handler (but never the default
        # action, which would kill the process before the save)
        if callable(prev) and prev not in (signal.SIG_DFL, signal.SIG_IGN):
            prev(signum, frame)

    def trigger(self) -> None:
        """Flag a stop programmatically (tests, external schedulers)."""
        self._flag = True

    def uninstall(self) -> None:
        """Restore the previous signal handlers."""
        if self._installed:
            for s, prev in self._prev.items():
                signal.signal(s, prev)
            self._installed = False

    # -- loop side ---------------------------------------------------------
    @property
    def fired(self) -> bool:
        """True once a stop has been agreed (what the step loop saw)."""
        return self._agreed

    def should_stop(self) -> bool:
        """Call once per train step, on EVERY process (the multi-host OR
        is a collective on the ``sync_every`` cadence). Returns the
        all-process agreement, sticky once True."""
        if self._agreed:
            return True
        if self._nprocs is None:
            import jax
            self._nprocs = jax.process_count()
        if self._nprocs == 1:
            # no collective to coordinate: react immediately
            self._agreed = self._flag
            return self._agreed
        # multi-host: the OR-reduce is a collective, so it must run on a
        # call-count cadence that is identical on every process (syncing
        # "when the local flag is set" would deadlock the others)
        self._calls += 1
        if self._calls % self.sync_every == 0:
            self._agreed = bool(self._global_or(self._flag))
        return self._agreed
