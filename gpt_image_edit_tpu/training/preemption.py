"""Preemption-safe training shutdown.

Preemptible TPU slices receive SIGTERM shortly before eviction. The
reference has no analogue (dedicated A100 nodes; ref:train_denoiser.py
installs no signal handling, so a preempted run loses everything since the
last periodic checkpoint). Here the trainer installs a :class:`PreemptionGuard`
around the hot loop: the first SIGTERM/SIGUSR1 only sets a flag, the loop
finishes the in-flight step, writes a final checkpoint, and returns cleanly
so ``resume_from_checkpoint: latest`` continues with zero lost steps. A
second signal restores the default disposition and re-raises, so a wedged
step can still be killed.
"""

from __future__ import annotations

import logging
import signal
import threading
from typing import Iterable

log = logging.getLogger(__name__)

_DEFAULT_SIGNALS = (signal.SIGTERM, signal.SIGUSR1)


class PreemptionGuard:
    """Context manager: convert termination signals into a cooperative flag.

    Only the main thread may install signal handlers; when entered from a
    non-main thread (e.g. a test harness or a notebook executor) the guard
    degrades to a manual flag (``request_stop()``) and installs nothing.
    """

    def __init__(self, signals: Iterable[int] = _DEFAULT_SIGNALS):
        self.signals = tuple(signals)
        self._event = threading.Event()
        self._previous: dict[int, object] = {}
        self._installed = False

    # -- flag API ----------------------------------------------------------
    @property
    def triggered(self) -> bool:
        return self._event.is_set()

    def request_stop(self) -> None:
        """Programmatic preemption (tests, orchestrators)."""
        self._event.set()

    # -- signal plumbing ----------------------------------------------------
    def _handler(self, signum, frame):
        if self._event.is_set():
            # Second signal: the step is presumably wedged — restore the
            # default disposition and re-deliver so the process dies.
            log.warning("second signal %d — restoring default handler", signum)
            self._restore()
            signal.raise_signal(signum)
            return
        log.warning(
            "signal %d received — finishing the in-flight step, then "
            "checkpointing and exiting", signum,
        )
        self._event.set()

    def __enter__(self) -> "PreemptionGuard":
        if threading.current_thread() is threading.main_thread():
            for s in self.signals:
                self._previous[s] = signal.getsignal(s)
                signal.signal(s, self._handler)
            self._installed = True
        return self

    def _restore(self) -> None:
        if self._installed:
            for s, prev in self._previous.items():
                try:
                    signal.signal(s, prev)
                except (ValueError, TypeError):
                    pass
            self._installed = False

    def __exit__(self, *exc) -> None:
        self._restore()
