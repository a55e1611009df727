"""Device-worker request scheduler for production serving.

The reference serves requests straight off the Gradio/CLI thread
(ref:app.py:318-325, ref:univa/serve/cli.py:199-254) — fine for a demo,
but a deployment needs admission control in front of the accelerator:
a TPU chip executes one program at a time, so concurrent callers must
be serialized, bounded (backpressure instead of unbounded memory
growth), and — where request shapes agree — coalesced into one batched
device program (XLA recompiles per shape; batching same-signature
requests amortizes both compile cache hits and MXU occupancy).

This module is model-agnostic: it schedules opaque ``request`` payloads
onto a single worker thread that calls ``execute_batch(jobs)``. The
HTTP layer (serve/api_server.py) supplies an executor bound to a
UnivaRuntime.

Design notes (TPU-first):
  - ONE worker thread owns the device. JAX dispatch is async, but
    interleaving independent jitted calls from many threads thrashes
    the compilation cache lock and gives no overlap on a single chip.
  - Coalescing is signature-gated: only jobs whose ``signature``
    (height/width/steps/CFG/cond-shape bucket, decided by the caller)
    matches the queue head are batched, so the executor can stack
    their embeddings into one static-shape device call.
  - Backpressure is an explicit error (QueueFullError) so the HTTP
    layer can answer 503 instead of letting latency grow unboundedly.
"""

from __future__ import annotations

import collections
import dataclasses
import threading
import time
import uuid
from typing import Any, Callable, Hashable, List, Optional, Sequence


class QueueFullError(RuntimeError):
    """Raised by submit() when the admission queue is at capacity."""


# Error texts that mean the process's device client is POISONED, not that
# one request failed: a TPU worker crash (observed: a batch-2 denoise scan
# killed the worker, serving bench 2026-08-20) leaves every subsequent
# device op raising UNAVAILABLE, and on the axon backend one
# RESOURCE_EXHAUSTED poisons the client for the rest of the process (even
# eval_shape constants fail; clear_caches+gc don't recover). Nothing
# in-process fixes either — the replica must be restarted, so the
# scheduler latches `device_fault` and /healthz flips to 503 for the
# orchestrator's liveness probe.
_DEVICE_FATAL_MARKERS = (
    "worker process crashed or restarted",
    "RESOURCE_EXHAUSTED",
)


class SchedulerClosedError(RuntimeError):
    """Raised when submitting to (or draining from) a shut-down scheduler."""


class DeadlineExceededError(RuntimeError):
    """The job expired in the queue before execution started (the client
    has usually given up by then; skipping saves the device work)."""


@dataclasses.dataclass
class Job:
    """One admitted request.

    ``signature`` is the batch-compatibility key: jobs with equal,
    non-None signatures may be executed in one ``execute_batch`` call.
    ``None`` means "never coalesce me" (runs in a batch of one).
    """

    request: Any
    signature: Optional[Hashable] = None
    request_id: str = dataclasses.field(
        default_factory=lambda: uuid.uuid4().hex[:16]
    )
    enqueued_at: float = dataclasses.field(default_factory=time.monotonic)
    deadline: Optional[float] = None  # time.monotonic() cutoff for STARTING
    # result plumbing
    _done: threading.Event = dataclasses.field(
        default_factory=threading.Event, repr=False
    )
    _result: Any = dataclasses.field(default=None, repr=False)
    _error: Optional[BaseException] = dataclasses.field(default=None, repr=False)
    started_at: Optional[float] = None
    finished_at: Optional[float] = None

    def set_result(self, value: Any) -> None:
        self._result = value
        self.finished_at = time.monotonic()
        self._done.set()

    def set_error(self, err: BaseException) -> None:
        self._error = err
        self.finished_at = time.monotonic()
        self._done.set()

    def result(self, timeout: Optional[float] = None) -> Any:
        if not self._done.wait(timeout):
            raise TimeoutError(
                f"request {self.request_id} not finished within {timeout}s"
            )
        if self._error is not None:
            raise self._error
        return self._result

    @property
    def done(self) -> bool:
        return self._done.is_set()


def _percentile(sorted_vals: Sequence[float], q: float) -> float:
    if not sorted_vals:
        return 0.0
    idx = min(len(sorted_vals) - 1, max(0, int(round(q * (len(sorted_vals) - 1)))))
    return sorted_vals[idx]


class DeviceScheduler:
    """Single-device FIFO scheduler with signature coalescing.

    Parameters
    ----------
    execute_batch:
        ``fn(jobs: List[Job]) -> List[Any]`` — runs the batch on the
        device and returns one result per job, in order. May raise; the
        exception is delivered to every job in the batch. May instead
        raise :class:`BatchItemErrors` to fail jobs individually.
    max_batch:
        Upper bound on coalesced batch size (1 = strict FIFO serial).
    max_queue:
        Admission-queue capacity; submit() past this raises
        QueueFullError (HTTP layer maps it to 503).
    coalesce_window_s:
        After popping the queue head, wait up to this long for more
        same-signature jobs to arrive before launching (trade a little
        head latency for batch occupancy). 0 = batch only what is
        already queued.
    """

    def __init__(
        self,
        execute_batch: Callable[[List[Job]], List[Any]],
        *,
        max_batch: int = 1,
        max_queue: int = 32,
        coalesce_window_s: float = 0.0,
    ):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        if max_queue < 1:
            raise ValueError("max_queue must be >= 1")
        self._execute_batch = execute_batch
        self.max_batch = max_batch
        self.max_queue = max_queue
        self.coalesce_window_s = coalesce_window_s

        self._queue: collections.deque[Job] = collections.deque()
        self._lock = threading.Lock()
        self._wakeup = threading.Condition(self._lock)
        self._closed = False
        self._device_fault: Optional[str] = None

        # stats (guarded by _lock)
        self._served = 0
        self._failed = 0
        self._rejected = 0
        self._expired = 0
        self._batches = 0
        self._latencies: collections.deque[float] = collections.deque(maxlen=512)

        self._worker = threading.Thread(
            target=self._run, name="device-scheduler", daemon=True
        )
        self._worker.start()

    # ------------------------------------------------------------------
    def submit(
        self,
        request: Any,
        *,
        signature: Optional[Hashable] = None,
        queue_timeout_s: Optional[float] = None,
    ) -> Job:
        """Admit a request; returns its Job (call .result() to block).

        ``queue_timeout_s``: if the job has not STARTED executing within
        this long, it is dropped with DeadlineExceededError instead of
        burning device time for a caller that has likely disconnected.
        """
        deadline = (
            time.monotonic() + queue_timeout_s
            if queue_timeout_s is not None else None
        )
        job = Job(request=request, signature=signature, deadline=deadline)
        with self._wakeup:
            if self._closed:
                raise SchedulerClosedError("scheduler is shut down")
            if len(self._queue) >= self.max_queue:
                # sweep overdue entries before rejecting: expired jobs must
                # not hold admission slots (and their callers get the 504
                # now instead of when the busy worker finally pops them)
                self._queue = collections.deque(
                    j for j in self._queue if not self._expire_if_overdue(j)
                )
            if len(self._queue) >= self.max_queue:
                self._rejected += 1
                raise QueueFullError(
                    f"queue full ({self.max_queue} pending); retry later"
                )
            self._queue.append(job)
            self._wakeup.notify()
        return job

    def run(
        self,
        request: Any,
        *,
        signature: Optional[Hashable] = None,
        timeout: Optional[float] = None,
        queue_timeout_s: Optional[float] = None,
    ) -> Any:
        """submit() + block for the result."""
        return self.submit(
            request, signature=signature, queue_timeout_s=queue_timeout_s
        ).result(timeout)

    # ------------------------------------------------------------------
    @property
    def queue_depth(self) -> int:
        with self._lock:
            return len(self._queue)

    @property
    def device_fault(self) -> Optional[str]:
        """Non-None once an executor error marked the device client as
        unrecoverable for this process (see _DEVICE_FATAL_MARKERS)."""
        with self._lock:
            return self._device_fault

    def _note_fault_if_fatal(self, err: BaseException) -> None:
        msg = f"{type(err).__name__}: {err}"
        if any(m in msg for m in _DEVICE_FATAL_MARKERS):
            with self._lock:
                if self._device_fault is None:
                    self._device_fault = msg[:500]

    def stats(self) -> dict:
        with self._lock:
            lat = sorted(self._latencies)
            return {
                "served": self._served,
                "failed": self._failed,
                "rejected": self._rejected,
                "expired": self._expired,
                "batches": self._batches,
                "queue_depth": len(self._queue),
                "max_batch": self.max_batch,
                "latency_p50_s": _percentile(lat, 0.50),
                "latency_p95_s": _percentile(lat, 0.95),
                "device_fault": self._device_fault,
            }

    # ------------------------------------------------------------------
    def _expire_if_overdue(self, job: Job) -> bool:
        """(lock held) Fail a job whose queue deadline passed; True if so."""
        if job.deadline is not None and time.monotonic() > job.deadline:
            self._expired += 1
            self._failed += 1
            job.set_error(
                DeadlineExceededError(
                    f"request {job.request_id} expired after "
                    f"{time.monotonic() - job.enqueued_at:.1f}s in queue"
                )
            )
            return True
        return False

    def _collect_batch(self) -> Optional[List[Job]]:
        """Pop the head job plus up to max_batch-1 same-signature peers.

        Blocks until a job arrives or shutdown. Returns None on shutdown
        with an empty queue. Jobs whose queue deadline has passed are
        dropped here (DeadlineExceededError) instead of executed.
        """
        with self._wakeup:
            while True:
                while not self._queue and not self._closed:
                    self._wakeup.wait()
                if not self._queue:
                    return None  # closed and drained
                head = self._queue.popleft()
                if not self._expire_if_overdue(head):
                    break
            batch = [head]
            if self.max_batch > 1 and head.signature is not None:
                deadline = time.monotonic() + self.coalesce_window_s
                while len(batch) < self.max_batch:
                    # scan (not just peek) so a mixed queue still batches:
                    # FIFO fairness is preserved for *execution start*,
                    # non-matching jobs keep their queue position.
                    took = None
                    for j in list(self._queue):
                        if self._expire_if_overdue(j):
                            self._queue.remove(j)
                            continue
                        if j.signature == head.signature:
                            took = j
                            break
                    if took is not None:
                        self._queue.remove(took)
                        batch.append(took)
                        continue
                    remaining = deadline - time.monotonic()
                    if remaining <= 0 or self._closed:
                        break
                    self._wakeup.wait(remaining)
            return batch

    def _run(self) -> None:
        while True:
            batch = self._collect_batch()
            if batch is None:
                return
            now = time.monotonic()
            for j in batch:
                j.started_at = now
            try:
                results = self._execute_batch(batch)
                if len(results) != len(batch):
                    raise RuntimeError(
                        f"executor returned {len(results)} results for a "
                        f"batch of {len(batch)}"
                    )
            except BatchItemErrors as e:
                with self._lock:
                    self._batches += 1
                for j, item in zip(batch, e.items):
                    if isinstance(item, BaseException):
                        self._note_fault_if_fatal(item)
                        j.set_error(item)
                        with self._lock:
                            self._failed += 1
                    else:
                        j.set_result(item)
                        self._note_served(j)
                continue
            except BaseException as e:  # noqa: BLE001 — delivered to callers
                self._note_fault_if_fatal(e)
                with self._lock:
                    self._batches += 1
                    self._failed += len(batch)
                for j in batch:
                    j.set_error(e)
                continue
            with self._lock:
                self._batches += 1
            for j, r in zip(batch, results):
                j.set_result(r)
                self._note_served(j)

    def _note_served(self, job: Job) -> None:
        with self._lock:
            self._served += 1
            if job.finished_at is not None:
                self._latencies.append(job.finished_at - job.enqueued_at)

    # ------------------------------------------------------------------
    def shutdown(self, *, wait: bool = True, timeout: float = 30.0) -> None:
        """Stop admitting; fail queued jobs; (optionally) join the worker."""
        with self._wakeup:
            if self._closed:
                return
            self._closed = True
            pending = list(self._queue)
            self._queue.clear()
            self._wakeup.notify_all()
        err = SchedulerClosedError("scheduler shut down before execution")
        for j in pending:
            j.set_error(err)
        if wait:
            self._worker.join(timeout)


class BatchItemErrors(Exception):
    """Raised by execute_batch to report per-item outcomes.

    ``items`` has one entry per job: either a result value or an
    exception instance for that job alone (lets one malformed request
    in a coalesced batch fail without poisoning its batchmates).
    """

    def __init__(self, items: Sequence[Any]):
        super().__init__("per-item batch outcomes")
        self.items = list(items)
