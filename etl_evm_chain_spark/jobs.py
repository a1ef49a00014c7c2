"""Driver-side job registry (SURVEY §3.2 control plane).

The reference wraps the indexer in a tiny REST API with an in-memory
job map guarded by a RWMutex (`internal/api/server.go:13-22`,
`internal/api/handlers.go:55-211`): POST creates a job id, a goroutine
runs it, GET polls status, DELETE cancels via context. The Spark
analog keeps the same lifecycle (queued → running → finished / error /
cancelled) around async actions:

- batch jobs: a thread running a DataFrame action, cancelled through
  Spark job-group interruption;
- streaming jobs: a StreamingQuery, whose stop() IS the cancel and
  whose status/lastProgress replace the status struct.

This is control plane, not query surface — deliberately thin.
"""

from __future__ import annotations

import secrets
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import SparkSession

QUEUED, RUNNING, FINISHED, ERROR, CANCELLED = (
    "queued", "running", "finished", "error", "cancelled")


@dataclass
class JobStatus:
    job_id: str
    status: str = QUEUED
    error: Optional[str] = None
    created_at: float = field(default_factory=time.time)
    started_at: Optional[float] = None
    finished_at: Optional[float] = None


class JobRegistry:
    """Thread-safe job map (the reference's RWMutex registry,
    `handlers.go:86-88,164-198`)."""

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._lock = threading.RLock()
        self._jobs: dict[str, JobStatus] = {}
        self._threads: dict[str, threading.Thread] = {}
        self._queries: dict[str, object] = {}

    def submit(self, fn: Callable[[SparkSession], None]) -> str:
        """POST /jobs: returns immediately with a 16-byte hex id
        (`handlers.go:294-298`); the work runs on a daemon thread in a
        Spark job group so cancel can interrupt it."""
        job_id = secrets.token_hex(16)
        status = JobStatus(job_id)
        with self._lock:
            self._jobs[job_id] = status

        def run():
            with self._lock:
                status.status = RUNNING
                status.started_at = time.time()
            sc = self._spark.sparkContext
            sc.setJobGroup(job_id, f"job {job_id}", interruptOnCancel=True)
            try:
                fn(self._spark)
            except Exception as e:  # noqa: BLE001
                with self._lock:
                    if status.status != CANCELLED:
                        status.status = ERROR
                        status.error = str(e)[:500]
                    status.finished_at = time.time()
                return
            finally:
                sc.setJobGroup("", "")
            with self._lock:
                if status.status != CANCELLED:
                    status.status = FINISHED
                status.finished_at = time.time()

        t = threading.Thread(target=run, daemon=True)
        with self._lock:
            self._threads[job_id] = t
        t.start()
        return job_id

    def submit_stream(self, start: Callable[[SparkSession], object]) -> str:
        """Streaming variant: the StreamingQuery handle is the job."""
        job_id = secrets.token_hex(16)
        status = JobStatus(job_id, status=RUNNING, started_at=time.time())
        query = start(self._spark)
        with self._lock:
            self._jobs[job_id] = status
            self._queries[job_id] = query
        return job_id

    def get(self, job_id: str) -> JobStatus:
        """GET /jobs/{id} (`handlers.go:164-175`)."""
        with self._lock:
            if job_id not in self._jobs:
                raise KeyError(job_id)
            st = self._jobs[job_id]
            q = self._queries.get(job_id)
        if q is not None and st.status == RUNNING and not q.isActive:
            with self._lock:
                st.status = FINISHED
                st.finished_at = time.time()
        return st

    def cancel(self, job_id: str) -> JobStatus:
        """DELETE /jobs/{id}: context-cancel analog
        (`handlers.go:178-198`) — cancels the Spark job group or stops
        the streaming query."""
        with self._lock:
            if job_id not in self._jobs:
                raise KeyError(job_id)
            st = self._jobs[job_id]
            q = self._queries.get(job_id)
        if q is not None:
            q.stop()
        else:
            self._spark.sparkContext.cancelJobGroup(job_id)
        with self._lock:
            if st.status in (QUEUED, RUNNING):
                st.status = CANCELLED
                st.finished_at = time.time()
        return st

    def wait(self, job_id: str, timeout: float = 60.0) -> JobStatus:
        t = self._threads.get(job_id)
        if t is not None:
            t.join(timeout)
        return self.get(job_id)
