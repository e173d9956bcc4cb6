"""Host-pipeline overlap for streaming evaluation.

The reference gets eval-time host/device overlap for free from a batch-1
DataLoader with num_workers=4 (/root/reference/data/base.py:33-41): image
decode happens in worker processes while the GPU renders.  Our streaming
eval (models/base.py eval_frame) was fully synchronous — per frame it paid
disk decode + device_put + render + host metrics + PNG encode back to back,
which through the remote-TPU tunnel cost ~1.0 s/frame of unoverlapped host
work around a ~0.08 s render (EVAL_ENVELOPE r4: 0.926 views/s end-to-end vs
12.44 render-only).

Two single-purpose threads close that gap:

  * EvalPrefetcher — loads dataset[i] and device_puts frame i+1..i+depth
    while frame i renders.  Bounded queue keeps device memory O(1 frame).
  * AsyncWriter — runs the per-frame PNG encodes (and any other host-side
    sink work) off the critical path; close() drains and re-raises.

Both re-raise worker exceptions at the consuming call site, preserving the
synchronous error contract.
"""

from __future__ import annotations

import queue
import threading

import numpy as np


class _Stop:
    pass


class EvalPrefetcher:
    """Iterate (i, device_frame, host_sample) over dataset indices with a
    background load+upload thread.

    device_frame is ``jax.device_put({k: v[None]})`` of the host sample —
    the exact layout Engine.eval_frame produces — so downstream render jits
    see identical inputs whether frames come from the prefetcher or from
    the synchronous cache path.  host_sample is the raw numpy dict, kept so
    callers can read masks/indices without a device→host round trip.

    Use as a context manager (or fully drain); early exits set the stop
    event so the worker never blocks on a full queue.

    transform: optional ``sample -> host payload dict`` hook that runs ON
    THE WORKER THREAD before device_put — engines use it to upload a
    compact eval payload (uint8 image/mask, object-ray-subset z bounds)
    instead of the full f32 frame: the remote-TPU tunnel serializes
    transfers with compute dispatches, so per-frame bytes are wall-clock
    (probe_eval_stages r5: 7.37 MB f32 frame = 117 ms/frame of the 268 ms
    end-to-end eval budget).  The payload is device_put as-is (no [None]
    batching — the transform owns the layout).
    """

    def __init__(self, dataset, indices=None, depth=2, transform=None):
        import jax
        self._jax = jax
        self.dataset = dataset
        self.transform = transform
        self.indices = list(range(len(dataset))) if indices is None \
            else list(indices)
        self._q = queue.Queue(maxsize=max(int(depth), 1))
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._work, daemon=True)
        self._thread.start()

    def _work(self):
        try:
            for i in self.indices:
                if self._stop.is_set():
                    return
                sample = self.dataset[i]
                if self.transform is not None:
                    frame = self._jax.device_put(self.transform(sample))
                else:
                    frame = self._jax.device_put(
                        {k: np.asarray(v)[None] for k, v in sample.items()})
                while not self._stop.is_set():
                    try:
                        self._q.put((i, frame, sample), timeout=0.2)
                        break
                    except queue.Full:
                        continue
            self._put_forever(_Stop())
        except BaseException as e:  # noqa: BLE001 — re-raised at consumer
            self._put_forever(e)

    def _put_forever(self, item):
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.2)
                return
            except queue.Full:
                continue

    def __iter__(self):
        return self

    def __next__(self):
        # the worker enqueues exactly ONE terminal item (_Stop or the
        # first exception); without this latch a next() after exhaustion
        # would block forever on an empty queue
        if getattr(self, "_done", False):
            raise StopIteration
        item = self._q.get()
        if isinstance(item, _Stop):
            self._done = True
            raise StopIteration
        if isinstance(item, BaseException):
            self._done = True
            raise item
        return item

    def close(self):
        self._stop.set()
        self._thread.join(timeout=10.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


class AsyncWriter:
    """Run (fn, *args) jobs on a writer thread; close() drains and
    re-raises the first failure."""

    def __init__(self, depth=8):
        self._q = queue.Queue(maxsize=max(int(depth), 1))
        self._err = None
        self._thread = threading.Thread(target=self._work, daemon=True)
        self._thread.start()

    def _work(self):
        while True:
            item = self._q.get()
            if isinstance(item, _Stop):
                return
            fn, args = item
            try:
                fn(*args)
            except BaseException as e:  # noqa: BLE001
                if self._err is None:
                    self._err = e

    def submit(self, fn, *args):
        if self._err is not None:
            err, self._err = self._err, None
            raise err
        self._q.put((fn, args))

    def close(self):
        self._q.put(_Stop())
        self._thread.join(timeout=60.0)
        if self._thread.is_alive():
            # a silent return here would report success while queued
            # writes are killed with the daemon thread at process exit
            raise RuntimeError(
                "AsyncWriter: writer thread still running after 60 s "
                "drain timeout — queued writes may be incomplete")
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *exc):
        if exc_type is None:
            self.close()
        else:  # don't mask the primary exception; best-effort drain
            self._q.put(_Stop())
            self._thread.join(timeout=10.0)
        return False
