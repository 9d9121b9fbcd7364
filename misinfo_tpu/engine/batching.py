"""Request-queue micro-batching server (SURVEY.md §7 design move 2).

The reference dashboard handles requests strictly serially through one
global engine (reference forensics_dashboard.py:91-94). Here concurrent
callers enqueue requests; a collector thread drains the queue every
`max_wait_ms`, groups by modality variant, pads to the nearest batch
bucket and executes ONE fused program per group — so N concurrent
dashboard/API calls cost ~1 program launch instead of N.

Usage:
    server = BatchingEngine(engine)
    future = server.submit({"text": ..., "image": ...})
    report = future.result()
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Dict, List, Optional


class BatchingEngine:
    def __init__(self, engine, max_wait_ms: Optional[float] = None,
                 max_batch: Optional[int] = None):
        self.engine = engine
        self.max_wait = (max_wait_ms if max_wait_ms is not None
                         else engine.cfg.serving.max_wait_ms) / 1000.0
        self.max_batch = max_batch or max(engine.cfg.serving.batch_buckets)
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="misinfo-batcher")
        self._thread.start()

    def submit(self, request: Dict) -> Future:
        fut: Future = Future()
        self._q.put((request, fut))
        return fut

    def analyze(self, **request) -> Dict:
        """Synchronous convenience mirroring engine.analyze kwargs."""
        req = {k: v for k, v in {
            "text": request.get("text"),
            "image": request.get("image_path"),
            "video": request.get("video_path"),
        }.items() if v}
        return self.submit(req).result()

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2.0)

    # ------------------------------------------------------------ internals

    def _drain(self) -> List:
        items = []
        try:
            items.append(self._q.get(timeout=self.max_wait))
        except queue.Empty:
            return items
        deadline = threading.Event()
        # gather whatever arrived within the micro-batching window
        while len(items) < self.max_batch:
            try:
                items.append(self._q.get_nowait())
            except queue.Empty:
                if deadline.wait(self.max_wait):
                    break
                try:
                    items.append(self._q.get_nowait())
                except queue.Empty:
                    break
        return items

    def _loop(self) -> None:
        # depth-1 pipeline: while batch N executes on device, drain + prep
        # + dispatch batch N+1, then finalize N (engine.analyze_batch_async)
        pending = None  # (futures, finalize)

        def _finish(p):
            futures, finalize = p
            try:
                for fut, res in zip(futures, finalize()):
                    fut.set_result(res)
            except Exception as e:
                for fut in futures:
                    if not fut.done():
                        fut.set_exception(e)

        while not self._stop.is_set():
            items = self._drain()
            nxt = None
            if items:
                requests = [r for r, _ in items]
                futures = [f for _, f in items]
                try:
                    finalize = self.engine.analyze_batch_async(
                        requests, explanations=True)
                    nxt = (futures, finalize)
                except Exception as e:
                    for fut in futures:
                        fut.set_exception(e)
            if pending is not None:
                _finish(pending)
            pending = nxt
        if pending is not None:
            _finish(pending)
