"""MicroBatcher: cross-request batching logic with a stub detector.

The batching layer is detector-agnostic, so the unit tests use a stub
whose ``predict`` records batch shapes — the live-HTTP serve tests
(tests/test_serve.py) cover the integrated path with a real model.
"""
from __future__ import annotations

import threading
import time

import numpy as np
import pytest

from ssdx.serve.batcher import MicroBatcher


class StubDetector:
    def __init__(self, delay_s: float = 0.0):
        self.idx_to_class = {0: "car"}
        self.calls: list[tuple[int, dict]] = []
        self.delay_s = delay_s
        self._lock = threading.Lock()

    def preprocess_pil(self, img):
        # "img" is just an integer tag in these tests
        return np.full((1, 4, 4, 3), float(img), np.float32)

    def predict(self, arrs, **kwargs):
        if self.delay_s:
            time.sleep(self.delay_s)
        with self._lock:
            self.calls.append((arrs.shape[0], dict(kwargs)))
        # echo each image's tag back so callers can check routing
        return [
            {"tag": float(arrs[i, 0, 0, 0]), "kw": dict(kwargs)}
            for i in range(arrs.shape[0])
        ]


def test_single_request_passthrough():
    det = StubDetector()
    mb = MicroBatcher(det, max_batch=8, max_wait_ms=1.0)
    try:
        out = mb.predict_pil(7, score_thresh=0.2)
        assert out["tag"] == 7.0 and out["kw"] == {"score_thresh": 0.2}
        assert det.calls == [(1, {"score_thresh": 0.2})]  # bucket 1, no padding
        assert mb.stats["batches"] == 1 and mb.stats["images"] == 1
    finally:
        mb.close()


def test_concurrent_requests_batch_together():
    det = StubDetector(delay_s=0.05)
    mb = MicroBatcher(det, max_batch=8, max_wait_ms=30.0)
    results = {}

    def call(i):
        results[i] = mb.predict_pil(i)

    try:
        threads = [threading.Thread(target=call, args=(i,)) for i in range(5)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=30)
        # every caller got ITS image's result back
        assert {int(results[i]["tag"]) for i in range(5)} == set(range(5))
        assert results[3]["tag"] == 3.0
        # fewer dispatches than requests, padded to a power-of-two bucket
        sizes = [n for n, _ in det.calls]
        assert sum(mb.stats.values()) > 0
        assert len(det.calls) < 5
        assert all(n in (1, 2, 4, 8) for n in sizes)
        assert mb.stats["images"] == 5
        assert mb.stats["max_batch_seen"] >= 2
    finally:
        mb.close()


def test_mixed_kwargs_grouped_separately():
    det = StubDetector(delay_s=0.05)
    mb = MicroBatcher(det, max_batch=8, max_wait_ms=50.0)
    results = {}

    def call(i, thresh):
        results[i] = mb.predict_pil(i, score_thresh=thresh)

    try:
        threads = [
            threading.Thread(target=call, args=(i, 0.2 if i % 2 else 0.5))
            for i in range(4)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=30)
        for i in range(4):
            assert results[i]["kw"] == {"score_thresh": 0.2 if i % 2 else 0.5}
    finally:
        mb.close()


def test_error_propagates_and_serving_continues():
    class Boom(StubDetector):
        def predict(self, arrs, **kw):
            if kw.get("score_thresh") == -1:
                raise RuntimeError("bad threshold")
            return super().predict(arrs, **kw)

    det = Boom()
    mb = MicroBatcher(det, max_batch=4, max_wait_ms=1.0)
    try:
        with pytest.raises(RuntimeError, match="bad threshold"):
            mb.predict_pil(1, score_thresh=-1)
        # worker survived; next request succeeds
        assert mb.predict_pil(2)["tag"] == 2.0
    finally:
        mb.close()


def test_close_is_idempotent_and_fast():
    mb = MicroBatcher(StubDetector(), max_batch=2, max_wait_ms=1.0)
    t0 = time.monotonic()
    mb.close()
    assert time.monotonic() - t0 < 5.0


def test_warmup_compiles_every_bucket_with_traffic_kwargs():
    """warmup=True pre-runs predict for every batch bucket with EXACTLY the
    kwargs real traffic will use (they are static jit args; other values
    would compile the wrong programs)."""
    det = StubDetector()
    kw = {"score_thresh": 0.2, "nms_thresh": 0.3, "max_per_img": 100}
    mb = MicroBatcher(det, max_batch=8, max_wait_ms=1.0, warmup=True,
                      warmup_kwargs=kw)
    try:
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline:
            with det._lock:
                sizes = sorted(n for n, k in det.calls if k == kw)
            if sizes == [1, 2, 4, 8]:
                break
            time.sleep(0.01)
        assert sizes == [1, 2, 4, 8], sizes
        # a real request right after warmup hits an already-compiled bucket
        out = mb.predict_pil(3, **kw)
        assert out["tag"] == 3.0
    finally:
        mb.close()


def test_concurrent_load_latency_sane():
    """Sustained concurrent load: all requests served, per-request latency
    bounded by (wait window + model time + queueing), batcher coalesces."""
    det = StubDetector(delay_s=0.01)
    mb = MicroBatcher(det, max_batch=8, max_wait_ms=5.0)
    lat: list[float] = []
    lock = threading.Lock()

    def client(i):
        t0 = time.monotonic()
        out = mb.predict_pil(i)
        dt = time.monotonic() - t0
        with lock:
            lat.append(dt)
        assert out["tag"] == float(i)

    try:
        threads = [threading.Thread(target=client, args=(i,)) for i in range(32)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=60)
        assert len(lat) == 32
        assert mb.stats["images"] == 32
        assert mb.stats["batches"] < 32  # coalescing happened
        lat.sort()
        p99 = lat[int(0.99 * (len(lat) - 1))]
        # 32 reqs / 8-wide batches @ ~10ms model time + 5ms windows: generous
        # bound that still catches serialization regressions (32 x 10ms)
        assert p99 < 0.25, f"p99={p99:.3f}s"
    finally:
        mb.close()
