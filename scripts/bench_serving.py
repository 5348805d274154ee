#!/usr/bin/env python
"""Serving latency/occupancy benchmark over live HTTP (VERDICT r3 #6).

Launches the real stdlib HTTP server (ssdx/serve/app.py — the reference
contract is FastAPI `POST /predict` -> PNG, ssd_demo_app.py:281-300) with
the bundled demo weights and micro-batching + bucket warmup (the TPU
default), then measures:

  * sequential single-image latency: one closed-loop client, p50/p95/p99
  * concurrent load: C closed-loop clients x R requests each, p50/p95/p99
    and the batcher occupancy (images per device dispatch) the burst
    achieved
  * warm-start: latency of the FIRST post-warmup request (the VERDICT
    serving-hardening item: no first-request XLA compile)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_serving.py \
          [--clients 8] [--requests 25] [--port 8123]

Prints a JSON summary; paste the numbers into README's serving section.
"""
from __future__ import annotations

import argparse
import io
import json
import sys
import threading
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def _example_jpeg() -> bytes:
    static = Path(__file__).parent.parent / "ssdx" / "serve" / "static"
    for p in sorted(static.glob("*.jpg")):
        return p.read_bytes()
    # fallback: synthesize one scene
    from PIL import Image

    from ssdx.data.synth import render_scene

    img, _, _ = render_scene(np.random.default_rng(0), size=512)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=92)
    return buf.getvalue()


def _post_predict(port: int, jpeg: bytes) -> float:
    boundary = "x" + "b" * 30
    body = (
        f"--{boundary}\r\nContent-Disposition: form-data; name=\"file\"; "
        f"filename=\"t.jpg\"\r\nContent-Type: image/jpeg\r\n\r\n"
    ).encode() + jpeg + f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict",
        data=body,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
        method="POST",
    )
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=600) as r:
        assert r.status == 200 and r.read(8).startswith(b"\x89PNG"), r.status
    return time.perf_counter() - t0


def _pct(lat: list[float], q: float) -> float:
    s = sorted(lat)
    return s[min(len(s) - 1, int(q * (len(s) - 1) + 0.5))]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=25)
    ap.add_argument("--port", type=int, default=8123)
    args = ap.parse_args()

    from ssdx.serve.app import create_detector, create_server

    det = create_detector()
    srv = create_server(det, host="127.0.0.1", port=args.port, batching=True,
                        batching_warmup=True)
    batcher = srv.predictor  # MicroBatcher (create_server exposes it)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    jpeg = _example_jpeg()

    # Wait for bucket warmup to finish (compiles run on a daemon thread).
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < 600:
        s = time.perf_counter()
        _post_predict(args.port, jpeg)
        if time.perf_counter() - s < 1.0:  # compiled path
            break
    warm_first = _post_predict(args.port, jpeg)

    seq = [_post_predict(args.port, jpeg) for _ in range(30)]

    # Concurrent closed-loop load.
    base_batches, base_images = batcher.stats["batches"], batcher.stats["images"]
    lats: list[float] = []
    lock = threading.Lock()

    def client():
        mine = [_post_predict(args.port, jpeg) for _ in range(args.requests)]
        with lock:
            lats.extend(mine)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(args.clients)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    wall = time.perf_counter() - t0

    batches = batcher.stats["batches"] - base_batches
    images = batcher.stats["images"] - base_images
    out = {
        "warm_first_request_s": round(warm_first, 4),
        "sequential": {"p50_s": round(_pct(seq, 0.5), 4),
                       "p95_s": round(_pct(seq, 0.95), 4),
                       "p99_s": round(_pct(seq, 0.99), 4)},
        "concurrent": {"clients": args.clients,
                       "requests": len(lats),
                       "p50_s": round(_pct(lats, 0.5), 4),
                       "p95_s": round(_pct(lats, 0.95), 4),
                       "p99_s": round(_pct(lats, 0.99), 4),
                       "throughput_req_s": round(len(lats) / wall, 2),
                       "batcher_occupancy": round(images / max(1, batches), 2),
                       "device_dispatches": batches},
    }
    srv.shutdown()
    batcher.close()
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
