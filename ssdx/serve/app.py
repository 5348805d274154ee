"""HTTP demo app: browser upload -> side-by-side detection PNG.

Same route surface and contract as the reference FastAPI app
(app_files/ssd_demo_app.py): ``GET /`` HTML upload page (:39-165),
``GET /model-card`` (:169-211), ``GET /examples`` (:216-276),
``POST /predict`` multipart image -> PNG bytes (:281-300), ``GET /static/*``
(:21-23), listening on ``$PORT`` default 8080 (:16-18).  The model is
constructed once at server start (module import in the reference, :26-36)
with the hardcoded 5-class Udacity map.

FastAPI/uvicorn are not available in this environment, so the app is built on
the stdlib ``http.server`` (threaded); the HTTP contract is identical.
"""
from __future__ import annotations

import email
import email.policy
import io
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

__all__ = ["CLASS_TO_IDX", "create_detector", "create_server", "main"]

# Hardcoded deployment class map (ssd_demo_app.py:26-28)
CLASS_TO_IDX = {"biker": 0, "car": 1, "pedestrian": 2, "trafficLight": 3, "truck": 4}

DEFAULT_WEIGHTS = "saved_models/best.weights"

_INDEX_HTML = """<!doctype html>
<html><head><title>SSDX — TPU SSD300 demo</title>
<style>
 body { font-family: sans-serif; max-width: 900px; margin: 2rem auto; }
 .panel { border: 1px solid #ccc; border-radius: 8px; padding: 1rem; }
 img { max-width: 100%; }
 nav a { margin-right: 1rem; }
</style></head>
<body>
<nav><a href="/">Home</a><a href="/model-card">Model card</a>
<a href="/examples">Examples</a></nav>
<h1>SSD300 object detection (TPU-native)</h1>
<p>Upload a street-scene image; the detector returns the original and the
annotated image side by side.</p>
<div class="panel">
  <input type="file" id="file" accept="image/*">
  <button onclick="run()">Detect</button>
  <p id="status"></p>
  <img id="result">
</div>
<script>
async function run() {
  const f = document.getElementById('file').files[0];
  if (!f) { document.getElementById('status').textContent = 'pick a file first'; return; }
  const fd = new FormData();
  fd.append('file', f);
  document.getElementById('status').textContent = 'running…';
  const r = await fetch('/predict', { method: 'POST', body: fd });
  if (!r.ok) { document.getElementById('status').textContent = 'error ' + r.status; return; }
  const blob = await r.blob();
  document.getElementById('result').src = URL.createObjectURL(blob);
  document.getElementById('status').textContent = 'done';
}
</script>
</body></html>"""

_MODEL_CARD_HTML = """<!doctype html>
<html><head><title>Model card — SSDX</title>
<style>
 body { font-family: sans-serif; max-width: 900px; margin: 2rem auto; }
 table { border-collapse: collapse; margin: 1rem 0; }
 th, td { border: 1px solid #ccc; padding: 0.35rem 0.7rem; text-align: right; }
 th:first-child, td:first-child { text-align: left; }
 nav a { margin-right: 1rem; }
</style></head>
<body>
<nav><a href="/">Home</a><a href="/model-card">Model card</a>
<a href="/examples">Examples</a></nav>
<h1>Model card</h1>
<ul>
<li><b>Architecture:</b> SSD300 — VGG16+BatchNorm backbone, 6 multibox
feature heads, 8732 priors (~26M params).</li>
<li><b>Framework:</b> ssdx (JAX/XLA, TPU-native), NHWC, jit-compiled
inference with batched DIoU-NMS; serving runs the BN-folded weights.</li>
<li><b>Classes:</b> biker, car, pedestrian, trafficLight, truck.</li>
<li><b>Training data:</b> Udacity self-driving car dataset (~29.8k images,
~195k boxes; stratified group split, seed 724).</li>
<li><b>Recipe:</b> 150 epochs, bs=16, SGD-Nesterov lr 3e-3 cosine→1e-6,
5-epoch warmup, bootstrap oversampling, ConditionalIoUCrop.</li>
<li><b>Thresholds:</b> score 0.2, NMS (DIoU) 0.3, max 100 detections.</li>
</ul>

<h2>Accuracy — reference recipe, mAP@0.5 on the held-out test split</h2>
<p>Targets from the reference implementation's published runs
(automotive-ssd-object-detection README); the ssdx parity runbook
(<code>tests/test_udacity_parity.py</code>) reproduces the best recipe when
the dataset is present.</p>
<table>
<tr><th>Run</th><th>mAP@0.5</th><th>biker</th><th>car</th><th>pedestrian</th>
<th>trafficLight</th><th>truck</th></tr>
<tr><td>Zoom-out, no bootstrap</td><td>0.4613</td><td>0.2854</td>
<td>0.6618</td><td>0.2145</td><td>0.5571</td><td>0.5875</td></tr>
<tr><td>No zoom-out, no bootstrap</td><td>0.4724</td><td>0.3015</td>
<td>0.6681</td><td>0.2314</td><td>0.5619</td><td>0.5992</td></tr>
<tr><td><b>No zoom-out, bootstrap (deployed)</b></td><td><b>0.5292</b></td>
<td>0.4045</td><td>0.7088</td><td>0.2907</td><td>0.5956</td><td>0.6465</td></tr>
</table>

<h2>Throughput — ssdx on TPU</h2>
<table>
<tr><th>Benchmark</th><th>Measured</th></tr>
<tr><td>Batched inference bs=32, decode + per-class DIoU-NMS
(one v5e chip)</td><td>&gt; 1,500 images/sec</td></tr>
<tr><td>North-star target (v5e-8)</td><td>5,000 images/sec</td></tr>
</table>
<p>See the repository README "Performance" section for the current
benchmark numbers (<code>bench.py</code>, <code>benchmarks/run.py</code>).</p>
</body></html>"""


def create_detector(weights_path: str | os.PathLike | None = None):
    """Build the serving Detector, loading exported weights when present.

    On a TPU backend the fused Pallas stem kernel is enabled (measured
    faster end-to-end) and the network runs in bfloat16 — the configuration
    bench.py/benchmarks measure and the one the stem kernel's tile layout
    was tuned for.  On CPU the kernel would run in slow interpret mode and
    bf16 is emulated, so the plain XLA float32 path is used.

    ``SSDX_INT8=1`` additionally quantizes the post-stem backbone to int8
    (ssdx/quant.py), calibrated on the bundled example scenes; prefer
    calibrating on production traffic via ``Detector.quantize_int8`` and
    passing the detector in explicitly.  On TPU the int8 convs run as
    Pallas MXU kernels (ssdx/ops/pallas_int8_conv.py); on CPU they run
    apply_int8's f32 fast route (the XLA scalar int32 path was ~50x
    slower) — see the ssdx/quant.py docstring."""
    import jax
    import jax.numpy as jnp

    from ..api import Detector

    on_tpu = jax.default_backend() in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    weights_path = Path(weights_path or DEFAULT_WEIGHTS)
    bundled = Path(__file__).parent / "demo_weights.npz"
    if weights_path.exists():
        det = Detector.from_weights(
            weights_path, CLASS_TO_IDX, stem_kernel=on_tpu, dtype=dtype
        )
        det.weights_loaded = True
        det.demo_weights = False
    elif bundled.exists():
        # Bundled fallback: real weights trained on the procedural scene
        # distribution behind /examples (scripts/make_demo_weights.py,
        # mAP@0.5 ~0.75 on held-out scenes) — the app detects objects out
        # of the box, with a banner stating what the weights are.
        det = Detector.from_weights(
            bundled, CLASS_TO_IDX, stem_kernel=on_tpu, dtype=dtype
        )
        det.weights_loaded = True
        det.demo_weights = True
    else:
        det = Detector(CLASS_TO_IDX, fold_bn=on_tpu, stem_kernel=on_tpu, dtype=dtype)
        # surfaced as a visible banner by the server: random-init weights
        # draw noise boxes and must never masquerade as a working detector
        det.weights_loaded = False
        det.demo_weights = False
    if os.environ.get("SSDX_INT8") == "1" and det.model.fold_bn:
        import numpy as np
        from PIL import Image

        static = Path(__file__).parent / "static"
        calib = np.concatenate([
            det.preprocess_pil(Image.open(p))
            for p in sorted(static.glob("example_*.jpg"))
        ])
        det.quantize_int8(calib)
        det.int8 = True
    return det


def _parse_multipart(headers, body: bytes) -> bytes | None:
    """Extract the first file part from a multipart/form-data body."""
    ctype = headers.get("Content-Type", "")
    if "multipart/form-data" not in ctype:
        return None
    msg = email.message_from_bytes(
        b"Content-Type: " + ctype.encode() + b"\r\n\r\n" + body,
        policy=email.policy.default,
    )
    for part in msg.iter_parts():
        if part.get_filename() or part.get_param("name", header="content-disposition") == "file":
            return part.get_payload(decode=True)
    return None


def create_server(
    detector=None,
    host: str = "0.0.0.0",
    port: int | None = None,
    static_dir: str | os.PathLike | None = None,
    score_thresh: float = 0.2,
    nms_thresh: float = 0.3,
    max_per_img: int = 100,
    target_height: int = 512,
    batching: bool = True,
    max_batch: int = 8,
    max_wait_ms: float = 4.0,
    batching_warmup: bool | None = None,
) -> ThreadingHTTPServer:
    """Build (but don't start) the threaded HTTP server.

    ``batching=True`` (default) routes predictions through a
    :class:`ssdx.serve.batcher.MicroBatcher`: concurrent uploads within
    ``max_wait_ms`` share one batched device dispatch instead of
    serializing B=1 runs behind a lock.
    """
    from PIL import Image

    from ..viz import side_by_side_prediction

    if detector is None:
        detector = create_detector()
    if port is None:
        port = int(os.environ.get("PORT", "8080"))
    # Honest-demo banner: with no trained weights the detector draws noise
    # boxes; say so on every HTML page instead of silently pretending
    # (the reference app always ships trained weights, ssd_demo_app.py:32-36).
    weights_loaded = getattr(detector, "weights_loaded", True)
    demo_weights = getattr(detector, "demo_weights", False)
    if not weights_loaded:
        banner = (
            "<div style='background:#c0392b;color:#fff;padding:0.6rem 1rem;"
            "border-radius:6px;margin:0 0 1rem 0'><b>Untrained demo weights.</b> "
            "No <code>saved_models/best.weights</code> was found, so the model "
            "is randomly initialized and detections are noise. Train a model "
            "(<code>python -m ssdx.train.run</code>) or generate demo weights "
            "(<code>python scripts/make_demo_weights.py</code>).</div>"
        )
    elif demo_weights:
        banner = (
            "<div style='background:#b9770e;color:#fff;padding:0.6rem 1rem;"
            "border-radius:6px;margin:0 0 1rem 0'><b>Bundled demo weights.</b> "
            "Serving the bundled model trained on procedural street scenes "
            "(the /examples gallery's distribution, mAP@0.5&nbsp;&asymp;&nbsp;0.75 "
            "held-out) — not the Udacity-trained production model. Drop a real "
            "export at <code>saved_models/best.weights</code> to replace it.</div>"
        )
    else:
        banner = ""
    static_root = Path(static_dir) if static_dir else Path(__file__).parent / "static"
    # Batching needs the full Detector interface (preprocess_pil + batched
    # predict); duck-typed predictors that only offer predict_pil fall back
    # to the serialized lock path.
    if batching and hasattr(detector, "preprocess_pil") and hasattr(detector, "predict"):
        import jax

        from .batcher import MicroBatcher

        if batching_warmup is None:
            # TPU compiles are minutes through a remote-compile service; the
            # first upload would otherwise stall behind them (measured: the
            # very first request exceeded 120 s).  On CPU the demo's lazy
            # compile is acceptable and warmup would slow startup.
            batching_warmup = jax.default_backend() in ("tpu", "axon")
        predictor = MicroBatcher(
            detector, max_batch=max_batch, max_wait_ms=max_wait_ms,
            warmup=batching_warmup,
            # must match the render path's kwargs exactly — they are static
            # jit args, so different values mean different compiled programs
            warmup_kwargs=dict(
                score_thresh=score_thresh, nms_thresh=nms_thresh,
                max_per_img=max_per_img,
            ),
        )
        lock = None  # the batcher's worker thread serializes device work
    else:
        predictor = detector
        lock = threading.Lock()  # single in-flight prediction (one accelerator)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        @staticmethod
        def _with_banner(html: str) -> bytes:
            return html.replace("<nav>", banner + "<nav>", 1).encode()

        def do_GET(self):
            if self.path == "/" or self.path == "/index.html":
                self._send(200, self._with_banner(_INDEX_HTML), "text/html; charset=utf-8")
            elif self.path == "/model-card":
                self._send(200, self._with_banner(_MODEL_CARD_HTML), "text/html; charset=utf-8")
            elif self.path == "/examples":
                self._send(200, self._with_banner(self._examples_html()), "text/html; charset=utf-8")
            elif self.path.startswith("/static/"):
                self._serve_static(self.path[len("/static/"):])
            elif self.path == "/healthz":
                self._send(200, b"ok", "text/plain")
            else:
                self._send(404, b"not found", "text/plain")

        def _examples_html(self) -> str:
            imgs = []
            if static_root.is_dir():
                imgs = sorted(
                    p.name
                    for p in static_root.iterdir()
                    if p.suffix.lower() in (".jpg", ".jpeg", ".png")
                )
            cards = "\n".join(
                f"<figure style='display:inline-block;margin:0.5rem'>"
                f"<img src='/static/{n}' width='380'>"
                f"<figcaption>{n} — download and upload on the "
                f"<a href='/'>home page</a> to run detection</figcaption>"
                f"</figure>"
                for n in imgs
            )
            return (
                "<!doctype html><html><body style='font-family:sans-serif;"
                "max-width:900px;margin:2rem auto'>"
                "<nav><a href='/' style='margin-right:1rem'>Home</a>"
                "<a href='/model-card' style='margin-right:1rem'>Model card</a>"
                "<a href='/examples'>Examples</a></nav><h1>Examples</h1>"
                "<p>Bundled sample street scenes (procedurally generated "
                "stand-ins; the Udacity dataset itself is not redistributed "
                "with the app).</p>"
                + (cards or "<p>No example images bundled.</p>")
                + "</body></html>"
            )

        def _serve_static(self, rel: str):
            # Resolve then containment-check with is_relative_to (a string
            # prefix check would wrongly admit sibling dirs sharing the
            # prefix, e.g. /static/../static_old/x).
            target = (static_root / rel).resolve()
            if not target.is_relative_to(static_root.resolve()) or not target.is_file():
                self._send(404, b"not found", "text/plain")
                return
            ctype = {
                ".jpg": "image/jpeg", ".jpeg": "image/jpeg", ".png": "image/png",
                ".css": "text/css", ".js": "text/javascript",
            }.get(target.suffix.lower(), "application/octet-stream")
            self._send(200, target.read_bytes(), ctype)

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, b"not found", "text/plain")
                return
            length = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(length)
            payload = _parse_multipart(self.headers, body)
            if payload is None:  # also accept a raw image body
                payload = body
            try:
                pil_img = Image.open(io.BytesIO(payload)).convert("RGB")
            except Exception:
                self._send(400, b"could not decode image", "text/plain")
                return
            render = lambda: side_by_side_prediction(
                predictor,
                pil_img=pil_img,
                score_thresh=score_thresh,
                nms_thresh=nms_thresh,
                max_per_img=max_per_img,
                target_height=target_height,
            )
            if lock is None:
                combined = render()  # MicroBatcher coalesces device work
            else:
                with lock:
                    combined = render()
            buf = io.BytesIO()
            combined.save(buf, format="PNG")
            self._send(200, buf.getvalue(), "image/png")

    server = ThreadingHTTPServer((host, port), Handler)
    server.predictor = predictor  # expose batcher stats / close() to callers
    return server


def main() -> None:
    server = create_server()
    host, port = server.server_address[:2]
    print(f"ssdx demo app listening on http://{host}:{port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
