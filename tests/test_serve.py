"""HTTP tests for the demo app with a stub detector (no model compile)."""
import io
import threading

import httpx
import numpy as np
import pytest
from PIL import Image

from ssdx.serve.app import CLASS_TO_IDX, create_server


class StubDetector:
    """Detector stand-in: fixed predictions, no JAX involved."""

    idx_to_class = {v: k for k, v in CLASS_TO_IDX.items()}
    class_to_idx = CLASS_TO_IDX

    def predict_pil(self, pil_img, **kwargs):
        return {
            "labels": np.array([1], np.int64),
            "scores": np.array([0.9], np.float32),
            "boxes": np.array([[50, 50, 150, 150]], np.float32),
        }


@pytest.fixture(scope="module")
def server_url(tmp_path_factory):
    static = tmp_path_factory.mktemp("static")
    Image.new("RGB", (32, 32), (255, 0, 0)).save(static / "example1.jpg")
    server = create_server(StubDetector(), host="127.0.0.1", port=0, static_dir=static)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    server.shutdown()


def test_index(server_url):
    r = httpx.get(server_url + "/")
    assert r.status_code == 200
    assert "text/html" in r.headers["content-type"]
    assert "/predict" in r.text


def test_model_card(server_url):
    r = httpx.get(server_url + "/model-card")
    assert r.status_code == 200
    assert "SSD300" in r.text


def test_examples_lists_static(server_url):
    r = httpx.get(server_url + "/examples")
    assert r.status_code == 200
    assert "example1.jpg" in r.text


def test_static_serving_and_traversal_guard(server_url):
    assert httpx.get(server_url + "/static/example1.jpg").status_code == 200
    assert httpx.get(server_url + "/static/../app.py").status_code == 404


def test_predict_returns_png(server_url):
    buf = io.BytesIO()
    Image.new("RGB", (320, 240), (0, 128, 255)).save(buf, format="JPEG")
    r = httpx.post(
        server_url + "/predict",
        files={"file": ("street.jpg", buf.getvalue(), "image/jpeg")},
    )
    assert r.status_code == 200
    assert r.headers["content-type"] == "image/png"
    out = Image.open(io.BytesIO(r.content))
    # side-by-side: height 512, width = 2 * round(512 * 320/240)
    assert out.height == 512
    assert out.width == 2 * round(512 * 320 / 240)


def test_predict_bad_payload(server_url):
    r = httpx.post(server_url + "/predict", content=b"not an image")
    assert r.status_code == 400


def test_404(server_url):
    assert httpx.get(server_url + "/nope").status_code == 404


def test_sibling_prefix_traversal_rejected(tmp_path_factory):
    """ADVICE: a prefix check admits sibling dirs sharing the prefix
    (/static/../static_old/x); is_relative_to must reject them."""
    base = tmp_path_factory.mktemp("prefix")
    static = base / "static"
    static.mkdir()
    Image.new("RGB", (8, 8)).save(static / "ok.jpg")
    sibling = base / "static_old"
    sibling.mkdir()
    (sibling / "secret.txt").write_text("leak")

    server = create_server(StubDetector(), host="127.0.0.1", port=0,
                           static_dir=static)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{port}"
        assert httpx.get(url + "/static/ok.jpg").status_code == 200
        r = httpx.get(url + "/static/../static_old/secret.txt")
        assert r.status_code == 404
        assert "leak" not in r.text
    finally:
        server.shutdown()


def test_bundled_examples_and_model_card_metrics():
    """The repo ships example gallery assets and the model card carries the
    measured metric table (reference ssd_demo_app.py:169-276)."""
    from pathlib import Path

    import ssdx.serve.app as app_mod

    static = Path(app_mod.__file__).parent / "static"
    bundled = sorted(p.name for p in static.glob("*.jpg"))
    assert len(bundled) >= 3
    assert "0.5292" in app_mod._MODEL_CARD_HTML  # best-run mAP table
    assert "trafficLight" in app_mod._MODEL_CARD_HTML


def test_docker_context_buildable():
    import subprocess
    import sys
    from pathlib import Path

    script = Path(__file__).parent.parent / "scripts" / "check_docker_context.py"
    proc = subprocess.run([sys.executable, str(script)], capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_untrained_weights_banner(tmp_path_factory):
    """With weights_loaded=False the server must show the honest-demo banner
    on every HTML page; a trained detector (the stub's default) must not."""
    static = tmp_path_factory.mktemp("static_banner")
    det = StubDetector()
    det.weights_loaded = False
    server = create_server(det, host="127.0.0.1", port=0, static_dir=static)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        for path in ("/", "/model-card", "/examples"):
            r = httpx.get(base + path)
            assert "Untrained demo weights" in r.text, path
    finally:
        server.shutdown()


def test_no_banner_when_weights_loaded(server_url):
    r = httpx.get(server_url + "/")
    assert "Untrained demo weights" not in r.text


def test_bundled_demo_weights_banner(tmp_path_factory):
    """A detector flagged as running the bundled demo weights gets the amber
    'Bundled demo weights' banner (distinct from the red untrained one)."""
    static = tmp_path_factory.mktemp("static_demo_banner")
    det = StubDetector()
    det.weights_loaded = True
    det.demo_weights = True
    server = create_server(det, host="127.0.0.1", port=0, static_dir=static)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        r = httpx.get(f"http://127.0.0.1:{port}/")
        assert "Bundled demo weights" in r.text
        assert "Untrained demo weights" not in r.text
    finally:
        server.shutdown()


def test_create_detector_bundled_fallback(monkeypatch, tmp_path):
    """With no saved_models/best.weights, create_detector serves the bundled
    demo_weights.npz (trained on the procedural scene distribution) rather
    than random init."""
    from pathlib import Path

    import ssdx.serve.app as app_mod

    bundled = Path(app_mod.__file__).parent / "demo_weights.npz"
    if not bundled.exists():
        pytest.skip("demo bundle not built (scripts/make_demo_weights.py)")
    monkeypatch.setattr(app_mod, "DEFAULT_WEIGHTS", str(tmp_path / "missing.weights"))
    det = app_mod.create_detector()
    assert det.weights_loaded and det.demo_weights
