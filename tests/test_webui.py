"""No-gradio browser dashboard (serve/webui.py): the GET / page, the
POST /predict 11-output JSON contract, base64 upload spooling, and vault
gallery inlining. Mirrors the gradio predict() contract (reference
forensics_dashboard.py:290-302) over plain HTTP."""

import base64
import io
import json
import urllib.request

import jax
import numpy as np
import pytest

from misinfo_tpu.core.config import ForensicsConfig
from misinfo_tpu.engine.forensics import MisinfoForensics
from misinfo_tpu.models.detector import DetectorConfig, detector_init
from misinfo_tpu.serve.api import ForensicsAPI, serve

DET = DetectorConfig.tiny()

PAYLOAD_KEYS = {"badge_html", "verdict_text", "labels", "gallery",
                "report_md", "vault_md", "transcript"}
LABEL_KEYS = {"ai", "misinfo", "deepfake", "clip", "vault"}


@pytest.fixture(scope="module")
def api_server():
    cfg = ForensicsConfig(verbose=False)
    cfg = cfg.replace(seq=cfg.seq.__class__(roberta_max_len=32,
                                            image_size=DET.clip.image_size))
    engine = MisinfoForensics(config=cfg, det_cfg=DET,
                              params=detector_init(jax.random.PRNGKey(0), DET))
    api = ForensicsAPI(engine=engine)
    httpd = serve(api, port=0)
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()
    api.close()


def _post(url, payload):
    req = urllib.request.Request(url, data=json.dumps(payload).encode(),
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _png_b64(seed=0, size=64):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.random.default_rng(seed).integers(
        0, 255, (size, size, 3)).astype(np.uint8)).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_index_page_served(api_server):
    with urllib.request.urlopen(api_server + "/", timeout=30) as r:
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/html")
        page = r.read().decode()
    # the page must carry the full UI contract surface
    for marker in ("id=\"caption\"", "id=\"image\"", "id=\"video\"",
                   "id=\"meters\"", "id=\"gallery\"", "id=\"transcript\"",
                   "/predict", "/healthz"):
        assert marker in page, marker


def test_predict_text_only(api_server):
    code, body = _post(api_server + "/predict", {"text": "a plain claim"})
    assert code == 200
    assert set(body) == PAYLOAD_KEYS
    assert set(body["labels"]) == LABEL_KEYS
    assert body["verdict_text"] in ("REAL", "FAKE")
    assert body["verdict_text"] in body["badge_html"]
    # text-only: visual signals gated to N/A (reference _probs :98-114)
    assert set(body["labels"]["ai"]) == {"AI-generated", "Human-written"}
    assert list(body["labels"]["deepfake"]) == ["N/A (modality not provided)"]
    assert list(body["labels"]["clip"]) == ["N/A (modality not provided)"]
    assert "Forensic report" in body["report_md"]
    assert body["transcript"] == ""


def test_predict_image_upload(api_server):
    code, body = _post(api_server + "/predict",
                       {"text": "caption", "image_b64": _png_b64()})
    assert code == 200
    assert set(body["labels"]["deepfake"]) == {"Deepfake", "Authentic"}
    assert set(body["labels"]["clip"]) == {"Consistent", "Mismatched"}
    # probabilities are complementary (probs_label contract)
    vals = list(body["labels"]["deepfake"].values())
    assert abs(sum(vals) - 1.0) < 1e-6


def test_predict_empty_inputs(api_server):
    code, body = _post(api_server + "/predict", {"text": ""})
    assert code == 200
    assert body["verdict_text"] == "N/A"
    assert "Provide a caption" in body["badge_html"]
    assert body["gallery"] == []


def test_gallery_inlining(tmp_path):
    """_inline_gallery base64-encodes existing archive images and skips
    missing paths (the browser can't fetch server-local files)."""
    from PIL import Image

    from misinfo_tpu.serve.webui import _inline_gallery

    p = tmp_path / "match.jpg"
    Image.fromarray(np.zeros((8, 8, 3), dtype=np.uint8)).save(p)
    out = _inline_gallery([(str(p), "93.0% Match"),
                           ("/nonexistent/x.png", "nope")])
    assert len(out) == 1
    assert out[0]["caption"] == "93.0% Match"
    assert out[0]["mime"] == "image/jpeg"
    assert base64.b64decode(out[0]["image_b64"])[:2] == b"\xff\xd8"  # JPEG SOI


def test_predict_payload_spools_and_cleans(monkeypatch, tmp_path):
    """image_b64 uploads are spooled to a temp file for the dashboard
    predict() path and removed afterwards."""
    import misinfo_tpu.serve.webui as W

    seen = {}

    def fake_predict(image_path, text, video_path, engine=None):
        import os
        seen["path"] = image_path
        seen["existed"] = os.path.exists(image_path)
        empty = {"N/A (modality not provided)": 1.0}
        return ("<div>ok</div>", "REAL", empty, empty, empty, empty, empty,
                [], "", "", "")

    monkeypatch.setattr(W._dash, "predict", fake_predict)
    body = W.predict_payload({"text": "t", "image_b64": _png_b64()})
    import os
    assert seen["existed"] and not os.path.exists(seen["path"])
    assert body["verdict_text"] == "REAL"
