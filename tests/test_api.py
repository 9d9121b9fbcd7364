"""REST API server (serve/api.py): endpoints, batching, image_b64 decode,
error mapping. Uses a tiny-engine instance and an ephemeral port."""

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


def test_healthz(api_server):
    with urllib.request.urlopen(api_server + "/healthz", timeout=30) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["checkpoint_mode"] == "provided"
    # hash-fallback tokenizers (no assets in this image) must be surfaced
    assert body["tokenizer_parity"] is False
    assert set(body["tokenizer_grades"]) == {"roberta", "clip"}


def test_metrics_endpoint(api_server):
    # drive one request so the counters are nonzero, then scrape
    code, _ = _post(api_server + "/analyze", {"text": "metrics probe"})
    assert code == 200
    with urllib.request.urlopen(api_server + "/metrics", timeout=30) as r:
        body = json.loads(r.read())
    assert body["verdicts_per_sec"] > 0
    assert body.get("analyze_count", 0) >= 1
    assert body.get("analyze_seconds", 0) > 0
    # rolling-window stage latency percentiles ride the same scrape
    assert body.get("analyze_p50_ms", 0) > 0
    assert body.get("analyze_p99_ms", 0) >= body["analyze_p50_ms"]
    mem = body["memory"]
    assert mem["params_bytes"] > 0
    assert mem["vault_bytes"] == sum(mem["vault_bytes_by_key"].values())
    assert mem["vault_dtype"] == "float32" and mem["devices"] >= 1


def test_analyze_text(api_server):
    code, body = _post(api_server + "/analyze", {"text": "api test claim"})
    assert code == 200
    assert body["verdict_text"] in ("REAL", "FAKE")
    assert set(body["scores"]) >= {"ai_score", "misinfo_score",
                                   "fake_probability"}


def test_analyze_image_b64(api_server):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (64, 64, 3)).astype(np.uint8)).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    code, body = _post(api_server + "/analyze",
                       {"text": "caption", "image_b64": b64})
    assert code == 200
    assert "clip_similarity" in body["scores"]
    assert body["scores"]["deepfake_score"] >= 0.0


def test_analyze_batch_endpoint(api_server):
    code, body = _post(api_server + "/analyze_batch",
                       [{"text": "a"}, {"text": "b"}])
    assert code == 200 and len(body) == 2


def test_concurrent_clients_consistent(api_server):
    """ThreadingHTTPServer handles each request on its own thread; the
    micro-batcher funnels them through one collector, so concurrent
    clients must all succeed and identical payloads must score
    identically (no cross-request state bleed)."""
    from concurrent.futures import ThreadPoolExecutor

    payload = {"text": "the same claim from every client"}
    with ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(
            lambda _: _post(api_server + "/analyze", payload), range(16)))
    assert all(code == 200 for code, _ in results)
    scores = [json.dumps(body["scores"], sort_keys=True)
              for _, body in results]
    assert len(set(scores)) == 1


def test_bad_request_maps_to_error(api_server):
    code, body = _post(api_server + "/analyze", {})
    assert code in (400, 500)
    assert "error" in body


def test_unknown_endpoint(api_server):
    code, body = _post(api_server + "/nope", {"x": 1})
    assert code == 404


def test_decode_request_transcribe(monkeypatch):
    """Per-request transcribe option merges the video transcript into the
    text (dashboard rule) and strips the flag before the engine sees it."""
    from misinfo_tpu.serve import transcript as T
    from misinfo_tpu.serve.api import _decode_request_image

    monkeypatch.setattr(T, "extract_transcript", lambda p: "spoken")
    out = _decode_request_image({"text": "cap", "video_path": "/v.mp4",
                                 "transcribe": True})
    assert out["text"] == "cap\n\nspoken"
    assert out["video"] == "/v.mp4"
    assert "transcribe" not in out

    # error transcript → text untouched
    monkeypatch.setattr(T, "extract_transcript",
                        lambda p: "[transcript error: x]")
    out2 = _decode_request_image({"text": "cap", "video_path": "/v.mp4",
                                  "transcribe": True})
    assert out2["text"] == "cap"

    # no flag → no transcription attempted
    monkeypatch.setattr(T, "extract_transcript",
                        lambda p: (_ for _ in ()).throw(AssertionError))
    out3 = _decode_request_image({"text": "cap", "video_path": "/v.mp4"})
    assert out3["text"] == "cap"


def test_metrics_surface_gemini_error_classes(api_server):
    """VERDICT r2 #5 end-to-end: an auth failure and a quota failure on
    the LLM path land as DISTINCT counters in a /metrics scrape — the
    operator can tell a bad key from a quota blip."""
    from misinfo_tpu.utils.tracing import GLOBAL_TRACER

    class _Boom:
        def __init__(self, msg):
            self.msg = msg

        def generate_content(self, prompt):
            raise RuntimeError(self.msg)

    # arm the LIVE server engine's explainer (module-scoped fixture)
    import tests.test_api as _self  # noqa: F401  (fixture engine reachable
    # only through the tracer side effects — drive explain() directly on a
    # standalone Explainer wired to the GLOBAL tracer, which /metrics reads)
    from misinfo_tpu.engine.explain import Explainer

    ex = Explainer(api_key=None, tracer=GLOBAL_TRACER)
    ex.available = True
    ex._model = _Boom("Invalid API key")
    ex.explain({"verdict": 1, "confidence": 0.5}, [])
    ex._model = _Boom("quota exceeded today")
    ex.explain({"verdict": 1, "confidence": 0.5}, [])

    with urllib.request.urlopen(api_server + "/metrics", timeout=30) as r:
        body = json.loads(r.read())
    assert body.get("gemini_error_auth_count", 0) >= 1
    assert body.get("gemini_error_quota_count", 0) >= 1


def test_serve_while_warming_background(api_server):
    """VERDICT r4 #3: --warmup background fills the full grid from a
    background thread while the API serves; /healthz exposes progress and
    requests succeed mid-warmup."""
    import time
    import urllib.request

    # reuse the module server's api object through a fresh background warm
    from misinfo_tpu.serve.api import ForensicsAPI  # noqa: F401 (clarity)

    # grab the api object via a tiny second server to keep fixtures simple
    cfg = ForensicsConfig(verbose=False)
    cfg = cfg.replace(seq=cfg.seq.__class__(roberta_max_len=32,
                                            image_size=DET.clip.image_size),
                      serving=cfg.serving.__class__(batch_buckets=(1, 4),
                                                    pack_text=False))
    engine = MisinfoForensics(config=cfg, det_cfg=DET,
                              params=detector_init(jax.random.PRNGKey(0),
                                                   DET))
    api = ForensicsAPI(engine=engine)
    httpd = serve(api, port=0)
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        api.start_background_warmup()
        # requests succeed while warming
        code, out = _post(f"{base}/analyze", {"text": "warming claim"})
        assert code == 200 and out["verdict_text"] in ("REAL", "FAKE")
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            h = json.loads(r.read())
        assert "warming" in h
        deadline = time.time() + 300
        while time.time() < deadline:
            with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
                h = json.loads(r.read())
            if not h["warming"]["active"]:
                break
            time.sleep(0.5)
        assert not h["warming"]["active"], h
        assert "error" not in h["warming"], h
        assert h["warming"]["signatures"] > 0
        assert h["warming"]["done"] == h["warming"]["signatures"]
    finally:
        httpd.shutdown()
        api.close()
