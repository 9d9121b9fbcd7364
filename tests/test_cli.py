"""CLI entry (C11, reference misinfo_forensics.py:930-966): in-process
drives of serve/cli.py — report JSON output, batch files, and the --mesh
serving flag wiring."""

import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from misinfo_tpu.serve import cli


class _StubEngine:
    """Captures construction + calls without paying a full-size engine."""

    instances = []

    def __init__(self, config=None, mesh=None, **kw):
        self.config, self.mesh = config, mesh
        _StubEngine.instances.append(self)
        self.calls = []

    def _report(self):
        return {"verdict": 0, "verdict_text": "REAL", "confidence": 0.6,
                "scores": {"misinfo_score": 0.4}, "vault_matches": [],
                "explanation": "stub"}

    def analyze(self, **kw):
        self.calls.append(("analyze", kw))
        return self._report()

    def analyze_batch(self, reqs, explanations=False):
        self.calls.append(("analyze_batch", reqs))
        return [self._report() for _ in reqs]

    def analyze_stream(self, reqs, explanations=False):
        reqs = list(reqs)
        self.calls.append(("analyze_stream", reqs))
        return iter([self._report() for _ in reqs])


@pytest.fixture(autouse=True)
def stub_engine(monkeypatch):
    _StubEngine.instances = []
    import misinfo_tpu.engine.forensics as F
    monkeypatch.setattr(F, "MisinfoForensics", _StubEngine)
    yield


def test_cli_text_to_json(tmp_path):
    out = tmp_path / "report.json"
    assert cli.main(["--text", "some claim", "--quiet",
                     "--output", str(out)]) == 0
    rep = json.loads(out.read_text())
    assert rep["verdict_text"] == "REAL"
    eng = _StubEngine.instances[-1]
    assert eng.mesh is None
    assert eng.calls[0][1]["text"] == "some claim"


def test_cli_requires_modality(capsys):
    with pytest.raises(SystemExit):
        cli.main(["--quiet"])


def test_cli_batch_file(tmp_path):
    bf = tmp_path / "reqs.jsonl"
    bf.write_text('{"text": "a"}\n{"text": "b"}\n')
    out = tmp_path / "out.json"
    assert cli.main(["--batch-file", str(bf), "--quiet",
                     "--output", str(out)]) == 0
    reports = json.loads(out.read_text())
    assert len(reports) == 2
    kind, reqs = _StubEngine.instances[-1].calls[0]
    assert kind == "analyze_stream" and len(reqs) == 2


def test_cli_mesh_flag(tmp_path):
    """--mesh builds a real jax Mesh and hands it to the engine."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    assert cli.main(["--text", "claim", "--quiet",
                     "--mesh", "data=4,model=2"]) == 0
    eng = _StubEngine.instances[-1]
    assert eng.mesh is not None
    assert dict(zip(eng.mesh.axis_names, eng.mesh.devices.shape)) == \
        {"data": 4, "model": 2}


def test_cli_vault_and_checkpoint_overrides(tmp_path):
    assert cli.main(["--text", "x", "--quiet", "--vault", "/v.pkl",
                     "--checkpoint", "/ck"]) == 0
    cfg = _StubEngine.instances[-1].config
    assert cfg.paths.vault_path == "/v.pkl"
    assert cfg.paths.orbax_dir == "/ck"


def test_transcribe_flag_merges_transcript(monkeypatch, tmp_path):
    """--transcribe applies the dashboard's caption-merge rule before
    analysis; error-string transcripts are dropped (reference
    forensics_dashboard.py:160-162). Off by default (the reference CLI
    never transcribes)."""
    from misinfo_tpu.serve import transcript as T

    monkeypatch.setattr(T, "extract_transcript",
                        lambda p: "spoken words" if p else "")
    rc = cli.main(["--text", "caption", "--video", "/tmp/v.mp4",
                   "--transcribe", "--quiet"])
    assert rc == 0
    kind, kw = _StubEngine.instances[-1].calls[-1]
    assert kind == "analyze"
    assert kw["text"] == "caption\n\nspoken words"

    # default: no transcription, text passes through untouched
    cli.main(["--text", "caption", "--video", "/tmp/v.mp4", "--quiet"])
    _, kw2 = _StubEngine.instances[-1].calls[-1]
    assert kw2["text"] == "caption"

    # error transcript → dropped
    monkeypatch.setattr(T, "extract_transcript",
                        lambda p: "[transcript error: boom]")
    cli.main(["--text", "caption", "--video", "/tmp/v.mp4",
              "--transcribe", "--quiet"])
    _, kw3 = _StubEngine.instances[-1].calls[-1]
    assert kw3["text"] == "caption"

    # batch path: each request's video merges into its text
    monkeypatch.setattr(T, "extract_transcript",
                        lambda p: "heard" if p else "")
    bf = tmp_path / "reqs.jsonl"
    bf.write_text(json.dumps({"text": "a", "video": "/tmp/v.mp4"}) + "\n"
                  + json.dumps({"text": "b"}) + "\n")
    cli.main(["--batch-file", str(bf), "--transcribe", "--quiet"])
    kind, reqs = _StubEngine.instances[-1].calls[-1]
    assert kind == "analyze_stream"
    assert reqs[0]["text"] == "a\n\nheard"
    assert reqs[1]["text"] == "b"
