"""Direct tests of the explanation generator (C9): rule cascade precedence
and thresholds (reference misinfo_forensics.py:742-765), Gemini prompt
structure (:631-693), and the Explainer's soft-fail contract (:725-740).
Previously only covered indirectly through engine e2e reports."""

import pytest

from misinfo_tpu.engine.explain import (Explainer, build_llm_prompt,
                                        rule_based_explanation)

MATCH = [{"title": "Original Guardian story", "similarity": 0.91,
          "date": "2024-01-01"}]


def _scores(**kw):
    base = dict(verdict=1, confidence=0.8, real_probability=0.2,
                fake_probability=0.8, ai_score=0.1, misinfo_score=0.1,
                deepfake_score=0.1, clip_similarity=0.5,
                vault_discrepancy=0.0)
    base.update(kw)
    return base


def test_cascade_precedence_order():
    """vault > deepfake > ai > misinfo > clip-low > generic — first match
    wins even when later rules would also fire (reference :742-765)."""
    s = _scores(vault_discrepancy=0.9, deepfake_score=0.9, ai_score=0.9,
                misinfo_score=0.9, clip_similarity=-0.5)
    assert "previously published" in rule_based_explanation(s, MATCH)
    s["vault_discrepancy"] = 0.0
    assert "digital manipulation" in rule_based_explanation(s, MATCH)
    s["deepfake_score"] = 0.1
    assert "AI-generated" in rule_based_explanation(s, MATCH)
    s["ai_score"] = 0.1
    assert "misinformation" in rule_based_explanation(s, MATCH)
    s["misinfo_score"] = 0.1
    assert "poor alignment" in rule_based_explanation(s, MATCH)
    s["clip_similarity"] = 0.5
    out = rule_based_explanation(s, MATCH)
    assert "Multiple signals" in out and "80.0%" in out


def test_cascade_thresholds_are_strict():
    """Rules fire strictly above 0.7 (below 0.3 for clip) — boundary values
    fall through, exactly like the reference's `>`/`<` comparisons."""
    s = _scores(vault_discrepancy=0.7, deepfake_score=0.7, ai_score=0.7,
                misinfo_score=0.7, clip_similarity=0.3)
    assert "Multiple signals" in rule_based_explanation(s, MATCH)


def test_vault_rule_needs_matches():
    """High vault discrepancy without match metadata cannot cite a title —
    the cascade falls through (reference indexes vault_matches[0])."""
    s = _scores(vault_discrepancy=0.9)
    assert "previously published" not in rule_based_explanation(s, [])


def test_verdict_text_real():
    s = _scores(verdict=0)
    assert rule_based_explanation(s, []).startswith(
        "This content is classified as REAL")


def test_prompt_includes_scores_and_vault_block():
    """The analyst prompt embeds the numeric signals verbatim and appends
    the Truth Vault section only above the 0.5 prompt gate (:683)."""
    s = _scores(vault_discrepancy=0.9, text_similarity=0.42)
    p = build_llm_prompt(s, MATCH)
    assert "Verdict: FAKE" in p
    assert "80.0%" in p                      # confidence
    assert "Original Guardian story" in p    # vault block fired
    assert "Text Similarity Score: 42.00%" in p
    low = build_llm_prompt(_scores(vault_discrepancy=0.2), MATCH)
    assert "Truth Vault Cross-Check" not in low


def test_explainer_falls_back_without_key():
    """No API key → rule-based text, never an exception (reference
    :707-709)."""
    ex = Explainer(api_key=None)
    assert not ex.available
    out = ex.explain(_scores(), [])
    assert out.startswith("This content is classified as")


# ---------------------------------------------------------------------------
# VERDICT r2 #5: Gemini error-class observability — the reference classifies
# auth/quota/timeout failures with operator guidance
# (misinfo_forensics.py:725-740); ours additionally feeds per-class counters
# into the tracer so /metrics distinguishes a bad key from a quota blip.
# ---------------------------------------------------------------------------

from misinfo_tpu.engine.explain import classify_gemini_error
from misinfo_tpu.utils.tracing import Tracer


@pytest.mark.parametrize("msg,cls", [
    ("Invalid API key provided", "auth"),
    ("authentication credentials rejected", "auth"),
    ("429 quota exceeded for model", "quota"),
    ("rate limit hit, slow down", "quota"),
    ("deadline timeout after 60s", "timeout"),
    ("connection reset by peer", "other"),
])
def test_classify_gemini_error(msg, cls):
    assert classify_gemini_error(RuntimeError(msg)) == cls


class _FailingModel:
    def __init__(self, exc):
        self.exc = exc

    def generate_content(self, prompt):
        raise self.exc


class _EmptyModel:
    def generate_content(self, prompt):
        class R:
            text = ""
        return R()


class _OkModel:
    def generate_content(self, prompt):
        class R:
            text = "  ### Verdict\nLLM report.  "
        return R()


def _armed_explainer(model, tracer):
    ex = Explainer(api_key=None, tracer=tracer)
    ex.available = True       # simulate a configured key
    ex._model = model
    return ex


def test_explainer_counts_error_classes_separately():
    tr = Tracer()
    ex = _armed_explainer(_FailingModel(RuntimeError("bad API key")), tr)
    out = ex.explain(_scores(), [])
    assert out.startswith("This content is classified as")   # fell back
    assert tr.counters["gemini_error_auth_count"] == 1
    assert ex.last_error["class"] == "auth"
    assert "GOOGLE_API_KEY" in ex.last_error["hint"]

    ex._model = _FailingModel(RuntimeError("quota exhausted"))
    ex.explain(_scores(), [])
    assert tr.counters["gemini_error_quota_count"] == 1
    assert tr.counters["gemini_error_auth_count"] == 1   # distinct counters
    assert ex.last_error["class"] == "quota"

    ex._model = _FailingModel(TimeoutError("request timeout"))
    ex.explain(_scores(), [])
    assert tr.counters["gemini_error_timeout_count"] == 1


def test_explainer_empty_response_counted_and_falls_back():
    tr = Tracer()
    ex = _armed_explainer(_EmptyModel(), tr)
    out = ex.explain(_scores(), [])
    assert out.startswith("This content is classified as")
    assert tr.counters["gemini_error_empty_count"] == 1
    assert ex.last_error["class"] == "empty"


def test_explainer_success_counted_and_stripped():
    tr = Tracer()
    ex = _armed_explainer(_OkModel(), tr)
    out = ex.explain(_scores(), [])
    assert out == "### Verdict\nLLM report."
    assert tr.counters["gemini_ok_count"] == 1
    assert ex.last_error is None


def test_error_classes_logged_as_structured_warnings(caplog):
    import logging

    tr = Tracer()
    ex = _armed_explainer(_FailingModel(RuntimeError("quota exceeded")), tr)
    with caplog.at_level(logging.WARNING, logger="misinfo_tpu.explain"):
        ex.explain(_scores(), [])
    assert any("[quota]" in r.getMessage() for r in caplog.records)
