"""Direct tests of the explanation generator (C9): rule cascade precedence
and thresholds (reference misinfo_forensics.py:742-765), Gemini prompt
structure (:631-693), and the Explainer's soft-fail contract (:725-740).
Previously only covered indirectly through engine e2e reports."""

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
