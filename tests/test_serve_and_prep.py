"""Host-side serving & prep components: dashboard score mapping (C14),
transcript soft-fail contract (C13), dataset harmonizer/fusion prep
(C22/C24/C25), guardian HTML extraction (C23)."""

import json
import os

import numpy as np
import pytest


# ------------------------------------------------------------- dashboard

def test_probs_label_gating():
    from misinfo_tpu.serve.dashboard import probs_label

    lbl = probs_label(0.73, "Deepfake", "Authentic")
    assert lbl["Deepfake"] == pytest.approx(0.73)
    assert lbl["Authentic"] == pytest.approx(0.27)
    na = probs_label(None, "Deepfake", "Authentic")
    assert "N/A (modality not provided)" in na


def test_clip_similarity_ui_mapping():
    """[-1,1] → [0,1] via (s+1)/2 (reference forensics_dashboard.py:222-223)."""
    from misinfo_tpu.serve.dashboard import normalize_clip_similarity

    assert normalize_clip_similarity(-1.0) == 0.0
    assert normalize_clip_similarity(0.0) == 0.5
    assert normalize_clip_similarity(1.0) == 1.0


def test_verdict_badge_html():
    from misinfo_tpu.serve.dashboard import verdict_badge_html

    html = verdict_badge_html("FAKE", 0.87)
    assert "FAKE" in html and "87.0%" in html
    assert "#d93025" in html  # red for fake
    assert "#188038" in verdict_badge_html("REAL", 0.6)


def test_vault_gallery_and_metadata(tmp_path):
    """Gallery contract (reference forensics_dashboard.py:228-265): the top
    match's archive image, captioned with the similarity, when its local
    path exists; metadata block carries the >0.85 recontextualization
    warning."""
    from misinfo_tpu.serve.dashboard import vault_gallery_and_metadata

    img = tmp_path / "archive.jpg"
    img.write_bytes(b"\xff\xd8\xff\xe0 fake jpeg")
    scores = {"text_similarity": 0.42}
    matches = [
        {"similarity": 0.91, "title": "Original headline",
         "url": str(img), "date": "2023-05-01"},
        {"similarity": 0.40, "title": "other", "url": "/nope.jpg",
         "date": "N/A"},
    ]
    gallery, md = vault_gallery_and_metadata(matches, scores, True)
    assert gallery == [(str(img), "91.0% Match")]
    assert "Original headline" in md and "91.0%" in md
    assert "different context" in md          # >0.85 warning line
    assert "42.0%" in md                      # text similarity surfaced

    # nonexistent path → empty gallery, metadata still present
    gallery2, md2 = vault_gallery_and_metadata(
        [{"similarity": 0.3, "title": "t", "url": "/gone.jpg",
          "date": "N/A"}], {}, True)
    assert gallery2 == []
    assert "No significant archive matches" in md2

    # modality gating (reference :232-238)
    g3, md3 = vault_gallery_and_metadata([], {}, False)
    assert g3 == [] and "Skipped" in md3
    g4, md4 = vault_gallery_and_metadata([], {}, True)
    assert g4 == [] and "No Archive Matches Found" in md4

    # explicit image_path (native vaults) wins over url
    g5, _ = vault_gallery_and_metadata(
        [{"similarity": 0.9, "title": "t", "url": "https://example.com/a",
          "image_path": str(img), "date": "N/A"}], {}, True)
    assert g5 == [(str(img), "90.0% Match")]


def test_dashboard_predict_contract():
    """predict() is gradio-free (only build_app needs gr): the 11-output
    contract in the reference's order runs on every image."""
    from misinfo_tpu.serve import dashboard as D

    out = D.predict(None, "a plain text claim", None)
    assert len(out) == 11
    badge, verdict, ai, mis, deep, clip, vault, gallery, report_md, \
        vault_md, transcript = out
    assert verdict in ("REAL", "FAKE")
    assert verdict in badge and "confidence" in badge
    assert set(ai) == {"AI-generated", "Human-written"}   # text given
    assert "N/A (modality not provided)" in deep          # no visual given
    assert "N/A (modality not provided)" in clip
    assert "N/A (modality not provided)" in vault
    assert gallery is None or gallery == []
    assert "Forensic report" in report_md
    assert transcript == ""

    # no modality at all → placeholder outputs, engine never invoked
    empty = D.predict(None, "", None)
    assert len(empty) == 11 and empty[1] == "N/A"


def test_dashboard_build_app_gradio():
    """Gradio-gated: build_app constructs the Blocks UI (skips when gradio
    is absent)."""
    pytest.importorskip("gradio")
    from misinfo_tpu.serve import dashboard as D

    app = D.build_app()
    assert app is not None


# ------------------------------------------------------------ transcript

def test_transcript_soft_fail_contract():
    """Without weights/tokenizer the transcriber returns "" (reference
    forensics_dashboard.py:32-34), never raises."""
    from misinfo_tpu.serve.transcript import WhisperTranscriber, extract_transcript

    assert extract_transcript(None) == ""
    t = WhisperTranscriber.__new__(WhisperTranscriber)
    t.has_weights = False
    t.tokenizer = None
    assert t.transcribe("/nonexistent.mp4") == ""


def test_transcript_merge_rule():
    """Transcript merges into the caption unless it is an error string
    (reference forensics_dashboard.py:160-162)."""
    caption, transcript = "caption", "[transcript error: boom]"
    combined = caption
    if transcript and not transcript.startswith("[transcript error"):
        combined = caption + "\n\n" + transcript
    assert combined == "caption"


# ------------------------------------------------------------- data prep

def test_balanced_sample():
    from misinfo_tpu.train.data_prep import balanced_sample

    items = ([{"text": f"r{i}", "label": 0} for i in range(30)]
             + [{"text": f"f{i}", "label": 1} for i in range(50)])
    out = balanced_sample(items, 20, seed=42)
    labels = [it["label"] for it in out]
    assert labels.count(0) == 20 and labels.count(1) == 20
    out2 = balanced_sample(items, 20, seed=42)
    assert [it["text"] for it in out] == [it["text"] for it in out2]


def test_prepare_fusion_dataset(tmp_path):
    import pandas as pd

    from misinfo_tpu.train.data_prep import prepare_fusion_dataset

    clip_csv = tmp_path / "clip_train.csv"
    rows = []
    for i in range(20):
        rows.append({"image_path": f"img{i}.jpg", "text": f"match {i}", "label": 0})
        rows.append({"image_path": f"img{i}.jpg", "text": f"mismatch {i}", "label": 1})
    pd.DataFrame(rows).to_csv(clip_csv, index=False)

    hc3 = tmp_path / "hc3.csv"
    pd.DataFrame([{"text": f"ai {i}", "label": 1} for i in range(10)]
                 + [{"text": f"human {i}", "label": 0} for i in range(10)]
                 ).to_csv(hc3, index=False)

    out_csv = tmp_path / "Final_Fusion_Train.csv"
    df = prepare_fusion_dataset(str(clip_csv), str(hc3), None, str(out_csv),
                                per_source_fake=10, log=lambda *_: None)
    assert os.path.exists(out_csv)
    assert set(df.columns) >= {"text", "image_path", "label"}
    n_fake = int((df["label"] == 1).sum())
    n_real = int((df["label"] == 0).sum())
    assert n_fake > n_real  # 2:1 fake-heavy sampling per source


def test_quick_fusion_prep(tmp_path):
    import pandas as pd

    from misinfo_tpu.train.data_prep import quick_fusion_prep

    src = tmp_path / "clip_train.csv"
    pd.DataFrame([{"image_path": "a.jpg", "text": f"t{i}", "label": i % 2}
                  for i in range(100)]).to_csv(src, index=False)
    df = quick_fusion_prep(str(src), str(tmp_path / "out.csv"), 30,
                           log=lambda *_: None)
    assert len(df) == 30


def test_harmonize_outputs(tmp_path, monkeypatch):
    from misinfo_tpu.train.data_prep import harmonize_datasets

    monkeypatch.chdir(tmp_path)
    out = harmonize_datasets(None, None, None, 10, log=lambda *_: None)
    assert out == []
    assert os.path.exists(tmp_path / "harmonized_train_data.pkl")
    assert os.path.exists(tmp_path / "newscippings_genuine_seed.json")


# ---------------------------------------------------------- guardian prep

HTML = """<html><head>
<meta property="og:title" content="Flood hits coastal town" />
<meta property="og:image" content="https://img.example/photo.jpg" />
</head><body><h1>ignored h1</h1></body></html>"""

HTML_FALLBACK = """<html><head><title>x</title></head>
<body><h1>  Headline from H1  </h1>
<img src="tiny.gif" width="16"/>
<img src="big_photo.jpg" width="640"/>
</body></html>"""


def test_extract_article_og_tags():
    from misinfo_tpu.train.guardian_prep import extract_article

    title, img = extract_article(HTML)
    assert title == "Flood hits coastal town"
    assert img == "https://img.example/photo.jpg"


def test_extract_article_fallbacks():
    from misinfo_tpu.train.guardian_prep import extract_article

    title, img = extract_article(HTML_FALLBACK)
    assert title == "Headline from H1"
    assert img == "big_photo.jpg"  # width>=300 preferred over tiny icon


def test_emit_clip_csvs_leak_free(tmp_path):
    import pandas as pd

    from misinfo_tpu.train.guardian_prep import emit_clip_csvs

    articles = [{"article_id": f"g{i}", "text_content": f"headline {i}",
                 "image_local_path": f"im{i}.jpg", "url": f"u{i}"}
                for i in range(10)]
    tr = str(tmp_path / "clip_train.csv")
    va = str(tmp_path / "clip_val.csv")
    emit_clip_csvs(articles, tr, va, 0.2, log=lambda *_: None)
    train = pd.read_csv(tr)
    val = pd.read_csv(va)
    # 1 matched + 1 mismatched per image
    assert (train["label"] == 0).sum() == (train["label"] == 1).sum()
    # leak-free: no image appears in both splits
    assert not (set(train["image_path"]) & set(val["image_path"]))
    # mismatched pair text differs from the image's own headline
    for _, row in train[train["label"] == 1].iterrows():
        own = row["image_path"].replace("im", "headline ").replace(".jpg", "")
        assert row["text"] != own


def test_fetch_and_save_image_local(tmp_path):
    from PIL import Image

    from misinfo_tpu.train.guardian_prep import fetch_and_save_image

    src = tmp_path / "src.png"
    Image.fromarray(np.zeros((50, 80, 3), np.uint8)).save(src)
    dst = str(tmp_path / "out.jpg")
    assert fetch_and_save_image(str(src), dst, size=224)
    img = Image.open(dst)
    assert img.size == (224, 224)  # LANCZOS resize to 224
    assert not fetch_and_save_image("https://no.network/x.jpg", dst)


def test_dotenv_file_loaded_for_gemini_key(tmp_path, monkeypatch):
    """Reference parity: GOOGLE_API_KEY from a repo-root .env file
    (misinfo_forensics.py:18-19); real env vars win over the file.
    Env handled manually: _load_dotenv writes os.environ behind
    monkeypatch's back, so its restore bookkeeping would leak the
    dotenv value into later tests."""
    import os

    from misinfo_tpu.core.config import ForensicsConfig

    monkeypatch.chdir(tmp_path)
    saved = {k: os.environ.pop(k, None) for k in ("GOOGLE_API_KEY", "OTHER")}
    try:
        (tmp_path / ".env").write_text(
            "# comment\nGOOGLE_API_KEY='from-dotenv'\nOTHER=1\n")
        cfg = ForensicsConfig.from_env(verbose=False)
        assert cfg.gemini_api_key == "from-dotenv"

        os.environ["GOOGLE_API_KEY"] = "from-env"
        cfg = ForensicsConfig.from_env(verbose=False)
        assert cfg.gemini_api_key == "from-env"
    finally:
        for k, v in saved.items():
            os.environ.pop(k, None)
            if v is not None:
                os.environ[k] = v


def test_whisper_asset_verification_layouts(tmp_path):
    """Round-2 review regression: BOTH published whisper vocab layouts must
    verify — multilingual (50258 entries, <|endoftext|> last) and
    English-only GPT-2 (50257, eot at 50256) — while an eot that is not the
    last entry fails (it anchors the whole special block)."""
    import json

    from misinfo_tpu.serve.download import verify_assets

    d = tmp_path / "whisper-base"
    d.mkdir()
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"a{i} b{i}" for i in range(49500)))

    def write_vocab(n, eot_id):
        vocab = {f"t{i}": i for i in range(n) if i != eot_id}
        vocab["<|endoftext|>"] = eot_id
        (d / "vocab.json").write_text(json.dumps(vocab))

    write_vocab(50258, 50257)            # multilingual layout
    ok, problems = verify_assets(str(d))
    assert ok, problems
    write_vocab(50257, 50256)            # English-only GPT-2 layout
    ok, problems = verify_assets(str(d))
    assert ok, problems
    write_vocab(50258, 10)               # eot not last → broken anchor
    ok, problems = verify_assets(str(d))
    assert not ok and any("LAST" in p for p in problems)
