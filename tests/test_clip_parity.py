"""Cross-framework parity: our JAX CLIP dual tower vs HF torch CLIPModel
(random-init, identical weights injected — SURVEY.md §7 parity strategy)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

from misinfo_tpu.core.config import PrecisionConfig
from misinfo_tpu.ops.common import Policy, l2_normalize
from misinfo_tpu.models.clip import (
    ClipConfig, clip_init, clip_text_features, clip_image_features, clip_similarity,
)
from misinfo_tpu.checkpoints.torch_convert import convert_clip, apply_updates

F32 = Policy(PrecisionConfig.highest())
TINY = ClipConfig.tiny()


@pytest.fixture(scope="module")
def hf_clip():
    from transformers import CLIPConfig as HFClipConfig, CLIPModel
    from transformers import CLIPTextConfig, CLIPVisionConfig

    text_cfg = CLIPTextConfig(
        vocab_size=TINY.vocab_size, hidden_size=TINY.text_width,
        num_hidden_layers=TINY.text_layers, num_attention_heads=TINY.text_heads,
        intermediate_size=TINY.text_mlp, max_position_embeddings=TINY.max_text_len,
        eos_token_id=TINY.eos_token_id, bos_token_id=TINY.eos_token_id - 1,
        pad_token_id=None,
    )
    vis_cfg = CLIPVisionConfig(
        hidden_size=TINY.vision_width, num_hidden_layers=TINY.vision_layers,
        num_attention_heads=TINY.vision_heads, intermediate_size=TINY.vision_mlp,
        image_size=TINY.image_size, patch_size=TINY.patch_size,
    )
    cfg = HFClipConfig.from_text_vision_configs(text_cfg, vis_cfg,
                                                projection_dim=TINY.projection_dim)
    torch.manual_seed(0)
    model = CLIPModel(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def jax_params(hf_clip):
    params = clip_init(jax.random.PRNGKey(0), TINY)
    updates = convert_clip(hf_clip.state_dict(), "", TINY.text_layers,
                           TINY.vision_layers)
    applied, skipped = apply_updates(params, updates)
    assert not [s for s in skipped if "shape" in s[1]], skipped
    assert applied > 20
    return params


def _text_batch(B=3, S=None):
    S = S or TINY.max_text_len
    rng = np.random.default_rng(7)
    ids = rng.integers(1, TINY.vocab_size - 2, size=(B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    lengths = [S, S - 3, 5][:B]
    for b, L in enumerate(lengths):
        ids[b, L - 1:] = TINY.eos_token_id  # eos then eos-padding
        mask[b, L:] = 0
    ids[:, 0] = TINY.eos_token_id - 1  # sot
    return ids, mask


def _images(B=2):
    rng = np.random.default_rng(8)
    return rng.normal(size=(B, TINY.image_size, TINY.image_size, 3)).astype(np.float32)


def test_text_tower_parity(hf_clip, jax_params):
    ids, mask = _text_batch()
    with torch.no_grad():
        ref = hf_clip.get_text_features(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long)).numpy()
    ours = np.asarray(clip_text_features(jax_params, ids, mask, TINY, F32))
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=0)


def test_vision_tower_parity(hf_clip, jax_params):
    imgs = _images()
    with torch.no_grad():
        ref = hf_clip.get_image_features(
            pixel_values=torch.tensor(imgs.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(clip_image_features(jax_params, imgs, TINY, F32))
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=0)


def test_cosine_similarity_matches_reference_formula(hf_clip, jax_params):
    """Reference analyze_consistency: normalize both, dot product
    (misinfo_forensics.py:394-404)."""
    ids, mask = _text_batch(B=2)
    imgs = _images(B=2)
    sim, te, ie = clip_similarity(jax_params, ids, mask, imgs, TINY, F32)
    sim = np.asarray(sim)
    with torch.no_grad():
        t = hf_clip.get_text_features(input_ids=torch.tensor(ids, dtype=torch.long),
                                      attention_mask=torch.tensor(mask, dtype=torch.long))
        v = hf_clip.get_image_features(pixel_values=torch.tensor(imgs.transpose(0, 3, 1, 2)))
        t = t / t.norm(dim=-1, keepdim=True)
        v = v / v.norm(dim=-1, keepdim=True)
        ref_sim = (t * v).sum(-1).numpy()
    np.testing.assert_allclose(sim, ref_sim, atol=1e-3, rtol=0)
    assert np.all(sim >= -1.001) and np.all(sim <= 1.001)
