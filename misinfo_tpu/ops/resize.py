"""On-device image resize: PIL-faithful antialiased resampling as MXU matmuls.

The reference resizes every image twice on the host CPU — torchvision
`Resize((224,224))` bilinear for the EfficientNet branch (reference
misinfo_forensics.py:249-253) and CLIPProcessor's shortest-edge-bicubic +
center-crop for the CLIP towers (invoked at reference :386). On a serving
host that costs ~6 ms/image single-core (docs/PERF.md) — ~6× the device's
full-verdict cost — so the host, not the TPU, caps throughput.

PIL's convolution resampler is a SEPARABLE weighted sum: one horizontal
pass then one vertical pass, each a small dense contraction. That is
exactly an MXU shape. This module synthesizes the per-image filter
weights ON DEVICE from four scalars per flavor (scale/offset per axis)
and applies them as two batched matmuls, so the host ships ONE padded
uint8 frame per image (`preprocess/image.py::stage_image_batch`) and the
fused signal program derives both 224×224 flavors itself.

Faithfulness (vs the cv2 fast path this replaces, which approximates):
  * identical tap geometry to PIL — center ``(o + off + 0.5)·scale``,
    filterscale ``max(scale, 1)``, window clamped to the valid extent and
    renormalized (PIL ImagingResampleHorizontal semantics);
  * same filters — triangle (support 1) for bilinear, Keys cubic a=-0.5
    (support 2) for bicubic;
  * same pass order (horizontal → vertical) INCLUDING PIL's uint8
    rounding of the intermediate image between passes;
  * same round-half-up uint8 quantization (PIL's fixed-point
    ``(ss + (1<<21)) >> 22`` is floor(x+0.5));
  * the CLIP center crop folds into the weights as an output-grid offset
    (crop commutes with separable resampling — it is an index
    restriction of the output grid).
Residual divergence vs PIL is the f32-vs-fixed-point accumulator at exact
rounding ties — measured ≤1 uint8 level on a vanishing pixel fraction
(tests/test_device_resize.py).

All math here is f32 with ``Precision.HIGHEST`` regardless of the serving
policy: preprocessing must produce the same pixels in bf16-serving and
f32-parity modes, and the contraction is a negligible ~0.1% of the
full-modality program's FLOPs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# resize_params row layout (preprocess/image.py::resize_param_row):
#   [h, w, eff_scale_v, eff_scale_h, clip_scale_v, clip_off_v,
#    clip_scale_h, clip_off_h]
PARAM_FIELDS = 8


def _keys_cubic(t: jnp.ndarray) -> jnp.ndarray:
    """Keys bicubic kernel, a = -0.5 (PIL's bicubic_filter)."""
    w1 = (1.5 * t - 2.5) * t * t + 1.0
    w2 = ((-0.5 * t + 2.5) * t - 4.0) * t + 2.0
    return jnp.where(t <= 1.0, w1, jnp.where(t < 2.0, w2, 0.0))


def _axis_weights(out_size: int, staged: int, extent, scale, offset,
                  kind: str) -> jnp.ndarray:
    """Per-image separable filter plane ``[B, out_size, staged]``.

    ``extent``/``scale``/``offset`` are [B] f32: the valid source length
    inside the staged buffer, the in/out scale, and the output-grid offset
    (0 for a plain resize; the crop origin for the folded center crop).
    """
    o = jnp.arange(out_size, dtype=jnp.float32)
    i = jnp.arange(staged, dtype=jnp.float32)
    center = (o[None, :] + offset[:, None] + 0.5) * scale[:, None]  # [B,O]
    fscale = jnp.maximum(scale, 1.0)[:, None, None]                 # [B,1,1]
    x = jnp.abs(i[None, None, :] + 0.5 - center[:, :, None]) / fscale
    w = jnp.maximum(0.0, 1.0 - x) if kind == "bilinear" else _keys_cubic(x)
    w = w * (i[None, None, :] < extent[:, None, None])
    return w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)


def _round_u8(x: jnp.ndarray) -> jnp.ndarray:
    """PIL clip8: clamp + round-half-up (fixed-point ``+0.5`` then floor)."""
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)


def _resample(x_f32: jnp.ndarray, wv: jnp.ndarray, wh: jnp.ndarray
              ) -> jnp.ndarray:
    """Horizontal then vertical pass with PIL's uint8 intermediate."""
    hi = jnp.einsum("bhwc,bpw->bhpc", x_f32, wh,
                    precision=jax.lax.Precision.HIGHEST)
    hi = _round_u8(hi)
    out = jnp.einsum("bhpc,boh->bopc", hi, wv,
                     precision=jax.lax.Precision.HIGHEST)
    return _round_u8(out).astype(jnp.uint8)


def device_resize_pair(staged_u8: jnp.ndarray, params: jnp.ndarray,
                       out_size: int = 224):
    """Staged frames → (effnet_u8, clip_u8), both ``[B, out, out, 3]``.

    ``staged_u8`` is ``[B, S_h, S_w, 3]`` uint8 with each image in the
    top-left corner and zero padding elsewhere; ``params`` is ``[B, 8]``
    f32 (see PARAM_FIELDS). The effnet flavor is the torchvision
    ``Resize((224,224))`` bilinear squash; the clip flavor is HF
    CLIPProcessor's shortest-edge-224 bicubic + center crop with the crop
    folded into the weight planes.
    """
    B, sh, sw = staged_u8.shape[0], staged_u8.shape[1], staged_u8.shape[2]
    del B
    x = staged_u8.astype(jnp.float32)
    h, w = params[:, 0], params[:, 1]
    zero = jnp.zeros_like(h)
    eff = _resample(
        x,
        _axis_weights(out_size, sh, h, params[:, 2], zero, "bilinear"),
        _axis_weights(out_size, sw, w, params[:, 3], zero, "bilinear"))
    clp = _resample(
        x,
        _axis_weights(out_size, sh, h, params[:, 4], params[:, 5], "bicubic"),
        _axis_weights(out_size, sw, w, params[:, 6], params[:, 7], "bicubic"))
    return eff, clp
