"""int8 quantized inference for the serving tier.

TPU MXUs run s8×s8→s32 contractions at twice the bf16 rate (and int8
weights quarter the parameter HBM traffic), so the standard serving
optimization is post-training quantization:

- **weights**: symmetric per-output-channel int8 (scale = max|w|/127 per
  output feature), PRE-BAKED into the params tree (``quantize_params``:
  kernel → int8 array + ``kernel_scale``) — jax.export serializes program
  constants before any XLA folding, so pre-baking is what actually makes
  the artifact carry int8 weights (~4× smaller blob) instead of f32 weights
  plus rounding ops;
- **activations**: dynamic symmetric per-SAMPLE int8 (scale from each
  sample's own max|x| — one cheap reduce), the robust choice when no
  calibration set is wired in; per-sample means batch composition and
  engine padding cannot perturb a sample's logits;
- **accumulation**: int32 via ``preferred_element_type``, dequantized with
  the product of both scales, bias added in float32.

Rather than re-implementing each model's forward, ``quantized_apply``
intercepts every ``nn.Conv``/``nn.Dense`` call (flax ``intercept_methods``)
and swaps in the int8 kernel — so PolicyCNN, DualStreamCNN and
BranchedCILPolicy all quantize without model changes, and future layers
inherit the path automatically. Everything else (pools, reshapes, relu,
softmax) stays float and fuses around the int8 contractions.

The reference has no quantization story (torch fp32 end to end).
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn
from jax import lax


def _quant_dynamic(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric PER-SAMPLE int8: returns (q, scale (B,1,…)) with
    x ≈ q * scale. Per-sample (not per-tensor) scales make a sample's
    logits independent of its batchmates — so engine padding and batch
    composition cannot perturb results — and track each image's own
    dynamic range."""
    x = x.astype(jnp.float32)
    axes = tuple(range(1, x.ndim))
    scale = jnp.maximum(jnp.max(jnp.abs(x), axis=axes, keepdims=True),
                        1e-8) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _quant_kernel(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 over the last (output) axis."""
    w = w.astype(jnp.float32)
    axes = tuple(range(w.ndim - 1))
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=axes), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale  # scale: (out_features,)


def _pair(v) -> tuple:
    if isinstance(v, int):
        return (v, v)
    return tuple(v)


def quantize_params(params: Any) -> Any:
    """Pre-bake int8 weights: every ``kernel`` leaf (ndim ≥ 2) becomes an
    int8 array with a sibling ``kernel_scale`` (per-output-channel f32).
    Only for models whose contractions are all Conv/Dense (every policy
    family here) — other kernel-bearing layers would receive int8 weights
    they can't use. Biases and non-kernel leaves pass through."""
    from collections.abc import Mapping

    def walk(node):
        if isinstance(node, Mapping):
            out = {}
            for k, v in node.items():
                if k == "kernel" and hasattr(v, "ndim") and v.ndim >= 2:
                    q, s = _quant_kernel(jnp.asarray(v))
                    out["kernel"] = q
                    out["kernel_scale"] = s
                else:
                    out[k] = walk(v)
            return out
        return node

    return walk(params)


def _weights(params) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(int8 kernel, per-channel scale) — pre-baked if present, else
    quantized on the fly from the float kernel."""
    kernel = params["kernel"]
    if kernel.dtype == jnp.int8:
        return kernel, params["kernel_scale"]
    return _quant_kernel(kernel)


def _int8_conv(mod: nn.Conv, x: jnp.ndarray) -> jnp.ndarray:
    params = mod.variables["params"]
    xq, sx = _quant_dynamic(x)
    kq, sw = _weights(params)  # HWIO
    y = lax.conv_general_dilated(
        xq, kq,
        window_strides=_pair(mod.strides or 1),
        padding=mod.padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (sx * sw)
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y


def _int8_dense(mod: nn.Dense, x: jnp.ndarray) -> jnp.ndarray:
    params = mod.variables["params"]
    xq, sx = _quant_dynamic(x)
    kq, sw = _weights(params)  # (in, out)
    y = lax.dot_general(xq, kq, (((x.ndim - 1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (sx * sw)
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y


def _dilation_is_one(d) -> bool:
    if d is None:
        return True
    if isinstance(d, int):
        return d == 1
    return all(x == 1 for x in d)


def _conv_supported(mod: nn.Conv) -> bool:
    """Only the configurations _int8_conv actually implements: plain
    strided convs with string padding, no dilation, no groups. Anything
    else falls through to the float path rather than computing a silently
    different conv."""
    return (isinstance(mod.padding, str)
            and mod.padding in ("SAME", "VALID")
            and _dilation_is_one(mod.kernel_dilation)
            and _dilation_is_one(mod.input_dilation)
            and mod.feature_group_count == 1)


def _interceptor(next_fun, args, kwargs, context):
    mod = context.module
    if context.method_name == "__call__":
        if type(mod) is nn.Conv:
            if _conv_supported(mod):
                return _int8_conv(mod, args[0])
            if mod.variables["params"]["kernel"].dtype == jnp.int8:
                raise ValueError(
                    f"{mod.name}: Conv configuration unsupported by the int8 "
                    "path (dilation/groups/non-string padding) but its kernel "
                    "was pre-baked to int8 — don't use quantize_params on "
                    "this model")
        if type(mod) is nn.Dense:
            return _int8_dense(mod, args[0])
    return next_fun(*args, **kwargs)


def quantized_apply(model: Any, params: Any, *inputs) -> jnp.ndarray:
    """Run ``model`` with every Conv/Dense in int8 (weights per-channel,
    activations dynamic per-tensor, int32 accumulate). Drop-in replacement
    for ``model.apply({'params': params}, *inputs)`` at inference."""
    with nn.intercept_methods(_interceptor):
        return model.apply({"params": params}, *inputs)


def make_quantized_policy(model: Any, params: Any) -> Callable:
    """``fn(frames_u8) -> logits`` with the /255 fused in — same contract as
    the float serving path (serving/export.py), int8 compute inside.
    Weights are pre-baked (``quantize_params``) so an export of this
    function serializes int8 constants (~4× smaller artifact)."""
    qparams = quantize_params(params)

    def infer(frames_u8: jnp.ndarray) -> jnp.ndarray:
        obs = frames_u8.astype(jnp.float32) * (1.0 / 255.0)
        return quantized_apply(model, qparams, obs)

    return infer
