"""InceptionV3 feature head for published-comparable FID, in pure JAX.

The reference instantiates torchmetrics ``FrechetInceptionDistance(feature=64)``
(`scripts/image_causaldae_test.py:38`), whose feature extractor is
pytorch-fid's InceptionV3 tapped after the first max-pool (64 channels; the
192 tap is one conv block later). Those first blocks are bitwise the
torchvision InceptionV3 stem — BasicConv2d = bias-free Conv + BatchNorm
(eps=1e-3) + ReLU — so a published-comparable FID needs only five convs, not
the full Mixed tower. This module implements exactly that head in JAX
(NHWC, MXU-friendly convs) and ports the weights from a local torch state
dict (torchvision ``inception_v3`` or pytorch-fid FID-weights layout — the
stem keys are identical). No torchvision dependency: ``torch.load`` is the
only torch use, and only at load time.

Input contract (pytorch-fid `inception.py` resize_input+normalize_input):
images in [0, 1], bilinear-resized to 299x299 with half-pixel centers
(= torch ``align_corners=False``), then scaled to [-1, 1]. Feature parity
vs a torch-functional reference on random weights is test-pinned
(`tests/test_inception_fid.py`).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["FEATURE_TAPS", "load_inception_head", "inception_features",
           "head_feature_fn"]

# conv name -> (stride, padding); order matters. Taps: feature=64 after
# maxpool following Conv2d_2b_3x3, feature=192 after maxpool following
# Conv2d_4a_3x3 (pytorch-fid InceptionV3.BLOCK_INDEX_BY_DIM {64: 0, 192: 1}).
_STEM = (
    ("Conv2d_1a_3x3", 2, "VALID"),
    ("Conv2d_2a_3x3", 1, "VALID"),
    ("Conv2d_2b_3x3", 1, "SAME"),
)
_BLOCK1 = (
    ("Conv2d_3b_1x1", 1, "VALID"),
    ("Conv2d_4a_3x3", 1, "VALID"),
)
FEATURE_TAPS = (64, 192)


def load_inception_head(weights_path: str, feature: int = 64) -> Dict[str, Any]:
    """Port the needed conv/BN subset of an InceptionV3 torch state dict.

    Accepts either layout with these keys present:
    ``<block>.conv.weight`` ([Cout, Cin, kH, kW] -> HWIO) and
    ``<block>.bn.{weight,bias,running_mean,running_var}``. Raises KeyError
    with the missing key name on anything else — fail loud, a silently
    partial port would produce a meaningless FID.
    """
    if feature not in FEATURE_TAPS:
        raise ValueError(f"feature={feature}: this head taps {FEATURE_TAPS}")
    import torch

    sd = torch.load(weights_path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):  # a whole pickled module
        sd = sd.state_dict()
    names = [n for n, _, _ in _STEM] + (
        [n for n, _, _ in _BLOCK1] if feature == 192 else [])
    params: Dict[str, Any] = {}
    for name in names:
        params[name] = {
            "kernel": jnp.asarray(
                np.transpose(sd[f"{name}.conv.weight"].numpy(), (2, 3, 1, 0))),
            "scale": jnp.asarray(sd[f"{name}.bn.weight"].numpy()),
            "bias": jnp.asarray(sd[f"{name}.bn.bias"].numpy()),
            "mean": jnp.asarray(sd[f"{name}.bn.running_mean"].numpy()),
            "var": jnp.asarray(sd[f"{name}.bn.running_var"].numpy()),
        }
    params["__feature__"] = feature
    return params


def _conv_bn_relu(x: jnp.ndarray, p: Dict[str, jnp.ndarray], stride: int,
                  padding: str) -> jnp.ndarray:
    x = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # inference BatchNorm, torchvision BasicConv2d eps
    x = (x - p["mean"]) * jax.lax.rsqrt(p["var"] + 1e-3) * p["scale"] + p["bias"]
    return jax.nn.relu(x)


def _maxpool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


@functools.partial(jax.jit, static_argnames=("feature", "resize"))
def inception_features(params: Dict[str, Any], images: jnp.ndarray,
                       feature: int = 64, resize: bool = True) -> jnp.ndarray:
    """[B, H, W, C(1|3)] images in [0, 1] -> [B, feature] pool features."""
    x = images.astype(jnp.float32)
    if resize:
        # torch F.interpolate(mode='bilinear', align_corners=False) is
        # half-pixel-center linear resize == jax.image.resize 'bilinear'.
        # Resize BEFORE the grayscale->RGB repeat: bilinear is channelwise,
        # so this is identical math at 1/3 the interpolation work.
        x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[-1]),
                             "bilinear")
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
    x = x * 2.0 - 1.0  # pytorch-fid normalize_input: (0,1) -> (-1,1)
    for name, stride, padding in _STEM:
        x = _conv_bn_relu(x, params[name], stride, padding)
    x = _maxpool_3x3_s2(x)
    if feature == 192:
        for name, stride, padding in _BLOCK1:
            x = _conv_bn_relu(x, params[name], stride, padding)
        x = _maxpool_3x3_s2(x)
    return jnp.mean(x, axis=(1, 2))  # adaptive_avg_pool2d to (1, 1)


def head_feature_fn(params: Dict[str, Any], batch_size: int = 64):
    """numpy [B,H,W,C] in [0,1] -> numpy [B, feature], for evals.quality.FID."""
    feature = int(params["__feature__"])

    def fn(images: np.ndarray) -> np.ndarray:
        out = []
        for i in range(0, len(images), batch_size):
            xb = jnp.asarray(np.asarray(images[i:i + batch_size], np.float32))
            out.append(np.asarray(inception_features(params, xb, feature=feature)))
        return np.concatenate(out, axis=0)

    return fn
