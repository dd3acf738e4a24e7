"""Parity tests for the published-comparable FID path (`evals/inception.py`).

The reference's FID is torchmetrics ``FrechetInceptionDistance(feature=64)``
(`image_causaldae_test.py:38`) — pytorch-fid's InceptionV3 tapped after the
first max-pool, whose layers up to that tap are the plain torchvision stem
(bias-free conv + BatchNorm eps=1e-3 + ReLU). torchvision isn't in this
environment, so the torch reference here is built from ``torch.nn.functional``
primitives directly — that IS the stem's math, and random weights pin the
port exactly as VERDICT r3 item 6 prescribed.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from causaldiffae_tpu.evals.inception import (
    _BLOCK1, _STEM, inception_features, load_inception_head)

_SHAPES = {
    "Conv2d_1a_3x3": (32, 3, 3, 3),
    "Conv2d_2a_3x3": (32, 32, 3, 3),
    "Conv2d_2b_3x3": (64, 32, 3, 3),
    "Conv2d_3b_1x1": (80, 64, 1, 1),
    "Conv2d_4a_3x3": (192, 80, 3, 3),
}
_PADDING = {"VALID": 0, "SAME": 1}


def _random_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}
    for name, (co, ci, kh, kw) in _SHAPES.items():
        sd[f"{name}.conv.weight"] = torch.randn(co, ci, kh, kw, generator=g) * 0.1
        sd[f"{name}.bn.weight"] = torch.rand(co, generator=g) + 0.5
        sd[f"{name}.bn.bias"] = torch.randn(co, generator=g) * 0.1
        sd[f"{name}.bn.running_mean"] = torch.randn(co, generator=g) * 0.1
        sd[f"{name}.bn.running_var"] = torch.rand(co, generator=g) + 0.5
    return sd


def _torch_head(sd, x_nchw, feature):
    """The pytorch-fid head in torch.nn.functional primitives (eval mode)."""
    import torch.nn.functional as F

    def block(x, name, stride, padding):
        x = F.conv2d(x, sd[f"{name}.conv.weight"], stride=stride,
                     padding=_PADDING[padding])
        x = F.batch_norm(x, sd[f"{name}.bn.running_mean"],
                         sd[f"{name}.bn.running_var"],
                         sd[f"{name}.bn.weight"], sd[f"{name}.bn.bias"],
                         training=False, eps=1e-3)
        return F.relu(x)

    x = x_nchw
    for name, stride, padding in _STEM:
        x = block(x, name, stride, padding)
    x = F.max_pool2d(x, kernel_size=3, stride=2)
    if feature == 192:
        for name, stride, padding in _BLOCK1:
            x = block(x, name, stride, padding)
        x = F.max_pool2d(x, kernel_size=3, stride=2)
    return F.adaptive_avg_pool2d(x, (1, 1)).flatten(1)


@pytest.mark.parametrize("feature", [64, 192])
def test_head_feature_parity_random_weights(tmp_path, feature):
    sd = _random_state_dict()
    path = tmp_path / "inception_random.pt"
    torch.save(sd, str(path))
    params = load_inception_head(str(path), feature=feature)

    # feed 75x75 directly (resize=False isolates the conv/BN/pool math;
    # the resize contract is pinned separately below)
    rng = np.random.RandomState(1)
    imgs = rng.rand(3, 75, 75, 3).astype(np.float32)
    got = np.asarray(inception_features(params, jnp.asarray(imgs),
                                        feature=feature, resize=False))
    with torch.no_grad():
        x = torch.from_numpy(imgs.transpose(0, 3, 1, 2)) * 2.0 - 1.0
        want = _torch_head(sd, x, feature).numpy()
    assert got.shape == (3, feature)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_resize_matches_torch_interpolate():
    """jax.image.resize 'bilinear' == torch F.interpolate align_corners=False
    (both half-pixel-center linear) — the preprocessing the published FID
    numbers assume."""
    import torch.nn.functional as F

    import jax

    rng = np.random.RandomState(2)
    imgs = rng.rand(2, 28, 28, 3).astype(np.float32)
    got = np.asarray(jax.image.resize(
        jnp.asarray(imgs), (2, 299, 299, 3), "bilinear"))
    with torch.no_grad():
        want = F.interpolate(torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
                             size=(299, 299), mode="bilinear",
                             align_corners=False).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_grayscale_and_quality_wiring(tmp_path):
    """1-channel input is repeated to RGB; evals.quality.inception_feature_fn
    + FID run end to end on the ported head; missing weights fail loud."""
    from causaldiffae_tpu.evals.quality import FID, inception_feature_fn

    sd = _random_state_dict(seed=3)
    path = tmp_path / "w.pt"
    torch.save(sd, str(path))
    fn = inception_feature_fn(str(path), batch_size=2, feature=64)

    rng = np.random.RandomState(4)
    real = rng.rand(4, 28, 28, 1).astype(np.float32)
    fake = np.clip(real + 0.3 * rng.rand(4, 28, 28, 1).astype(np.float32), 0, 1)
    fid = FID(feature_fn=fn)
    fid.update(real, real=True)
    fid.update(fake, real=False)
    d = fid.compute()
    assert np.isfinite(d) and d > 0

    with pytest.raises(RuntimeError, match="weights"):
        inception_feature_fn(None)


def test_missing_key_fails_loud(tmp_path):
    sd = _random_state_dict()
    del sd["Conv2d_2b_3x3.bn.running_var"]
    path = tmp_path / "broken.pt"
    torch.save(sd, str(path))
    with pytest.raises(KeyError, match="Conv2d_2b_3x3"):
        load_inception_head(str(path), feature=64)
