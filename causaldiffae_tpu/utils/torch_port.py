"""Import/export reference PyTorch checkpoints to/from the flax model.

Import: converts a torch ``state_dict`` from the reference `UNetModel`
(`improved_diffusion/unet.py:279-664`) into this framework's flax variables
(params + batch_stats), so users can migrate trained reference checkpoints
(``model*.pt`` / ``ema_checkpoint.pt``, `train_util.py:319-345`) without
retraining. Also the backbone of the torch-parity tests.

Export: the exact inverse (`export_torch_state_dict`) — writes trained flax
variables back out under the reference's state_dict keys, so models trained
HERE load into the reference's torch code (migration works both ways).
Roundtrip identity is test-pinned in ``tests/test_torch_parity.py``.

Layout conversions:
- Linear:   torch (out, in)        -> kernel (in, out)          [transpose]
- Conv2d:   torch (out, in, kh, kw)-> kernel (kh, kw, in, out)  [NCHW->NHWC]
- Conv1d k=1 (attention qkv/proj)  -> dense kernel (in, out)
- Encoder fc_mu/fc_var: input dim is the flattened trunk output, which is
  C-major in torch (B,C,H,W flatten) but HWC-major here - the weight's input
  dimension is permuted accordingly.
- Per-variable SCM MLPs: the reference's ModuleDict of n separate 2-layer
  MLPs (`nn.py:261-264`) stack into (n, in, out) einsum weights.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

__all__ = ["torch_state_dict_to_numpy", "port_torch_state_dict",
           "load_torch_checkpoint", "export_torch_state_dict",
           "save_torch_checkpoint", "port_classifier_state_dict",
           "load_torch_classifier", "export_classifier_state_dict",
           "save_torch_classifier"]


def torch_state_dict_to_numpy(state_dict: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Detach a torch state_dict to plain float32 numpy arrays."""
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _linear(sd, prefix):
    return {"kernel": sd[f"{prefix}.weight"].T.astype(np.float32),
            "bias": sd[f"{prefix}.bias"].astype(np.float32)}


def _conv2d(sd, prefix):
    return {"kernel": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0).astype(np.float32),
            "bias": sd[f"{prefix}.bias"].astype(np.float32)}


def _conv1d_as_dense(sd, prefix):
    w = sd[f"{prefix}.weight"]  # (out, in, 1)
    return {"kernel": w[:, :, 0].T.astype(np.float32),
            "bias": sd[f"{prefix}.bias"].astype(np.float32)}


def _norm(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"].astype(np.float32),
            "bias": sd[f"{prefix}.bias"].astype(np.float32)}


def _flatten_perm_linear(sd, prefix, channels, spatial):
    """Linear over torch C-major flatten -> HWC-major flatten."""
    w = sd[f"{prefix}.weight"]  # (out, C*H*W)
    out_dim = w.shape[0]
    w = w.reshape(out_dim, channels, spatial, spatial)        # (out, C, H, W)
    w = w.transpose(0, 2, 3, 1).reshape(out_dim, -1)          # (out, H*W*C)
    return {"kernel": w.T.astype(np.float32),
            "bias": sd[f"{prefix}.bias"].astype(np.float32)}


def _resblock(sd, prefix, has_skip):
    p = {
        "GroupNorm32_0": _norm(sd, f"{prefix}.in_layers.0"),
        "Conv3x3_0": {"Conv_0": _conv2d(sd, f"{prefix}.in_layers.2")},
        "DenseT_0": {"Dense_0": _linear(sd, f"{prefix}.emb_layers.1")},
        "GroupNorm32_1": _norm(sd, f"{prefix}.out_layers.0"),
        "Conv3x3_1": {"Conv_0": _conv2d(sd, f"{prefix}.out_layers.3")},
    }
    if has_skip:
        w = sd[f"{prefix}.skip_connection.weight"]
        name = "Conv1x1_0" if w.shape[2] == 1 else "Conv3x3_2"
        p[name] = {"Conv_0": _conv2d(sd, f"{prefix}.skip_connection")}
    return p


def _attention(sd, prefix):
    return {
        "GroupNorm32_0": _norm(sd, f"{prefix}.norm"),
        "DenseT_0": {"Dense_0": _conv1d_as_dense(sd, f"{prefix}.qkv")},
        "DenseT_1": {"Dense_0": _conv1d_as_dense(sd, f"{prefix}.proj_out")},
    }


def _unet_walk(cfg):
    """Yield ``(flax_prefix, torch_prefix, kinds)`` over the UNet stacks.

    The single source of truth for the block topology (input/middle/output
    ModuleLists and the ``ds`` bookkeeping that gates attention/up/down
    blocks) — mirrors `CausalUNet.setup` and the reference's ModuleList
    construction (`improved_diffusion/unet.py:331-436`). Consumed by BOTH
    the import walk (`port_torch_state_dict`) and the export walk
    (`export_torch_state_dict`) so the two can never drift.
    """
    attention_ds = cfg.attention_ds
    channel_mult = cfg.channel_mult

    yield "input_blocks_0", "input_blocks.0", ["conv"]
    idx = 1
    ds = 1
    for level in range(len(channel_mult)):
        for _ in range(cfg.num_res_blocks):
            kinds = ["res"] + (["attn"] if ds in attention_ds else [])
            yield f"input_blocks_{idx}", f"input_blocks.{idx}", kinds
            idx += 1
        if level != len(channel_mult) - 1:
            yield f"input_blocks_{idx}", f"input_blocks.{idx}", ["down"]
            idx += 1
            ds *= 2

    yield "middle_blocks", "middle_block", ["res", "attn", "res"]

    idx = 0
    for level in range(len(channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            kinds = ["res"]
            if ds in attention_ds:
                kinds.append("attn")
            if level and i == cfg.num_res_blocks:
                kinds.append("up")
                ds //= 2
            yield f"output_blocks_{idx}", f"output_blocks.{idx}", kinds
            idx += 1


def _port_conv_trunk(sd, prefix: str, image_size: int):
    """Port a Conv-BN-LeakyReLU stride-2 stack (`nn.py:38-58` / `:146-156`)
    to `models.encoder.ConvTrunk` params + batch_stats. Returns
    (params, batch_stats, final_channels, final_spatial) — the latter two
    feed the flatten-permutation of any head linear over the trunk output."""
    trunk_p: Dict[str, Any] = {}
    trunk_s: Dict[str, Any] = {}
    i = 0
    ch = None
    while f"{prefix}.{i}.0.weight" in sd:
        trunk_p[f"Conv3x3_{i}"] = {"Conv_0": _conv2d(sd, f"{prefix}.{i}.0")}
        trunk_p[f"BatchNorm_{i}"] = _norm(sd, f"{prefix}.{i}.1")
        trunk_s[f"BatchNorm_{i}"] = {
            "mean": sd[f"{prefix}.{i}.1.running_mean"].astype(np.float32),
            "var": sd[f"{prefix}.{i}.1.running_var"].astype(np.float32),
        }
        ch = sd[f"{prefix}.{i}.0.weight"].shape[0]
        i += 1
    if ch is None:
        raise KeyError(f"no conv trunk found under '{prefix}.'")
    final_spatial = image_size
    for _ in range(i):
        final_spatial = (final_spatial + 1) // 2  # k3 s2 p1 conv out size
    return trunk_p, trunk_s, ch, final_spatial


def port_classifier_state_dict(sd: Mapping[str, np.ndarray],
                               image_size: int) -> Dict[str, Any]:
    """Port a reference anti-causal classifier state_dict
    (`GaussianConvEncoderClf`, `nn.py:115-220`; saved by its trainers as
    `classifier_<factor>_best.pth`) to flax variables for
    `models.encoder.GaussianConvEncoderClf`. The torch module's fc_mu/fc_var
    heads are dead weight in its forward (`nn.py:214-220`) and are dropped."""
    trunk_p, trunk_s, ch, spatial = _port_conv_trunk(sd, "encoder", image_size)
    return {
        "params": {"trunk": trunk_p,
                   "fc": {"Dense_0": _flatten_perm_linear(sd, "fc", ch, spatial)}},
        "batch_stats": {"trunk": trunk_s},
    }


def load_torch_classifier(path: str, image_size: int) -> Dict[str, Any]:
    """Load a reference ``classifier_*_best.pth`` into flax variables."""
    import torch

    sd = torch.load(path, map_location="cpu")
    return port_classifier_state_dict(torch_state_dict_to_numpy(sd), image_size)


def port_torch_state_dict(cfg, sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Build flax variables {params, batch_stats} from a reference state_dict.

    ``cfg`` is a `causaldiffae_tpu.config.Config`; the UNet topology is
    re-derived exactly like `CausalUNet.setup` so block indices line up with
    the reference's ModuleList indices.
    """
    sd = dict(sd)
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    params["time_dense1"] = {"Dense_0": _linear(sd, "time_embed.0")}
    params["time_dense2"] = {"Dense_0": _linear(sd, "time_embed.2")}
    if "label_emb.weight" in sd:
        params["label_emb"] = {"embedding": sd["label_emb.weight"].astype(np.float32)}
    if "c_emb.0.weight" in sd:
        params["c_dense1"] = {"Dense_0": _linear(sd, "c_emb.0")}
        params["c_dense2"] = {"Dense_0": _linear(sd, "c_emb.2")}

    if "rep_emb.fc_mu.weight" in sd:
        trunk_p, trunk_s, ch, final_spatial = _port_conv_trunk(
            sd, "rep_emb.encoder", cfg.image_size)
        params["rep_emb"] = {
            "trunk": trunk_p,
            "fc_mu": {"Dense_0": _flatten_perm_linear(sd, "rep_emb.fc_mu", ch, final_spatial)},
            "fc_var": {"Dense_0": _flatten_perm_linear(sd, "rep_emb.fc_var", ch, final_spatial)},
        }
        batch_stats["rep_emb"] = {"trunk": trunk_s}
        params["up_emb"] = {"Dense_0": _linear(sd, "up_emb")}

    if "causal_mask.nonlinearities.0.net.0.weight" in sd:
        n = cfg.n_vars
        w1 = np.stack([sd[f"causal_mask.nonlinearities.{i}.net.0.weight"].T for i in range(n)])
        b1 = np.stack([sd[f"causal_mask.nonlinearities.{i}.net.0.bias"] for i in range(n)])
        w2 = np.stack([sd[f"causal_mask.nonlinearities.{i}.net.2.weight"].T for i in range(n)])
        b2 = np.stack([sd[f"causal_mask.nonlinearities.{i}.net.2.bias"] for i in range(n)])
        params["causal_mask"] = {"nonlinearities": {
            "w1": w1.astype(np.float32), "b1": b1.astype(np.float32),
            "w2": w2.astype(np.float32), "b2": b2.astype(np.float32),
        }}
        if "causal_mask.A" in sd:
            params["causal_mask"]["A"] = sd["causal_mask.A"].astype(np.float32)

    if "causal_flow.s_cond.0.weight" in sd:
        def mlp(prefix):
            return {
                "Dense_0": _linear(sd, f"{prefix}.0"),
                "Dense_1": _linear(sd, f"{prefix}.2"),
                "Dense_2": _linear(sd, f"{prefix}.4"),
            }
        params["causal_flow"] = {
            "s_cond": mlp("causal_flow.s_cond"),
            "t_cond": mlp("causal_flow.t_cond"),
        }

    # --- UNet stacks: shared topology walk (see `_unet_walk`) --- #
    for flax_prefix, torch_prefix, kinds in _unet_walk(cfg):
        for j, kind in enumerate(kinds):
            tp = f"{torch_prefix}.{j}"
            if kind == "conv":
                params[f"{flax_prefix}_{j}"] = {"Conv_0": _conv2d(sd, tp)}
            elif kind == "res":
                has_skip = f"{tp}.skip_connection.weight" in sd
                params[f"{flax_prefix}_{j}"] = _resblock(sd, tp, has_skip)
            elif kind == "attn":
                params[f"{flax_prefix}_{j}"] = _attention(sd, tp)
            elif kind == "down":
                params[f"{flax_prefix}_{j}"] = {"Conv3x3_0": {"Conv_0": _conv2d(sd, f"{tp}.op")}}
            elif kind == "up":
                params[f"{flax_prefix}_{j}"] = {"Conv3x3_0": {"Conv_0": _conv2d(sd, f"{tp}.conv")}}

    params["out_norm"] = _norm(sd, "out.0")
    params["out_conv"] = {"Conv_0": _conv2d(sd, "out.2")}

    variables: Dict[str, Any] = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return variables


def load_torch_checkpoint(cfg, path: str) -> Dict[str, Any]:
    """Load a reference ``model*.pt`` / ``ema_checkpoint.pt`` into flax variables."""
    import torch

    sd = torch.load(path, map_location="cpu")
    return port_torch_state_dict(cfg, torch_state_dict_to_numpy(sd))


# --------------------------- export (flax -> torch) ----------------------- #

def _np(x):
    return np.asarray(x, dtype=np.float32)


def _ex_linear(out, prefix, p):
    out[f"{prefix}.weight"] = _np(p["kernel"]).T
    out[f"{prefix}.bias"] = _np(p["bias"])


def _ex_conv2d(out, prefix, p):
    out[f"{prefix}.weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1)
    out[f"{prefix}.bias"] = _np(p["bias"])


def _ex_conv1d_from_dense(out, prefix, p):
    out[f"{prefix}.weight"] = _np(p["kernel"]).T[:, :, None]
    out[f"{prefix}.bias"] = _np(p["bias"])


def _ex_norm(out, prefix, p):
    out[f"{prefix}.weight"] = _np(p["scale"])
    out[f"{prefix}.bias"] = _np(p["bias"])


def _ex_flatten_perm_linear(out, prefix, p, channels, spatial):
    """Inverse of `_flatten_perm_linear`: HWC-major flatten -> torch C-major."""
    w = _np(p["kernel"]).T                                    # (out, H*W*C)
    out_dim = w.shape[0]
    w = w.reshape(out_dim, spatial, spatial, channels)        # (out, H, W, C)
    out[f"{prefix}.weight"] = w.transpose(0, 3, 1, 2).reshape(out_dim, -1)
    out[f"{prefix}.bias"] = _np(p["bias"])


def _ex_resblock(out, prefix, p):
    _ex_norm(out, f"{prefix}.in_layers.0", p["GroupNorm32_0"])
    _ex_conv2d(out, f"{prefix}.in_layers.2", p["Conv3x3_0"]["Conv_0"])
    _ex_linear(out, f"{prefix}.emb_layers.1", p["DenseT_0"]["Dense_0"])
    _ex_norm(out, f"{prefix}.out_layers.0", p["GroupNorm32_1"])
    _ex_conv2d(out, f"{prefix}.out_layers.3", p["Conv3x3_1"]["Conv_0"])
    for skip in ("Conv1x1_0", "Conv3x3_2"):
        if skip in p:
            _ex_conv2d(out, f"{prefix}.skip_connection", p[skip]["Conv_0"])


def _ex_attention(out, prefix, p):
    _ex_norm(out, f"{prefix}.norm", p["GroupNorm32_0"])
    _ex_conv1d_from_dense(out, f"{prefix}.qkv", p["DenseT_0"]["Dense_0"])
    _ex_conv1d_from_dense(out, f"{prefix}.proj_out", p["DenseT_1"]["Dense_0"])


def export_torch_state_dict(cfg, variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Write flax variables back out under the reference's state_dict keys.

    The exact inverse of `port_torch_state_dict`: a model trained here loads
    into the reference's torch `UNetModel` (`improved_diffusion/unet.py:279`)
    via ``model.load_state_dict({k: torch.from_numpy(v) ...})``. BatchNorm
    ``num_batches_tracked`` counters (torch bookkeeping with no flax
    counterpart) are emitted as 0 — torch only consults them under
    ``momentum=None``, which the reference encoder never uses
    (`nn.py:229-244`).
    """
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}

    _ex_linear(sd, "time_embed.0", params["time_dense1"]["Dense_0"])
    _ex_linear(sd, "time_embed.2", params["time_dense2"]["Dense_0"])
    if "label_emb" in params:
        sd["label_emb.weight"] = _np(params["label_emb"]["embedding"])
    if "c_dense1" in params:
        _ex_linear(sd, "c_emb.0", params["c_dense1"]["Dense_0"])
        _ex_linear(sd, "c_emb.2", params["c_dense2"]["Dense_0"])

    if "rep_emb" in params:
        trunk_p = params["rep_emb"]["trunk"]
        trunk_s = batch_stats["rep_emb"]["trunk"]
        n_convs = sum(1 for k in trunk_p if k.startswith("Conv3x3_"))
        ch = None
        for i in range(n_convs):
            _ex_conv2d(sd, f"rep_emb.encoder.{i}.0", trunk_p[f"Conv3x3_{i}"]["Conv_0"])
            _ex_norm(sd, f"rep_emb.encoder.{i}.1", trunk_p[f"BatchNorm_{i}"])
            s = trunk_s[f"BatchNorm_{i}"]
            sd[f"rep_emb.encoder.{i}.1.running_mean"] = _np(s["mean"])
            sd[f"rep_emb.encoder.{i}.1.running_var"] = _np(s["var"])
            sd[f"rep_emb.encoder.{i}.1.num_batches_tracked"] = np.asarray(0, dtype=np.int64)
            ch = sd[f"rep_emb.encoder.{i}.0.weight"].shape[0]
        final_spatial = cfg.image_size
        for _ in range(n_convs):
            final_spatial = (final_spatial + 1) // 2
        _ex_flatten_perm_linear(sd, "rep_emb.fc_mu",
                                params["rep_emb"]["fc_mu"]["Dense_0"], ch, final_spatial)
        _ex_flatten_perm_linear(sd, "rep_emb.fc_var",
                                params["rep_emb"]["fc_var"]["Dense_0"], ch, final_spatial)
        _ex_linear(sd, "up_emb", params["up_emb"]["Dense_0"])

    if "causal_mask" in params:
        nl = params["causal_mask"]["nonlinearities"]
        for i in range(cfg.n_vars):
            sd[f"causal_mask.nonlinearities.{i}.net.0.weight"] = _np(nl["w1"][i]).T
            sd[f"causal_mask.nonlinearities.{i}.net.0.bias"] = _np(nl["b1"][i])
            sd[f"causal_mask.nonlinearities.{i}.net.2.weight"] = _np(nl["w2"][i]).T
            sd[f"causal_mask.nonlinearities.{i}.net.2.bias"] = _np(nl["b2"][i])
        if "A" in params["causal_mask"]:
            sd["causal_mask.A"] = _np(params["causal_mask"]["A"])

    if "causal_flow" in params:
        for name in ("s_cond", "t_cond"):
            mlp = params["causal_flow"][name]
            for j, dense in ((0, "Dense_0"), (2, "Dense_1"), (4, "Dense_2")):
                _ex_linear(sd, f"causal_flow.{name}.{j}", mlp[dense])

    # --- UNet stacks: the SAME shared topology walk as the import --- #
    for flax_prefix, torch_prefix, kinds in _unet_walk(cfg):
        for j, kind in enumerate(kinds):
            tp = f"{torch_prefix}.{j}"
            p = params[f"{flax_prefix}_{j}"]
            if kind == "conv":
                _ex_conv2d(sd, tp, p["Conv_0"])
            elif kind == "res":
                _ex_resblock(sd, tp, p)
            elif kind == "attn":
                _ex_attention(sd, tp, p)
            elif kind == "down":
                _ex_conv2d(sd, f"{tp}.op", p["Conv3x3_0"]["Conv_0"])
            elif kind == "up":
                _ex_conv2d(sd, f"{tp}.conv", p["Conv3x3_0"]["Conv_0"])

    _ex_norm(sd, "out.0", params["out_norm"])
    _ex_conv2d(sd, "out.2", params["out_conv"]["Conv_0"])
    return sd


def save_torch_checkpoint(cfg, variables: Mapping[str, Any], path: str) -> None:
    """Save flax variables as a reference-loadable ``model*.pt`` file."""
    import torch

    sd = export_torch_state_dict(cfg, variables)
    # copy=True: jax buffers surface as non-writable numpy views
    torch.save({k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()}, path)


def export_classifier_state_dict(variables: Mapping[str, Any],
                                 latent_dim: int = 512) -> Dict[str, np.ndarray]:
    """Inverse of `port_classifier_state_dict`: write a flax
    `models.encoder.GaussianConvEncoderClf` back out under the reference's
    torch `GaussianConvEncoderClf` state_dict keys (`nn.py:115-220`), so
    probes trained HERE satisfy the reference eval scripts'
    ``clf.load_state_dict(th.load('classifier_<factor>_best.pth'))``
    (`image_causaldae_test.py:134-141`).

    The torch module's ``fc_mu``/``fc_var`` heads are dead weight in its
    ``forward`` (`nn.py:214-220`) and have no flax counterpart; strict
    loading still requires the keys, so they are emitted as zeros with the
    reference trainers' ``latent_dim`` (512, `classifiers.py:114-119`).
    """
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    trunk_p = params["trunk"]
    trunk_s = batch_stats["trunk"]
    sd: Dict[str, np.ndarray] = {}
    n_convs = sum(1 for k in trunk_p if k.startswith("Conv3x3_"))
    ch = None
    for i in range(n_convs):
        _ex_conv2d(sd, f"encoder.{i}.0", trunk_p[f"Conv3x3_{i}"]["Conv_0"])
        _ex_norm(sd, f"encoder.{i}.1", trunk_p[f"BatchNorm_{i}"])
        s = trunk_s[f"BatchNorm_{i}"]
        sd[f"encoder.{i}.1.running_mean"] = _np(s["mean"])
        sd[f"encoder.{i}.1.running_var"] = _np(s["var"])
        sd[f"encoder.{i}.1.num_batches_tracked"] = np.asarray(0, dtype=np.int64)
        ch = sd[f"encoder.{i}.0.weight"].shape[0]
    # the head reads the flattened trunk output; recover the spatial extent
    # from the Dense input dim instead of asking for image_size
    fc_p = params["fc"]["Dense_0"]
    flat = np.asarray(fc_p["kernel"]).shape[0]
    spatial = int(round((flat // ch) ** 0.5))
    assert spatial * spatial * ch == flat, (flat, ch)
    _ex_flatten_perm_linear(sd, "fc", fc_p, ch, spatial)
    for head in ("fc_mu", "fc_var"):
        sd[f"{head}.weight"] = np.zeros((latent_dim, flat), dtype=np.float32)
        sd[f"{head}.bias"] = np.zeros((latent_dim,), dtype=np.float32)
    return sd


def save_torch_classifier(variables: Mapping[str, Any], path: str,
                          latent_dim: int = 512) -> None:
    """Save a flax probe as a reference-loadable ``classifier_*_best.pth``."""
    import torch

    sd = export_classifier_state_dict(variables, latent_dim=latent_dim)
    torch.save({k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()}, path)
