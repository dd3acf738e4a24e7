"""Import reference PyTorch checkpoints into the flax model.

Converts a torch ``state_dict`` from the reference `UNetModel`
(`improved_diffusion/unet.py:279-664`) into this framework's flax variables
(params + batch_stats), so users can migrate trained reference checkpoints
(``model*.pt`` / ``ema_checkpoint.pt``, `train_util.py:319-345`) without
retraining. Also the backbone of the torch-parity tests.

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

__all__ = ["torch_state_dict_to_numpy", "port_torch_state_dict", "load_torch_checkpoint"]


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
        trunk_p: Dict[str, Any] = {}
        trunk_s: Dict[str, Any] = {}
        i = 0
        ch = None
        while f"rep_emb.encoder.{i}.0.weight" in sd:
            trunk_p[f"Conv3x3_{i}"] = {"Conv_0": _conv2d(sd, f"rep_emb.encoder.{i}.0")}
            trunk_p[f"BatchNorm_{i}"] = _norm(sd, f"rep_emb.encoder.{i}.1")
            trunk_s[f"BatchNorm_{i}"] = {
                "mean": sd[f"rep_emb.encoder.{i}.1.running_mean"].astype(np.float32),
                "var": sd[f"rep_emb.encoder.{i}.1.running_var"].astype(np.float32),
            }
            ch = sd[f"rep_emb.encoder.{i}.0.weight"].shape[0]
            i += 1
        n_convs = i
        final_spatial = cfg.image_size
        for _ in range(n_convs):
            final_spatial = (final_spatial + 1) // 2
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

    # --- UNet stacks: re-derive the block layout (must mirror setup()) --- #
    def port_seq(flax_prefix, torch_prefix, kinds, out):
        for j, kind in enumerate(kinds):
            tp = f"{torch_prefix}.{j}"
            if kind == "conv":
                out[f"{flax_prefix}_{j}"] = {"Conv_0": _conv2d(sd, tp)}
            elif kind.startswith("res"):
                has_skip = f"{tp}.skip_connection.weight" in sd
                out[f"{flax_prefix}_{j}"] = _resblock(sd, tp, has_skip)
            elif kind == "attn":
                out[f"{flax_prefix}_{j}"] = _attention(sd, tp)
            elif kind == "down":
                out[f"{flax_prefix}_{j}"] = {"Conv3x3_0": {"Conv_0": _conv2d(sd, f"{tp}.op")}}
            elif kind == "up":
                out[f"{flax_prefix}_{j}"] = {"Conv3x3_0": {"Conv_0": _conv2d(sd, f"{tp}.conv")}}

    attention_ds = cfg.attention_ds
    channel_mult = cfg.channel_mult

    # input blocks
    port_seq("input_blocks_0", "input_blocks.0", ["conv"], params)
    idx = 1
    ds = 1
    for level, mult in enumerate(channel_mult):
        for _ in range(cfg.num_res_blocks):
            kinds = ["res"] + (["attn"] if ds in attention_ds else [])
            port_seq(f"input_blocks_{idx}", f"input_blocks.{idx}", kinds, params)
            idx += 1
        if level != len(channel_mult) - 1:
            port_seq(f"input_blocks_{idx}", f"input_blocks.{idx}", ["down"], params)
            idx += 1
            ds *= 2

    # middle: flax names are flat middle_blocks_{j}
    mid = {}
    port_seq("middle_blocks", "middle_block", ["res", "attn", "res"], mid)
    params.update(mid)

    # output blocks
    idx = 0
    for level, mult in list(enumerate(channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            kinds = ["res"]
            if ds in attention_ds:
                kinds.append("attn")
            if level and i == cfg.num_res_blocks:
                kinds.append("up")
                ds //= 2
            port_seq(f"output_blocks_{idx}", f"output_blocks.{idx}", kinds, params)
            idx += 1

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
