"""The CausalDiffAE UNet denoiser (flax.linen, NHWC, bf16-capable torso).

Rebuild of reference `improved_diffusion/unet.py:279-688` with the same
topology (input/middle/output stacks, skip concat, attention at configured
downsample ratios, zero-init output conv) but restructured for JAX:

- The reference's 5-tuple mega-forward (`unet.py:525-632`) is split into
  composable methods sharing one parameter tree:
    * ``denoise(x_t, t, y, c, z)`` -> eps   (the sampling-time contract)
    * ``encode(x_start)`` -> (mu, var)       (semantic encoder)
    * ``causalize(mu)`` -> z_post            (SCM masking + per-var MLPs)
    * ``__call__(x_t, t, y, c, x_start)`` -> (eps, aux) - the full training
      forward: encode -> causal mask -> reparameterize -> classifier-free
      mask -> denoise, returning aux = {mu, var, z_post, mask} for the
      representation KL.
- RNG is explicit flax rng streams: 'reparam' (latent sampling,
  reference `nn.py:460-467`), 'cfmask' (Bernoulli keep-mask,
  `unet.py:599-612`), 'dropout'.
- Semantics quirks preserved: softplus'd encoder variance used directly,
  train-time reparameterization variance ``var * 1e-3`` (`unet.py:592`),
  keep-prob 0.5 masking gating both z and z_post, flow-based path's
  ``mask = -mean(log_det)`` (`unet.py:580-587`).
- Adjacency is injected via config (static tuple) instead of being hardcoded
  in the forward (`unet.py:572-578`).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import AttentionBlock
from .encoder import GaussianConvEncoder
from .layers import (
    Conv3x3,
    DenseT,
    Downsample,
    GroupNorm32,
    ResBlock,
    Upsample,
    silu,
    timestep_embedding,
)
from .scm import CausalModeling, MultivariateCausalFlow

Dtype = Any


def reparameterize(rng: jax.Array, m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """z = m + sqrt(v) * eps (reference `nn.py:460-467`)."""
    return m + jnp.sqrt(v) * jax.random.normal(rng, m.shape, dtype=m.dtype)


class CausalUNet(nn.Module):
    """UNet + causal representation conditioning."""

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Tuple[int, ...]
    dropout: float = 0.0
    channel_mult: Tuple[int, ...] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    c_dim: Optional[int] = None
    rep_dim: Optional[int] = None
    causal_modeling: bool = False
    flow_based: bool = False
    num_heads: int = 1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    masking: bool = False
    n_vars: int = 4
    adjacency: Optional[Tuple[Tuple[float, ...], ...]] = None
    learn_adjacency: bool = False
    drop_prob: float = 0.5
    reparam_var_scale: float = 1e-3
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    use_remat: bool = False

    def setup(self):
        ted = self.model_channels * 4
        heads_up = self.num_heads if self.num_heads_upsample == -1 else self.num_heads_upsample
        # gradient checkpointing: rematerialize each ResBlock's activations in
        # the backward pass (replaces the reference's CheckpointFunction,
        # nn.py:572-618, via jax.checkpoint through flax's lifted remat)
        # static_argnums counts flax's internal scope arg: (scope, x, emb, train)
        res_cls = nn.remat(ResBlock, static_argnums=(3,)) if self.use_remat else ResBlock

        self.time_dense1 = DenseT(ted, dtype=jnp.float32)
        self.time_dense2 = DenseT(ted, dtype=jnp.float32)
        if self.num_classes is not None:
            self.label_emb = nn.Embed(self.num_classes, ted)
        if self.c_dim is not None:
            self.c_dense1 = DenseT(256, dtype=jnp.float32)
            self.c_dense2 = DenseT(ted, dtype=jnp.float32)
        if self.rep_dim is not None:
            self.rep_emb = GaussianConvEncoder(
                latent_dim=self.rep_dim, num_vars=self.n_vars, dtype=self.dtype
            )
            self.up_emb = DenseT(ted, dtype=jnp.float32)
        if self.causal_modeling and not self.flow_based:
            self.causal_mask = CausalModeling(
                latent_dim=self.rep_dim,
                num_var=self.n_vars,
                adjacency=self.adjacency,
                learn_adjacency=self.learn_adjacency,
            )
        if self.flow_based:
            self.causal_flow = MultivariateCausalFlow(
                dim=self.n_vars, k=self.rep_dim // self.n_vars
            )

        def res(ch_in, ch_out):
            return res_cls(
                channels=ch_in,
                emb_channels=ted,
                dropout=self.dropout,
                out_channels=ch_out,
                use_scale_shift_norm=self.use_scale_shift_norm,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
            )

        def attn(ch, heads):
            return AttentionBlock(
                channels=ch, num_heads=heads, use_pallas=self.use_pallas, dtype=self.dtype
            )

        # Input (downsampling) stacks - reference `unet.py:388-433`.
        input_blocks = [[Conv3x3(self.model_channels, dtype=self.dtype)]]
        input_block_chans = [self.model_channels]
        ch = self.model_channels
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                layers = [res(ch, mult * self.model_channels)]
                ch = mult * self.model_channels
                if ds in self.attention_resolutions:
                    layers.append(attn(ch, self.num_heads))
                input_blocks.append(layers)
                input_block_chans.append(ch)
            if level != len(self.channel_mult) - 1:
                input_blocks.append([Downsample(ch, self.conv_resample, dtype=self.dtype)])
                input_block_chans.append(ch)
                ds *= 2
        self.input_blocks = input_blocks

        # Middle - reference `unet.py:438-456`.
        self.middle_blocks = [res(ch, None), attn(ch, self.num_heads), res(ch, None)]

        # Output (upsampling) stacks with skip concat - reference `unet.py:462-491`.
        output_blocks = []
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                layers = [res(ch + input_block_chans.pop(), self.model_channels * mult)]
                ch = self.model_channels * mult
                if ds in self.attention_resolutions:
                    layers.append(attn(ch, heads_up))
                if level and i == self.num_res_blocks:
                    layers.append(Upsample(ch, self.conv_resample, dtype=self.dtype))
                    ds //= 2
                output_blocks.append(layers)
        self.output_blocks = output_blocks

        self.out_norm = GroupNorm32()
        self.out_conv = Conv3x3(self.out_channels, zero_init=True, dtype=jnp.float32)

    # ------------------------------------------------------------------ #
    def _apply_seq(self, modules, h, emb, train):
        for m in modules:
            # ResBlocks (possibly remat-wrapped, so no isinstance) take
            # (x, emb, train); AttentionBlocks take (x, train) so the Pallas
            # kernel can be train-gated; Up/Downsample take (x)
            if hasattr(m, "emb_channels"):
                h = m(h, emb, train)
            elif hasattr(m, "num_heads"):
                h = m(h, train)
            else:
                h = m(h)
        return h

    def _embed(self, t, y, c, z):
        """Summed conditioning embedding (reference `unet.py:545-617`)."""
        emb = self.time_dense2(
            silu(self.time_dense1(timestep_embedding(t, self.model_channels)))
        )
        assert (y is not None) == (self.num_classes is not None), (
            "must specify y iff the model is class-conditional"
        )
        if self.num_classes is not None:
            emb = emb + self.label_emb(y)
        if self.c_dim is not None:
            emb = emb + self.c_dense2(silu(self.c_dense1(c)))
        if z is not None:
            emb = emb + self.up_emb(z.astype(jnp.float32))
        return emb

    # ------------------------------------------------------------------ #
    def denoise(self, x, t, y=None, c=None, z=None, *, train: bool = False):
        """eps prediction given explicit conditioning (sampling contract)."""
        emb = self._embed(t, y, c, z).astype(self.dtype)
        h = x.astype(self.dtype)
        hs = []
        for blocks in self.input_blocks:
            h = self._apply_seq(blocks, h, emb, train)
            hs.append(h)
        h = self._apply_seq(self.middle_blocks, h, emb, train)
        for blocks in self.output_blocks:
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = self._apply_seq(blocks, h, emb, train)
        h = h.astype(x.dtype)
        return self.out_conv(self.out_norm(h, silu_after=True))

    def encode(self, x_start, *, train: bool = False):
        """Semantic encoder q(u|x0) -> (mu, var)."""
        return self.rep_emb.encode(x_start.astype(self.dtype), train=train)

    def causalize(self, mu):
        """SCM pass u -> z_post (masking + per-var MLPs + add-back-noise)."""
        return self.causal_mask(mu)

    def encode_and_causalize(self, x_start, *, train: bool = False, sample: bool = True):
        """Full latent path used by counterfactual eval: encode, SCM, sample z.

        At eval the reference fixes the reparameterization variance to 1e-3
        (`image_causaldae_test.py:406`); with ``sample=False`` returns z_post
        deterministically.
        """
        mu, var = self.encode(x_start, train=train)
        z_post = self.causalize(mu) if self.causal_modeling else mu
        if not sample:
            return mu, var, z_post, z_post
        v = jnp.full_like(z_post, self.reparam_var_scale)
        z = reparameterize(self.make_rng("reparam"), z_post, v)
        return mu, var, z_post, z

    # ------------------------------------------------------------------ #
    def __call__(self, x, t, y=None, c=None, x_start=None, z=None, *, train: bool = False):
        """Training forward (reference `unet.py:525-632`): returns (eps, aux)."""
        aux = {}
        if self.rep_dim is not None and z is None:
            mu, var = self.encode(x_start, train=train)
            mask = None
            if self.causal_modeling:
                if self.flow_based:
                    A = jnp.asarray(self.adjacency, dtype=jnp.float32)
                    C = jnp.eye(A.shape[0], dtype=jnp.float32) - A
                    z_post, _ = self.causal_flow.flow(mu, C)
                    log_det, _ = self.causal_flow.reverse(z_post, C)
                    mask = -jnp.mean(log_det)
                else:
                    z_post = self.causalize(mu)
                z = reparameterize(
                    self.make_rng("reparam"), z_post, var * self.reparam_var_scale
                )
            else:
                z = reparameterize(
                    self.make_rng("reparam"), mu, var * self.reparam_var_scale
                )
                z_post = None
            if self.masking:
                keep = jax.random.bernoulli(
                    self.make_rng("cfmask"), p=1.0 - self.drop_prob, shape=(z.shape[0],)
                ).astype(jnp.float32)
                z = z * keep[:, None]
                if z_post is not None:
                    z_post = z_post * keep[:, None]
                mask = keep
            aux = {"mu": mu, "var": var, "z_post": z_post, "mask": mask}
        eps = self.denoise(x, t, y=y, c=c, z=z, train=train)
        return eps, aux

    # ------------------------------------------------------------------ #
    def feature_vectors(self, x, t, y=None):
        """All intermediate activations (reference `unet.py:634-664`)."""
        emb = self._embed(t, y, None, None).astype(self.dtype)
        h = x.astype(self.dtype)
        hs = []
        result = {"down": [], "up": []}
        for blocks in self.input_blocks:
            h = self._apply_seq(blocks, h, emb, False)
            hs.append(h)
            result["down"].append(h.astype(x.dtype))
        h = self._apply_seq(self.middle_blocks, h, emb, False)
        result["middle"] = h.astype(x.dtype)
        for blocks in self.output_blocks:
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = self._apply_seq(blocks, h, emb, False)
            result["up"].append(h.astype(x.dtype))
        return result


class SuperResUNet(nn.Module):
    """Super-resolution variant: conditions on a bilinear-upsampled low-res
    image concatenated on channels (reference `unet.py:667-688`).
    """

    unet: CausalUNet

    def __call__(self, x, t, low_res=None, *, train: bool = False, **kwargs):
        B, H, W, _ = x.shape
        up = jax.image.resize(
            low_res, (B, H, W, low_res.shape[-1]), method="bilinear"
        )
        return self.unet(jnp.concatenate([x, up], axis=-1), t, train=train, **kwargs)
