"""causaldiffae_tpu: a TPU-native (JAX/XLA/Pallas) causal diffusion
autoencoder framework.

Standalone rebuild of the capabilities of the CausalDiffAE reference
(Causal Diffusion Autoencoders, ECAI 2024): diffusion process core,
causal-representation UNet, SCM latent prior, classifier-free masking,
counterfactual generation, and the full training/eval stack - redesigned
for TPU (bf16 MXU compute, lax.scan samplers, mesh data parallelism,
Pallas fused kernels).
"""

__version__ = "0.3.0"  # keep in sync with pyproject.toml [project] version
