"""One tiny 28px MorphoMNIST Config for every fast test that needs a real
model: the multihost worker, tensor-parallel suite, and data-parallel eval
suite all build from this base so the suites keep testing the SAME model
when a Config field changes semantics. Per-test knobs go in as overrides.
"""


def tiny_config(**overrides):
    from causaldiffae_tpu.config import Config

    base = dict(
        name="tiny", dataset="morphomnist", image_size=28, in_channels=1,
        num_channels=32, num_res_blocks=1, num_heads=2, n_vars=2, rep_dim=32,
        attention_resolutions="14", class_cond=True, rep_cond=True,
        causal_modeling=True, masking=True, diffusion_steps=100,
        batch_size=8,
    )
    base.update(overrides)
    return Config(**base)
