"""Test harness config: run everything on CPU with 8 virtual devices.

This exercises the multi-device mesh/psum paths without a TPU (the
capability the reference lacks - SURVEY §4). Must run before jax is
imported anywhere.
"""

import os

# NB the axon site config force-overrides the JAX_PLATFORMS env var, so the
# env var alone is NOT enough - we must also set jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE_ROOT = Path("/root/reference")


def reference_available() -> bool:
    return (REFERENCE_ROOT / "improved_diffusion").exists()
