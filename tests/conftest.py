"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on the host platform
(``xla_force_host_platform_device_count=8``) per the TPU-build test strategy
(SURVEY.md section 4). Must set env vars before jax imports.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (must configure before any other jax user imports)

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config.
jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference/code"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)
