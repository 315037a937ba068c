"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the stub-run idea of the reference's Nextflow pipeline (SURVEY.md
section 4): multi-chip sharding logic is exercised on host CPU devices via
XLA's forced host platform device count, without TPU hardware.
"""

import os

# Must be set before jax is imported anywhere.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The harness pre-registers the axon TPU backend and forces
# jax_platforms="axon,cpu" via jax config (sitecustomize), which overrides
# the JAX_PLATFORMS env var — so override the *config* here, before any
# backend is initialised, unless on-TPU testing is explicitly requested.
if os.environ.get("HYGEIA_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

# Enable x64 so CPU parity tests can compare against the reference's
# double-precision C++ engine; production TPU runs use f32 (dtype arguments
# are explicit throughout the package).
jax.config.update("jax_enable_x64", True)
