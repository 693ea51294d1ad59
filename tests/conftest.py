"""Test env: force the CPU backend with 8 virtual devices so sharding paths
are exercised without TPU hardware (multi-chip simulation per SURVEY.md §4).

Note: the machine's sitecustomize pre-imports jax with the axon TPU plugin
(JAX_PLATFORMS=axon), so env vars are too late here — we must override via
jax.config before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
