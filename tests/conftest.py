"""Test harness configuration.

Tests run JAX on an 8-device virtual CPU mesh so multi-chip sharding logic
(`jax.sharding.Mesh` over the 'data' axis) is exercised without TPU
hardware (SURVEY.md §4 test-strategy gap analysis).

This environment injects a TPU PJRT plugin through a sitecustomize hook
that (a) overrides JAX_PLATFORMS at process start and (b) routes compiles
through a remote service, so the CPU selection must happen via jax.config
*after* import but *before* backend initialization — env vars are too
early (overridden) and XLA_FLAGS is parsed before conftest runs.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if not jax._src.xla_bridge._backends:  # backends not initialized yet
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
