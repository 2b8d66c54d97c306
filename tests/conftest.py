"""Test config: force an 8-device virtual CPU platform.

All unit tests run on CPU with 8 virtual devices so sharding/collective code
paths (data/model mesh axes) are exercised without TPU hardware, per the
multi-chip test strategy in SURVEY.md §4.  Must run before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

# The sandbox preloads jax with a TPU platform via sitecustomize, so env vars
# alone are too late — override through jax.config before any backend init.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_collection_modifyitems(config, items):
    """`-m quick` tier: the FIRST collected test of every module gets the
    ``quick`` marker (each module covers one component, and its first
    test is its construction/smoke test), so a cheap all-component sweep
    stays available as the suite grows.  Full suite remains the gate."""
    seen = set()
    for item in items:
        mod = getattr(item, "module", None)
        name = getattr(mod, "__name__", None)
        if (name is not None and name not in seen
                and item.get_closest_marker("slow") is None):
            seen.add(name)
            item.add_marker(pytest.mark.quick)
