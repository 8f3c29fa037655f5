import os

# Multi-device CPU mesh for sharding tests; must be set before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest

from ebnerd_tpu.data.synthetic import make_synthetic_ebnerd


@pytest.fixture(scope="session")
def ebnerd_fixture(tmp_path_factory):
    """A small synthetic EB-NeRD split on disk (history/behaviors/articles)."""
    path = tmp_path_factory.mktemp("ebnerd") / "train"
    return make_synthetic_ebnerd(path, n_users=50, n_articles=120, n_impressions=400, seed=7)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
