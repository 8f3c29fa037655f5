import os

# Multi-device CPU mesh for sharding tests; must be set before jax import.
# Forced (not setdefault): the ambient environment may point JAX at a TPU
# tunnel, but unit tests always run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# A sitecustomize on PYTHONPATH may register a remote-TPU PJRT plugin and
# override jax_platforms via jax.config at interpreter start (trumping the
# env var). Re-force CPU through jax.config before any backend init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA-on-CPU compiles each distinct op in
# ~0.5-2s here, which makes eager flax init()s crawl. Cache everything on
# disk so only the first-ever run pays.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

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
