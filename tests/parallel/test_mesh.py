"""Mesh/sharding helpers on the virtual 8-device CPU mesh — the layer the
reference doesn't have (SURVEY.md §2.4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ebnerd_tpu.parallel.mesh import (
    data_sharding,
    host_shard_rows,
    make_mesh,
    replicated,
    shard_batch,
    table_sharding,
)


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8 and mesh.axis_names == ("data", "model")
    mesh2 = make_mesh(data=4, model=2)
    assert mesh2.devices.shape == (4, 2)
    with pytest.raises(ValueError, match="devices"):
        make_mesh(data=3, model=2)


def test_sharded_table_gather_matches_replicated():
    """Row-sharding a value table over 'model' must not change gather
    results — XLA inserts the collectives."""
    mesh = make_mesh(data=4, model=2)
    table = np.arange(64 * 16, dtype=np.float32).reshape(64, 16)
    idx = np.random.default_rng(0).integers(0, 64, (32, 5)).astype(np.int32)
    t_rep = jax.device_put(table, replicated(mesh))
    t_shard = jax.device_put(table, table_sharding(mesh))
    idx_dev = jax.device_put(idx, data_sharding(mesh))

    @jax.jit
    def gather(t, i):
        return t[i].sum(axis=-1)

    np.testing.assert_allclose(
        np.asarray(gather(t_rep, idx_dev)), np.asarray(gather(t_shard, idx_dev))
    )


def test_shard_batch_splits_leading_axis():
    mesh = make_mesh(data=4, model=2)
    batch = {"x": np.zeros((16, 3), np.float32), "n": 7}
    out = shard_batch(batch, mesh)
    assert out["n"] == 7
    assert out["x"].sharding.spec == P("data")
    assert out["x"].shape == (16, 3)


def test_psum_gradient_reduction_over_data_axis():
    """jit over sharded inputs inserts the gradient reduction: per-shard
    means of a data-parallel loss equal the global mean gradient."""
    mesh = make_mesh(data=8, model=1)
    w = jax.device_put(np.ones((4,), np.float32), replicated(mesh))
    x = np.random.default_rng(1).standard_normal((16, 4)).astype(np.float32)
    x_dev = jax.device_put(x, data_sharding(mesh))

    @jax.jit
    def grad_w(w, x):
        return jax.grad(lambda w: jnp.mean((x @ w) ** 2))(w)

    expected = grad_w(np.ones((4,), np.float32), x)
    np.testing.assert_allclose(np.asarray(grad_w(w, x_dev)),
                               np.asarray(expected), rtol=1e-5)


def test_host_shard_rows_partitions():
    slices = [host_shard_rows(103, pi, 4) for pi in range(4)]
    rows = np.concatenate([np.arange(103)[s] for s in slices])
    np.testing.assert_array_equal(rows, np.arange(103))
