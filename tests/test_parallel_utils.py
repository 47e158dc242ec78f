"""Mesh/sharding utility tests on the virtual 8-device backend."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from etts.parallel import (make_mesh, shard_batch, replicate,
                           local_batch_slice)


class TestMakeMesh:
    def test_1d_all_devices(self):
        mesh = make_mesh(("data",))
        assert mesh.devices.shape == (8,)
        assert mesh.axis_names == ("data",)

    def test_2d_with_wildcard(self):
        mesh = make_mesh(("data", "model"), (-1, 2))
        assert mesh.devices.shape == (4, 2)

    def test_explicit_sizes(self):
        mesh = make_mesh(("a", "b"), (2, 4))
        assert mesh.devices.shape == (2, 4)

    def test_multi_axis_requires_sizes(self):
        with pytest.raises(ValueError):
            make_mesh(("a", "b"))


class TestSharding:
    def test_shard_batch_places_leading_dim(self):
        mesh = make_mesh(("data",))
        x = jnp.arange(16.0).reshape(8, 2)
        (xs,) = shard_batch((x,), mesh)
        assert "data" in str(xs.sharding.spec)
        np.testing.assert_allclose(np.asarray(xs), np.asarray(x))

    def test_replicate(self):
        mesh = make_mesh(("data",))
        tree = {"w": jnp.ones((4, 4))}
        r = replicate(tree, mesh)
        assert r["w"].sharding.is_fully_replicated

    def test_local_batch_slice_single_host(self):
        s = local_batch_slice(32)
        assert s == slice(0, 32)  # single-process run
