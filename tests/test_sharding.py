"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from poseidon_tpu.parallel.mesh import (
    make_mesh,
    param_partition_spec,
    params_shardings,
    shard_batch,
)


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh()
        assert mesh.shape == {"data": 8, "model": 1}
        mesh = make_mesh(num_model=2)
        assert mesh.shape == {"data": 4, "model": 2}
        with pytest.raises(ValueError):
            make_mesh(num_data=3, num_model=2)

    def test_param_spec_small_replicated(self):
        mesh = make_mesh(num_model=2)
        assert param_partition_spec((64,), mesh) == P()

    def test_param_spec_large_sharded(self):
        mesh = make_mesh(num_model=2)
        spec = param_partition_spec((768, 3072), mesh)
        assert "model" in spec

    def test_param_spec_indivisible(self):
        mesh = make_mesh(num_model=2)
        # odd dims cannot shard over 2
        assert param_partition_spec((333, 777), mesh) == P()

    def test_dp_mesh_all_replicated(self):
        mesh = make_mesh(num_model=1)
        assert param_partition_spec((768, 3072), mesh) == P()

    def test_shard_batch(self):
        mesh = make_mesh()
        batch = {"pixel_values": np.zeros((16, 3, 8, 8), np.float32),
                 "time": np.zeros((16,), np.float32)}
        out = shard_batch(batch, mesh)
        assert out["pixel_values"].sharding.spec[0] == "data"


class TestGraftEntry:
    def test_dryrun_multichip_8(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_dryrun_multichip_2(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(2)
