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

        ge.dryrun_multichip(8, full_geometry=False)

    def test_dryrun_multichip_2(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(2, full_geometry=False)

    @pytest.mark.slow
    def test_dryrun_multichip_8_flagship(self):
        """The driver-default path: one optimizer step of REAL ScOT-B
        (image 128 / window 16 / depths (8,8,8,8)) on the 8-device mesh.
        ~8 min on one CPU core; the driver runs this every round."""
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestPallasUnderMesh:
    """The fused attention kernels must shard over the data axis (via the
    shard_map wrapper in ops/window_attention._sharded_core) instead of being
    all-gathered around by the SPMD partitioner."""

    def test_no_allgather_and_numerics(self):
        import re

        import numpy as np
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from poseidon_tpu import ScOT, make_config
        from poseidon_tpu.parallel.mesh import set_attention_mesh

        cfg = make_config("T", image_size=32, patch_size=4, num_channels=3,
                          num_out_channels=2, embed_dim=16, depths=(2, 2),
                          num_heads=(2, 2), skip_connections=(1, 0),
                          window_size=4, mlp_ratio=2.0,
                          channel_slice_list=(0, 1, 2), use_conditioning=True,
                          attention_impl="pallas")
        m = ScOT(config=cfg)
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
        x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 3, 32, 32)),
                        jnp.float32)
        t = jnp.linspace(0.1, 0.9, 8)
        v = m.init(jax.random.PRNGKey(0), x[:1], t[:1])
        try:
            set_attention_mesh(mesh)
            xs = jax.device_put(x, NamedSharding(mesh, P("data")))
            ts = jax.device_put(t, NamedSharding(mesh, P("data")))
            vr = jax.device_put(v, NamedSharding(mesh, P()))
            f = jax.jit(lambda v, x, t: m.apply(v, x, t))
            txt = f.lower(vr, xs, ts).compile().as_text()
            assert len(re.findall(r"all-gather", txt)) == 0
            y = f(vr, xs, ts)

            def loss(v, x, t):
                return jnp.sum(m.apply(v, x, t) ** 2)

            g_sh = jax.jit(jax.grad(loss))(vr, xs, ts)
        finally:
            set_attention_mesh(None)
        y1 = jax.jit(lambda v, x, t: m.apply(v, x, t))(v, x, t)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y1), atol=1e-5)
        g1 = jax.jit(jax.grad(loss))(v, x, t)
        for a, b in zip(jax.tree_util.tree_leaves(g_sh),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestWholeImageShardGuard:
    """Regression: packed/unshifted attention under a data mesh must never
    split an image's windows across shards. With the old guard (granule =
    head-groups only, mask nW collapsed to 1 for unshifted blocks), batch 2
    on the 8-device mesh sharded one WINDOW per device and XLA's partitioner
    doubled the patch_recovery mixup conv weight gradient (exactly 2x) while
    every other grad and the forward stayed correct."""

    def _grads(self, cfg, variables, x, t):
        from poseidon_tpu import ScOT

        m = ScOT(config=cfg)

        def loss(v):
            return jnp.sum(m.apply(v, x, t) ** 2)

        return jax.jit(jax.grad(loss))(variables)

    @pytest.mark.parametrize("batch", [2, 8])
    def test_packed_grads_match_under_mesh(self, batch):
        from poseidon_tpu import ScOT, make_config
        from poseidon_tpu.parallel.mesh import attention_mesh_scope, make_mesh

        kw = dict(image_size=32, patch_size=4, num_channels=3,
                  num_out_channels=2, embed_dim=64, depths=(1, 1),
                  num_heads=(8, 8), skip_connections=(1, 0), window_size=4,
                  mlp_ratio=2.0, channel_slice_list=(0, 1, 2),
                  use_conditioning=True)
        cfg_x = make_config("T", **kw)
        cfg_p = cfg_x.replace(attention_impl="pallas")
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(batch, 3, 32, 32)), jnp.float32)
        t = jnp.linspace(0.1, 0.9, batch)
        variables = ScOT(config=cfg_x).init(jax.random.PRNGKey(0), x[:1], t[:1])
        g_ref = self._grads(cfg_x, variables, x, t)  # XLA path, mesh-blind
        with attention_mesh_scope(make_mesh()):  # batch 8: actively sharded
            g_p = self._grads(cfg_p, variables, x, t)
        for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g_ref),
                                jax.tree_util.tree_leaves(g_p)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-3,
                err_msg=jax.tree_util.keystr(path))

    def test_trainer_does_not_leak_mesh(self, tmp_path):
        """Constructing/using a Trainer must not leave the process-global
        attention mesh set (stale-mesh traces in later standalone code)."""
        from poseidon_tpu import make_config
        from poseidon_tpu.parallel.mesh import attention_mesh as get_mesh
        from poseidon_tpu.models.scot import ScOT
        from poseidon_tpu.training import Trainer, TrainingArguments

        cfg = make_config("T", image_size=16, patch_size=4, num_channels=1,
                          num_out_channels=1, embed_dim=16, depths=(1, 1),
                          num_heads=(2, 2), skip_connections=(1, 0),
                          window_size=4, mlp_ratio=1.0,
                          channel_slice_list=(0,), use_conditioning=True)
        args = TrainingArguments(
            output_dir=str(tmp_path), train_batch_size=8, eval_batch_size=8,
            num_train_epochs=1, report_to="none")
        Trainer(ScOT(config=cfg), args, train_dataset=None, eval_dataset=None)
        assert get_mesh() is None

    def test_fused_cln_tail_grads_match_under_mesh(self):
        """The knob-gated fused MLP+CLN tail shard-maps over B directly;
        its gradients must match the unfused path on an actively-sharded
        8-image batch."""
        from poseidon_tpu import ScOT, make_config
        from poseidon_tpu.parallel.mesh import attention_mesh_scope, make_mesh

        kw = dict(image_size=32, patch_size=4, num_channels=3,
                  num_out_channels=2, embed_dim=64, depths=(1, 1),
                  num_heads=(8, 8), skip_connections=(1, 0), window_size=4,
                  mlp_ratio=2.0, channel_slice_list=(0, 1, 2),
                  use_conditioning=True, attention_impl="pallas")
        cfg_ref = make_config("T", **kw)
        cfg_cln = cfg_ref.replace(fused_block_tail=True)
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(8, 3, 32, 32)), jnp.float32)
        t = jnp.linspace(0.1, 0.9, 8)
        variables = ScOT(config=cfg_ref).init(jax.random.PRNGKey(0),
                                              x[:1], t[:1])
        with attention_mesh_scope(make_mesh()):
            g_ref = self._grads(cfg_ref, variables, x, t)
            g_cln = self._grads(cfg_cln, variables, x, t)
        for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g_ref),
                                jax.tree_util.tree_leaves(g_cln)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-3, rtol=1e-2,
                err_msg=jax.tree_util.keystr(path))
