"""Round-3: device-derived kernel/bench constants and the FSDP opt-state
sharding assertion (VERDICT r2 item 8)."""

import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from poseidon_tpu.utils.device import peak_bf16_flops, tpu_spec, vmem_budget_bytes


def _fake(kind, platform="tpu"):
    return types.SimpleNamespace(device_kind=kind, platform=platform)


class TestTPUSpec:
    @pytest.mark.parametrize("kind,name,peak", [
        ("TPU v5 lite", "v5e", 197e12),
        ("TPU v5e", "v5e", 197e12),
        ("TPU v5p", "v5p", 459e12),
        ("TPU v4", "v4", 275e12),
        ("TPU v6e", "v6e", 918e12),
        ("TPU v3", "v3", 123e12),
    ])
    def test_known_generations(self, kind, name, peak):
        spec = tpu_spec(_fake(kind))
        assert spec.kind == name
        assert spec.peak_bf16_flops == peak

    def test_unknown_tpu_warns(self):
        with pytest.warns(UserWarning, match="Unknown TPU device_kind"):
            spec = tpu_spec(_fake("TPU v99 mega"))
        assert spec.kind == "unknown"

    def test_unknown_tpu_strict_raises(self):
        with pytest.raises(ValueError, match="Unknown TPU"):
            tpu_spec(_fake("TPU v99 mega"), strict=True)

    def test_cpu_gets_fallback_silently(self):
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("error")
            spec = tpu_spec(jax.devices("cpu")[0])
        assert spec.peak_bf16_flops > 0

    def test_vmem_budget_reproduces_tuned_value(self):
        # The empirically validated kernel budget on 16 MiB-VMEM cores was
        # 11e6 bytes; the derived budget must stay within 1% of it so group
        # sizes don't silently change (and must scale up on 32 MiB parts).
        b = vmem_budget_bytes(_fake("TPU v5 lite"))
        assert abs(b - 11e6) / 11e6 < 0.01
        assert abs(vmem_budget_bytes(_fake("TPU v6e")) - 2 * b) <= 2

    def test_peak_helper(self):
        assert peak_bf16_flops(_fake("TPU v5p")) == 459e12


class TestOptStateShardingAssert:
    def _mesh_params(self):
        from poseidon_tpu.parallel.mesh import make_mesh, params_shardings

        mesh = make_mesh(num_model=2)
        params = {
            "dense": {"kernel": jnp.zeros((512, 1024)), "bias": jnp.zeros((1024,))},
            "small": {"kernel": jnp.zeros((8, 8))},
        }
        return mesh, params, params_shardings(params, mesh)

    def test_explicit_out_shardings_pass(self):
        """Sharding moments the way Trainer._make_state does (explicitly —
        jit propagation from param inputs provably leaves tx.init outputs
        replicated) satisfies the assertion."""
        import optax

        from jax.sharding import NamedSharding

        from poseidon_tpu.parallel.mesh import (
            assert_opt_state_sharded,
            param_partition_spec,
        )

        mesh, params, shardings = self._mesh_params()
        params = jax.tree.map(jax.device_put, params, shardings)
        tx = optax.adamw(1e-3)
        opt_sh = jax.tree.map(
            lambda l: NamedSharding(mesh, param_partition_spec(l.shape, mesh)),
            jax.eval_shape(tx.init, params))
        opt_state = jax.jit(tx.init, out_shardings=opt_sh)(params)
        assert assert_opt_state_sharded(opt_state, mesh) > 0

    def test_trainer_moments_actually_sharded(self, tmp_path):
        """End-to-end: a Trainer on a (4 data, 2 model) mesh must produce
        FSDP-sharded Adam moments (this failed before round 3 — propagation
        left every moment replicated). Needs params above the sharding
        min_size, hence the widened embed_dim."""
        from test_trainer import SyntheticTimeDataset, tiny_cfg

        from poseidon_tpu import ScOT
        from poseidon_tpu.parallel.mesh import assert_opt_state_sharded
        from poseidon_tpu.training import Trainer, TrainingArguments

        cfg = tiny_cfg(embed_dim=128, num_heads=(2, 2))
        model = ScOT(config=cfg)
        ds = SyntheticTimeDataset()
        args = TrainingArguments(
            output_dir=str(tmp_path), train_batch_size=8, eval_batch_size=8,
            num_train_epochs=1, learning_rate=1e-3, weight_decay=1e-6,
            compute_dtype="float32", num_workers=2, num_model_shards=2,
            report_to="none")
        trainer = Trainer(model, args, train_dataset=ds)
        assert assert_opt_state_sharded(trainer.state.opt_state, trainer.mesh) > 0

    def test_replicated_moments_raise(self):
        import optax

        from poseidon_tpu.parallel.mesh import assert_opt_state_sharded, replicated

        mesh, params, _ = self._mesh_params()
        params = jax.tree.map(
            lambda x: jax.device_put(x, replicated(mesh)), params)
        tx = optax.adamw(1e-3)
        opt_state = jax.jit(tx.init, out_shardings=None)(params)
        with pytest.raises(AssertionError, match="NOT sharded"):
            assert_opt_state_sharded(opt_state, mesh)

    def test_dp_only_mesh_is_noop(self):
        from poseidon_tpu.parallel.mesh import assert_opt_state_sharded, make_mesh

        assert assert_opt_state_sharded({}, make_mesh(num_model=1)) == 0
