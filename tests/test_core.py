"""Unit tests for config, metrics, and time-pair index math."""

import numpy as np
import pytest

from poseidon_tpu.config import MODEL_MAP, ScOTConfig, make_config
from poseidon_tpu.data.time_sampling import (
    build_time_indices,
    idx_map,
    resolve_num_trajectories,
    split_start,
)
from poseidon_tpu.metrics import (
    compute_channel_group_metrics,
    lp_error,
    median_relative_lp_error,
    relative_lp_error,
)


class TestConfig:
    def test_model_map_sizes(self):
        # reference train.py:35-72
        assert MODEL_MAP["T"]["depths"] == (4, 4, 4, 4)
        assert MODEL_MAP["S"]["depths"] == (8, 8, 8, 8)
        assert MODEL_MAP["T"]["embed_dim"] == 48
        assert MODEL_MAP["S"]["embed_dim"] == 48
        assert MODEL_MAP["B"]["embed_dim"] == 96
        assert MODEL_MAP["L"]["embed_dim"] == 192
        for m in MODEL_MAP.values():
            assert m["num_heads"] == (3, 6, 12, 24)
            assert m["skip_connections"] == (2, 2, 2, 0)
            assert m["window_size"] == 16 and m["patch_size"] == 4

    def test_hidden_size(self):
        cfg = make_config("B", num_channels=4, num_out_channels=4)
        assert cfg.hidden_size == 96 * 8  # embed * 2^(stages-1), model.py:127

    def test_window_clamping(self):
        # 128/4 = 32 grid: stage res 32,16,8,4 vs window 16
        cfg = make_config("B", num_channels=4, num_out_channels=4)
        assert cfg.stage_window_and_shift(0, shifted=True) == (16, 8)
        assert cfg.stage_window_and_shift(1, shifted=True) == (16, 0)  # res==window
        assert cfg.stage_window_and_shift(2, shifted=True) == (8, 0)
        assert cfg.stage_window_and_shift(3, shifted=True) == (4, 0)
        assert cfg.stage_window_and_shift(0, shifted=False) == (16, 0)

    def test_learn_residual_forced_off(self):
        cfg = ScOTConfig(use_conditioning=False, learn_residual=True)
        assert cfg.learn_residual is False

    def test_json_roundtrip(self):
        cfg = make_config("T", num_channels=3, num_out_channels=2,
                          channel_slice_list=(0, 1, 2))
        assert ScOTConfig.from_json(cfg.to_json()) == cfg

    def test_hashable(self):
        cfg = make_config("T", num_channels=3, num_out_channels=2)
        hash(cfg)


class TestMetrics:
    def test_relative_lp_error_matches_definition(self):
        rng = np.random.default_rng(0)
        p_ = rng.normal(size=(5, 3, 8, 8))
        t_ = rng.normal(size=(5, 3, 8, 8))
        got = relative_lp_error(p_, t_, p=1)
        want = 100 * np.sum(np.abs(p_ - t_), axis=(1, 2, 3)) / np.sum(np.abs(t_), axis=(1, 2, 3))
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_zero_target_guard(self):
        p_ = np.ones((2, 1, 4, 4))
        t_ = np.zeros((2, 1, 4, 4))
        out = relative_lp_error(p_, t_)
        assert np.all(np.isfinite(out))

    def test_lp_error_p2(self):
        p_ = np.zeros((1, 1, 2, 2))
        t_ = np.full((1, 1, 2, 2), 2.0)
        np.testing.assert_allclose(lp_error(p_, t_, p=2), [4.0])  # sqrt(4*4)

    def test_median(self):
        p_ = np.stack([np.full((1, 2, 2), v) for v in [1.0, 2.0, 3.0]])
        t_ = np.ones_like(p_)
        med = median_relative_lp_error(p_, t_)
        np.testing.assert_allclose(med, 100.0)  # errors 0,100,200 -> median 100

    def test_channel_group_battery(self):
        rng = np.random.default_rng(1)
        p_ = rng.normal(size=(6, 4, 8, 8))
        t_ = rng.normal(size=(6, 4, 8, 8))
        out = compute_channel_group_metrics(p_, t_, (0, 1, 3, 4), ("rho", "uv", "p"))
        assert "mean_relative_l1_error" in out
        assert "mean_over_median_relative_l1_error" in out
        assert "uv/median_relative_l1_error" in out
        # cross-group mean equals mean of group means
        groups = [out[f"{n}/mean_relative_l1_error"] for n in ("rho", "uv", "p")]
        np.testing.assert_allclose(out["mean_relative_l1_error"], np.mean(groups), rtol=1e-12)

    def test_single_group_flat(self):
        rng = np.random.default_rng(2)
        p_ = rng.normal(size=(6, 1, 8, 8))
        t_ = rng.normal(size=(6, 1, 8, 8))
        out = compute_channel_group_metrics(p_, t_, (0, 1), ("u",))
        assert set(out) == {
            "median_relative_l1_error", "mean_relative_l1_error",
            "std_relative_l1_error", "min_relative_l1_error", "max_relative_l1_error",
        }


class TestTimeSampling:
    def test_all2all_count(self):
        # (n+1)(n+2)/2 pairs for n=max_num_time_steps
        pairs = build_time_indices(7, 2)
        assert len(pairs) == 8 * 9 // 2
        assert pairs[0] == (0, 0)
        assert pairs[-1] == (14, 14)
        assert (0, 14) in pairs

    def test_allowed_transitions(self):
        pairs = build_time_indices(7, 2, allowed_time_transitions=[1])
        assert pairs == [(2 * i, 2 * (i + 1)) for i in range(7)]

    def test_idx_map(self):
        pairs = build_time_indices(3, 2)
        mult = len(pairs)
        traj, t, t1, t2 = idx_map(mult + 3, mult, pairs)
        assert traj == 1
        assert (t1, t2) == pairs[3]
        assert t == t2 - t1

    def test_idx_map_fixed_start(self):
        traj, t, t1, t2 = idx_map(5, 4, None, fix_input_to_time_step=2, time_step_size=3)
        assert traj == 1 and t1 == 2 and t2 == 3 * 2 + 2 and t == t2 - t1

    def test_sentinels(self):
        assert resolve_num_trajectories(-1, 20000, 120, 240) == 19640
        assert resolve_num_trajectories(-2, 20000, 120, 240) == 9820
        assert resolve_num_trajectories(-8, 20000, 120, 240) == 2455
        assert resolve_num_trajectories(7, 20000, 120, 240) == 7
        with pytest.raises(ValueError):
            resolve_num_trajectories(0, 10, 1, 1)

    def test_split_starts(self):
        assert split_start("train", 20000, 120, 240) == 0
        assert split_start("val", 20000, 120, 240) == 19640
        assert split_start("test", 20000, 120, 240) == 19760
