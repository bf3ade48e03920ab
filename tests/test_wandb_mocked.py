"""Online-W&B branches under a mocked ``wandb`` module (VERDICT r3 weak #5).

The offline fallbacks are covered by tests/test_sweep.py; here the ONLINE
code paths are pinned: ``inference._sweep_runs``'s ``wandb.Api`` filter
semantics (allow_failed / exclude_dataset / only_dataset /
filter_trajectories — reference inference.py:643-655) and
``train.wandb_setup``'s online init (reference train.py:128-150).
"""

import sys
import types
from argparse import Namespace

import pytest


class _FakeRun:
    def __init__(self, name, state="finished", dataset=None, num_traj=None):
        self.name = name
        self.state = state
        self.config = {}
        if dataset is not None:
            self.config["dataset"] = dataset
        if num_traj is not None:
            self.config["num_trajectories"] = num_traj


class _FakeSweep:
    def __init__(self, runs):
        self.runs = runs


@pytest.fixture
def fake_wandb(monkeypatch):
    runs = [
        _FakeRun("a", "finished", "wave.Layer", 128),
        _FakeRun("b", "crashed", "wave.Layer", 128),
        _FakeRun("c", "finished", "reaction_diffusion.AllenCahn", 128),
        _FakeRun("d", "finished", "wave.Layer", 512),
    ]
    mod = types.ModuleType("wandb")
    captured = {}

    class _Api:
        def sweep(self, path):
            captured["sweep_path"] = path
            return _FakeSweep(runs)

    class _InitRun:
        sweep_id = "sw123"
        name = "online-run-7"

        class config:  # noqa: N801 — wandb run.config-style attribute
            @staticmethod
            def update(*a, **k):
                captured.setdefault("config_updates", []).append((a, k))

    def _init(**kwargs):
        captured["init_kwargs"] = kwargs
        return _InitRun()

    mod.Api = _Api
    mod.init = _init
    mod.run = None
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod, runs, captured


def _params(**over):
    base = dict(run_names=None, wandb_entity="ent", wandb_project="proj",
                sweep_id="sw123", allow_failed=False, exclude_dataset=None,
                only_dataset=None, filter_trajectories=None,
                base_checkpoint_dir="/nonexistent", dataset="wave.Layer")
    base.update(over)
    return Namespace(**base)


class TestSweepRunsApiFilters:
    def test_default_keeps_only_finished(self, fake_wandb):
        from poseidon_tpu.inference import _sweep_runs

        runs = _sweep_runs(_params())
        assert [r.name for r in runs] == ["a", "c", "d"]
        _, _, captured = fake_wandb
        assert captured["sweep_path"] == "ent/proj/sw123"

    def test_allow_failed(self, fake_wandb):
        from poseidon_tpu.inference import _sweep_runs

        runs = _sweep_runs(_params(allow_failed=True))
        assert [r.name for r in runs] == ["a", "b", "c", "d"]

    def test_exclude_dataset(self, fake_wandb):
        from poseidon_tpu.inference import _sweep_runs

        runs = _sweep_runs(_params(exclude_dataset=["wave.Layer"]))
        assert [r.name for r in runs] == ["c"]

    def test_only_dataset(self, fake_wandb):
        from poseidon_tpu.inference import _sweep_runs

        runs = _sweep_runs(_params(only_dataset=["wave.Layer"]))
        assert [r.name for r in runs] == ["a", "d"]

    def test_filter_trajectories(self, fake_wandb):
        from poseidon_tpu.inference import _sweep_runs

        runs = _sweep_runs(_params(filter_trajectories=[512]))
        assert [r.name for r in runs] == ["d"]


class TestWandbSetupOnline:
    def test_online_init_flows_sweep_and_name(self, fake_wandb, monkeypatch):
        from poseidon_tpu import train

        monkeypatch.delenv("WANDB_SWEEP_ID", raising=False)
        params = Namespace(wandb_run_name="myrun", wandb_project_name="proj")
        run, sweep_id, run_name = train.wandb_setup(params, {"lr": 1e-4})
        _, _, captured = fake_wandb
        assert captured["init_kwargs"]["project"] == "proj"
        assert captured["init_kwargs"]["name"] == "myrun"
        assert captured["init_kwargs"]["config"] == {"lr": 1e-4}
        # run.sweep_id wins over the (absent) env var; run.name wins over
        # the CLI name (reference train.py:136-150 uses run.name).
        assert sweep_id == "sw123"
        assert run_name == "online-run-7"
        assert run is not None

    def test_no_name_no_sweep_skips_init(self, fake_wandb, monkeypatch):
        from poseidon_tpu import train

        monkeypatch.delenv("WANDB_SWEEP_ID", raising=False)
        params = Namespace(wandb_run_name=None, wandb_project_name="proj")
        _, _, captured = fake_wandb
        captured.pop("init_kwargs", None)
        run, sweep_id, run_name = train.wandb_setup(params, {})
        assert run is None and sweep_id is None
        assert "init_kwargs" not in captured  # init never called
        assert run_name.startswith("run-")  # timestamp fallback
