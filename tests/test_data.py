"""Data-layer tests on synthetic HDF5 fixtures that mimic each reference
dataset schema (velocity / solution / data / Sample_i layouts, SURVEY.md §2.3)."""

import h5py
import numpy as np
import pytest

from poseidon_tpu.data import registry
from poseidon_tpu.data.base import ConcatDataset, get_channel_lists
from poseidon_tpu.data.loader import DataLoader

RES = 128


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    """Synthetic files with tiny trajectory counts but the real schemas."""
    d = tmp_path_factory.mktemp("pde_data")
    rng = np.random.default_rng(0)

    def save(name, key, shape):
        with h5py.File(d / name, "w") as f:
            f.create_dataset(key, data=rng.normal(size=shape).astype(np.float32))

    # incompressible: velocity (N, T, 3, H, W) — u, v, tracer
    save("NS-PwC.nc", "velocity", (8, 21, 3, RES, RES))
    # compressible: data (N, T, 5, H, W)
    save("CE-RP.nc", "data", (8, 21, 5, RES, RES))
    # richtmyer/rayleigh: solution (N, T, 6, H, W)
    save("GCE-RT.nc", "solution", (8, 11, 6, RES, RES))
    # airfoil steady: solution (N, 2, H, W)
    with h5py.File(d / "SE-AF.nc", "w") as f:
        sol = rng.normal(size=(8, 2, RES, RES)).astype(np.float32)
        sol[:, 0, :4, :4] = 1.0  # body region
        f.create_dataset("solution", data=sol)
    # wave: solution (N, T, H, W) + c (N, H, W)
    with h5py.File(d / "Wave-Layer.nc", "w") as f:
        f.create_dataset("solution", data=rng.normal(size=(8, 21, RES, RES)).astype(np.float32))
        f.create_dataset("c", data=rng.normal(size=(8, RES, RES)).astype(np.float32))
    # allen-cahn
    with h5py.File(d / "ACE.nc", "w") as f:
        f.create_dataset("solution", data=rng.normal(size=(8, 20, RES, RES)).astype(np.float32))
    # poisson: source/solution (N, H, W)
    with h5py.File(d / "Poisson-Gauss.nc", "w") as f:
        f.create_dataset("source", data=rng.normal(size=(8, RES, RES)).astype(np.float32))
        f.create_dataset("solution", data=rng.normal(size=(8, RES, RES)).astype(np.float32))
    # helmholtz: per-sample groups
    with h5py.File(d / "Helmholtz.h5", "w") as f:
        for i in range(8):
            g = f.create_group(f"Sample_{i}")
            g.create_dataset("a", data=rng.normal(size=(RES, RES)).astype(np.float32))
            g.create_dataset("bc", data=np.float64(0.3))
            g.create_dataset("u", data=rng.normal(size=(RES, RES)).astype(np.float32))
    # kolmogorov: solution (N, T, 2, H, W)
    save("FNS-KF.nc", "solution", (8, 21, 2, RES, RES))
    return str(d)


def small_kwargs(**kw):
    # splits small enough for 8 trajectories
    base = dict(which="train", num_trajectories=2, data_path=None)
    base.update(kw)
    return base


def patch_splits(ds, n_max=8, n_val=2, n_test=2):
    """Shrink split constants to fit the synthetic files."""
    return dict(N_max=n_max, N_val=n_val, N_test=n_test)


@pytest.fixture(scope="module")
def tiny_splits(monkeypatch_module=None):
    return None


@pytest.fixture(autouse=True)
def shrink_splits(monkeypatch):
    """All zoo classes hardcode production N_max/N_val/N_test; shrink them so
    the 8-trajectory fixtures satisfy the split assertions."""
    import poseidon_tpu.data.base as base

    orig_bd = base.BaseDataset.post_init
    orig_btd = base.BaseTimeDataset.post_init

    def shrink(self):
        self.N_max, self.N_val, self.N_test = 8, 2, 2

    def bd(self):
        shrink(self)
        orig_bd(self)

    def btd(self):
        shrink(self)
        orig_btd(self)

    monkeypatch.setattr(base.BaseDataset, "post_init", bd)
    monkeypatch.setattr(base.BaseTimeDataset, "post_init", btd)


class TestSchemas:
    def test_incompressible(self, data_dir):
        ds = registry.get_dataset("fluids.incompressible.PiecewiseConstants",
                                  **small_kwargs(data_path=data_dir))
        assert ds.input_dim == 4
        assert ds.channel_slice_list == [0, 1, 3, 4]
        s = ds[0]
        assert s["pixel_values"].shape == (4, RES, RES)
        assert s["labels"].shape == (4, RES, RES)
        # density channel is constant (1 - 0.8)/0.31
        np.testing.assert_allclose(s["pixel_values"][0], (1 - 0.8) / 0.31, rtol=1e-5)
        # pressure channel constant and masked
        np.testing.assert_allclose(s["pixel_values"][3], 0.0, atol=1e-6)
        np.testing.assert_array_equal(s["pixel_mask"], [False, False, False, True])
        assert 0.0 <= s["time"] <= 1.0

    def test_incompressible_tracer(self, data_dir):
        ds = registry.get_dataset("fluids.incompressible.PiecewiseConstants.tracer",
                                  **small_kwargs(data_path=data_dir))
        assert ds.input_dim == 5
        s = ds[0]
        assert s["pixel_values"].shape == (5, RES, RES)
        assert list(s["pixel_mask"]) == [False, False, False, True, False]

    def test_just_velocities(self, data_dir):
        ds = registry.get_dataset("fluids.incompressible.PiecewiseConstants",
                                  **small_kwargs(data_path=data_dir, just_velocities=True))
        assert ds.input_dim == 2
        assert ds[0]["pixel_values"].shape == (2, RES, RES)

    def test_dataset_side_downsample(self, data_dir):
        ds = registry.get_dataset("fluids.incompressible.PiecewiseConstants",
                                  **small_kwargs(data_path=data_dir, resolution=64))
        s = ds[0]
        assert s["pixel_values"].shape == (4, 64, 64)

    def test_compressible(self, data_dir):
        ds = registry.get_dataset("fluids.compressible.Riemann",
                                  **small_kwargs(data_path=data_dir))
        s = ds[0]
        assert s["pixel_values"].shape == (4, RES, RES)
        assert ds.printable_channel_description == ["rho", "uv", "p"]

    def test_rayleigh_taylor_defaults(self, data_dir):
        ds = registry.get_dataset("fluids.compressible.gravity.RayleighTaylor",
                                  **small_kwargs(data_path=data_dir))
        # family defaults 7 steps of size 1 (reference base.py:75-84)
        assert ds.max_num_time_steps == 7 and ds.time_step_size == 1
        s = ds[0]
        assert s["pixel_values"].shape == (5, RES, RES)

    def test_airfoil(self, data_dir):
        ds = registry.get_dataset("fluids.compressible.steady.Airfoil",
                                  **small_kwargs(data_path=data_dir))
        s = ds[0]
        assert s["pixel_values"].shape == (1, RES, RES)
        assert s["pixel_mask"].shape == (1, RES, RES)
        # labels forced to 1 inside the body
        assert np.all(s["labels"][s["pixel_mask"]] == 1.0)
        assert "time" not in s

    def test_airfoil_time_wrapped(self, data_dir):
        ds = registry.get_dataset("fluids.compressible.steady.Airfoil.time",
                                  **small_kwargs(data_path=data_dir))
        s = ds[0]
        assert s["time"] == 1.0

    def test_wave_layer(self, data_dir):
        ds = registry.get_dataset("wave.Layer", **small_kwargs(data_path=data_dir))
        s = ds[0]
        assert s["pixel_values"].shape == (2, RES, RES)
        # c channel equal in input and label
        np.testing.assert_array_equal(s["pixel_values"][1], s["labels"][1])

    def test_allen_cahn_out_defaults(self, data_dir):
        ds = registry.get_dataset("reaction_diffusion.AllenCahn.out",
                                  **small_kwargs(data_path=data_dir))
        assert ds.max_num_time_steps == 9 and ds.time_step_size == 2

    def test_poisson(self, data_dir):
        ds = registry.get_dataset("elliptic.poisson.Gaussians",
                                  **small_kwargs(data_path=data_dir))
        s = ds[0]
        assert s["pixel_values"].shape == (1, RES, RES)

    def test_helmholtz(self, data_dir):
        ds = registry.get_dataset("elliptic.Helmholtz",
                                  **small_kwargs(data_path=data_dir))
        s = ds[0]
        assert s["pixel_values"].shape == (2, RES, RES)
        # bc plane constant
        assert np.ptp(s["pixel_values"][1]) == 0.0

    def test_kolmogorov(self, data_dir):
        ds = registry.get_dataset("fluids.incompressible.forcing.KolmogorovFlow",
                                  **small_kwargs(data_path=data_dir))
        s = ds[0]
        assert s["pixel_values"].shape == (5, RES, RES)
        np.testing.assert_array_equal(s["pixel_values"][4], s["labels"][4])

    def test_mixture(self, data_dir):
        ds = registry.get_dataset(
            ["fluids.incompressible.PiecewiseConstants", "fluids.compressible.Riemann"],
            **small_kwargs(data_path=data_dir))
        assert isinstance(ds, ConcatDataset)
        assert len(ds) == 2 * 2 * 36  # 2 datasets x 2 trajectories x 36 pairs
        assert ds[0]["pixel_values"].shape == (4, RES, RES)
        assert ds[len(ds) - 1]["pixel_values"].shape == (4, RES, RES)

    def test_unknown_raises(self, data_dir):
        with pytest.raises(ValueError):
            registry.get_dataset("fluids.incompressible.Nope",
                                 **small_kwargs(data_path=data_dir))


class TestTimeSemantics:
    def test_all2all_length(self, data_dir):
        ds = registry.get_dataset("fluids.incompressible.PiecewiseConstants",
                                  **small_kwargs(data_path=data_dir))
        # 7 steps -> 36 pairs per trajectory
        assert len(ds) == 2 * 36

    def test_fixed_start(self, data_dir):
        ds = registry.get_dataset(
            "fluids.incompressible.PiecewiseConstants",
            **small_kwargs(data_path=data_dir, which="test", num_trajectories=2,
                           fix_input_to_time_step=0, max_num_time_steps=1,
                           time_step_size=14))
        assert len(ds) == 2  # N_test(=2) * multiplier(=1)
        s = ds[0]
        np.testing.assert_allclose(s["time"], 14 / 20)

    def test_allowed_transitions(self, data_dir):
        ds = registry.get_dataset(
            "fluids.incompressible.PiecewiseConstants",
            **small_kwargs(data_path=data_dir, max_num_time_steps=1,
                           time_step_size=14, allowed_time_transitions=[1]))
        assert ds.multiplier == 1
        np.testing.assert_allclose(ds[0]["time"], 0.7)


class TestChannelLists:
    def test_parse(self):
        names, slices = get_channel_lists("[rho],[u,v],[p]")
        assert names == ["rho", "uv", "p"]
        assert slices == [0, 1, 3, 4]


class TestLoader:
    def test_determinism_and_sharding(self, data_dir):
        ds = registry.get_dataset("fluids.incompressible.PiecewiseConstants",
                                  **small_kwargs(data_path=data_dir))
        full = DataLoader(ds, 8, seed=1, num_workers=2)
        b_full = next(iter(full.epoch(3)))
        # two "hosts" each get half of the same global batch
        h0 = DataLoader(ds, 8, seed=1, num_hosts=2, host_id=0, num_workers=2)
        h1 = DataLoader(ds, 8, seed=1, num_hosts=2, host_id=1, num_workers=2)
        b0 = next(iter(h0.epoch(3)))
        b1 = next(iter(h1.epoch(3)))
        np.testing.assert_array_equal(
            np.concatenate([b0["pixel_values"], b1["pixel_values"]]),
            b_full["pixel_values"])

    def test_epoch_reshuffle(self, data_dir):
        ds = registry.get_dataset("fluids.incompressible.PiecewiseConstants",
                                  **small_kwargs(data_path=data_dir))
        dl = DataLoader(ds, 8, seed=0, num_workers=2)
        a = next(iter(dl.epoch(0)))
        b = next(iter(dl.epoch(1)))
        assert not np.array_equal(a["pixel_values"], b["pixel_values"])
        a2 = next(iter(dl.epoch(0)))
        np.testing.assert_array_equal(a["pixel_values"], a2["pixel_values"])

    def test_eval_padding(self, data_dir):
        ds = registry.get_dataset("elliptic.poisson.Gaussians",
                                  **small_kwargs(data_path=data_dir, which="test",
                                                 num_trajectories=2))
        # N_test=2 samples, batch 8 -> one padded batch
        dl = DataLoader(ds, 8, shuffle=False, drop_last=False, num_workers=2)
        batches = list(dl.epoch(0))
        assert len(batches) == 1
        assert batches[0]["pixel_values"].shape[0] == 8
        assert batches[0]["_valid"] == 2

    def test_batch_fields(self, data_dir):
        ds = registry.get_dataset("fluids.incompressible.PiecewiseConstants",
                                  **small_kwargs(data_path=data_dir))
        b = next(iter(DataLoader(ds, 4, num_workers=2).epoch(0)))
        assert b["pixel_values"].shape == (4, 4, RES, RES)
        assert b["time"].shape == (4,)
        assert b["pixel_mask"].dtype == np.bool_


class TestMultiHostLoader:
    """Two-host simulation (VERDICT r1 item 9): two loaders with host_id 0/1
    must partition every global batch disjointly and agree on valid counts."""

    class _Probe:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return {"pixel_values": np.full((1, 2, 2), float(i), np.float32),
                    "labels": np.full((1, 2, 2), float(i), np.float32),
                    "time": np.float32(0.5)}

    def _ids(self, batch):
        return [int(v) for v in batch["pixel_values"][:, 0, 0, 0]]

    def test_union_disjoint_and_order(self):
        from poseidon_tpu.data.loader import DataLoader

        ds = self._Probe(23)
        kw = dict(shuffle=True, seed=3, drop_last=False, num_hosts=2,
                  num_workers=2)
        l0 = DataLoader(ds, 8, host_id=0, **kw)
        l1 = DataLoader(ds, 8, host_id=1, **kw)
        seen = []
        for b0, b1 in zip(l0.epoch(1), l1.epoch(1)):
            ids0, ids1 = self._ids(b0), self._ids(b1)
            assert len(ids0) == len(ids1) == 4  # half the global batch each
            v0, v1 = int(b0["_valid"]), int(b1["_valid"])
            vg = int(b0["_valid_global"])
            assert vg == int(b1["_valid_global"])
            assert v0 + v1 == vg  # host-local valid counts tile the global one
            # host 0 holds rows [0:4), host 1 rows [4:8) of the global batch
            seen.extend(ids0[:v0])
            seen.extend(ids1[:v1])
        # every sample exactly once across hosts and batches
        assert sorted(seen) == list(range(23))

    def test_single_host_equals_two_host_union(self):
        from poseidon_tpu.data.loader import DataLoader

        ds = self._Probe(16)
        kw = dict(shuffle=True, seed=7, drop_last=True, num_workers=2)
        single = [self._ids(b) for b in DataLoader(ds, 8, num_hosts=1,
                                                   host_id=0, **kw).epoch(0)]
        l0 = DataLoader(ds, 8, num_hosts=2, host_id=0, **kw)
        l1 = DataLoader(ds, 8, num_hosts=2, host_id=1, **kw)
        double = [self._ids(b0) + self._ids(b1)
                  for b0, b1 in zip(l0.epoch(0), l1.epoch(0))]
        assert single == double  # scaling out hosts never changes the math
