"""Device mesh construction and sharding rules.

The scOT training recipe is data-parallel in the reference (DDP only,
SURVEY.md §2.5); here it becomes an SPMD program over a 2-D
``(data, model)`` mesh:

- batch dims are sharded over ``data`` (pure DP; XLA inserts the gradient
  all-reduce over ICI automatically),
- parameters and optimizer state can additionally be sharded over ``model``
  (FSDP-style: each tensor's largest divisible axis is split; XLA inserts
  all-gathers before use and reduce-scatters on the gradients).

With ``model=1`` this degrades to plain DP. Meshes are built with
``mesh_utils.create_device_mesh`` so the data axis rides the ICI torus.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_data: Optional[int] = None,
    num_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if num_data is None:
        num_data = n // num_model
    if num_data * num_model != n:
        raise ValueError(f"mesh {num_data}x{num_model} != {n} devices")
    arr = mesh_utils.create_device_mesh((num_data, num_model), devices=np.asarray(devices))
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_partition_spec(path_shape, mesh: Mesh, min_size: int = 2**16) -> P:
    """FSDP-style spec for one parameter: shard the largest axis divisible by
    the model-axis size; replicate small tensors (norm scales, biases) — the
    all-gather for tiny tensors costs more than it saves."""
    shape = tuple(path_shape)
    axis = mesh.shape["model"]
    if axis <= 1 or int(np.prod(shape)) < min_size:
        return P()
    # Prefer the last (output-feature) axis, then the largest divisible one.
    candidates = sorted(range(len(shape)), key=lambda i: (shape[i] % axis == 0, shape[i]))
    best = candidates[-1]
    if shape[best] % axis != 0:
        return P()
    spec = [None] * len(shape)
    spec[best] = "model"
    return P(*spec)


def params_shardings(params, mesh: Mesh, min_size: int = 2**16):
    """NamedSharding pytree for a params (or optimizer-state) tree."""
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, param_partition_spec(np.shape(leaf), mesh, min_size)),
        params,
    )


def _spec_axes(spec) -> set:
    axes = set()
    for el in (spec or ()):
        if el is None:
            continue
        for a in (el if isinstance(el, tuple) else (el,)):
            axes.add(a)
    return axes


def assert_opt_state_sharded(opt_state, mesh: Mesh, min_size: int = 2**16) -> int:
    """FSDP sanity check: optimizer-state tensors (Adam moments) mirroring
    shardABLE parameters must actually land sharded over ``model`` —
    replicated moments would silently double HBM per chip at B/L scale.
    Relies on jit's sharding propagation from ``tx.init``'s param inputs;
    this asserts the propagation happened. Returns the number of sharded
    leaves checked; no-op (0) on a 1-wide model axis."""
    if mesh.shape.get("model", 1) <= 1:
        return 0
    import jax

    bad, checked = [], 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(opt_state)[0]:
        shape = getattr(leaf, "shape", None)
        sharding = getattr(leaf, "sharding", None)
        if shape is None or sharding is None:
            continue
        want = param_partition_spec(shape, mesh, min_size)
        if not _spec_axes(want):
            continue  # too small / no divisible axis: replication is fine
        checked += 1
        if "model" not in _spec_axes(getattr(sharding, "spec", None)):
            bad.append((jax.tree_util.keystr(path), tuple(shape)))
    if bad:
        raise AssertionError(
            f"{len(bad)} optimizer-state tensors are NOT sharded over the "
            f"'model' mesh axis (replicated Adam moments double HBM): "
            f"{bad[:5]}{'...' if len(bad) > 5 else ''}")
    return checked


def shard_batch(batch, mesh: Mesh):
    """device_put a host batch with the batch dim sharded over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


# ---------------------------------------------------------------------------
# Attention-kernel mesh context
# ---------------------------------------------------------------------------
#
# The fused Pallas attention is a custom call the SPMD partitioner cannot
# split on its own (it would all-gather the batch around every kernel).
# When a >1-device data axis is active, the kernel wrapper shard_maps its
# core over 'data' instead — shard_map's reverse-mode automatically psums
# the cotangents of the replicated bias/scale operands. The active mesh is
# communicated via this context (set by the Trainer / dryrun at trace time).

_ATTENTION_MESH: Optional[Mesh] = None


def set_attention_mesh(mesh: Optional[Mesh]) -> None:
    """Declare the mesh the attention kernels should shard over (None = off).

    The value is read at TRACE time. The Trainer re-asserts its own mesh at
    the start of every loop entry point (train/_eval_batches), so multiple
    Trainers with different meshes can coexist; standalone users tracing
    ``fused_window_attention`` directly should prefer the scoped
    :func:`attention_mesh_scope`."""
    global _ATTENTION_MESH
    _ATTENTION_MESH = mesh


class attention_mesh_scope:
    """Context manager scoping the attention-kernel mesh around a trace:

        with attention_mesh_scope(mesh):
            out = jax.jit(fn)(x)   # first call traces inside the scope

    Restores the previous value on exit, so nested Trainers/scopes cannot
    leak a stale mesh into later traces."""

    def __init__(self, mesh: Optional[Mesh]):
        self.mesh = mesh

    def __enter__(self):
        global _ATTENTION_MESH
        self.prev = _ATTENTION_MESH
        _ATTENTION_MESH = self.mesh
        return self.mesh

    def __exit__(self, *exc):
        global _ATTENTION_MESH
        _ATTENTION_MESH = self.prev
        return False


def attention_mesh() -> Optional[Mesh]:
    m = _ATTENTION_MESH
    if m is not None and m.shape.get("data", 1) > 1:
        return m
    return None


def maybe_shard_map_data(core, rows: int, granule: int, in_specs, out_specs):
    """shard_map ``core`` over the active attention mesh's data axis, or
    return it unchanged when no >1-device data mesh is active or when the
    shards would not be whole images.

    ``rows`` is the leading-dim size of the data-sharded operands and
    ``granule`` the number of rows belonging to ONE image. Whole-image
    shards are mandatory: mid-image shards let the surrounding GSPMD
    partitioner propagate the split through downstream reshapes, which was
    observed to corrupt a conv weight gradient (exactly 2x) with a correct
    forward — see tests/test_sharding.py::TestWholeImageShardGuard.
    shard_map's reverse-mode psums the cotangents of replicated operands."""
    import jax

    mesh = attention_mesh()
    if mesh is None or rows % (mesh.shape["data"] * granule) != 0:
        return core
    try:  # jax >= 0.9 stable API (check_rep renamed to check_vma)
        return jax.shard_map(core, mesh=mesh, check_vma=False,
                             in_specs=in_specs, out_specs=out_specs)
    except (AttributeError, TypeError):
        from jax.experimental.shard_map import shard_map

        return shard_map(core, mesh=mesh, check_rep=False,
                         in_specs=in_specs, out_specs=out_specs)
