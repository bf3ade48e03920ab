"""Fast variable materialization helpers.

``jax.jit(model.init)`` compiles the full init graph (forward + RNG); on a
remote-compile TPU setup that costs minutes. For benchmarking and
compile-checks, where parameter VALUES are irrelevant, ``shape_variables``
materializes the variable tree from ``jax.eval_shape`` (no compile, no
transfer) — same shapes/dtypes/structure, zero values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def variables_shape(model, *example_args, **example_kwargs):
    return jax.eval_shape(model.init, jax.random.PRNGKey(0),
                          *example_args, **example_kwargs)


def shape_variables(model, *example_args, fill=0.0, **example_kwargs):
    """Variables matching model.init's tree without compiling the init graph.
    ``fill``: a constant, or "normal" for host-side N(0, 0.02) samples (cheap,
    and avoids degenerate constant-weight numerics in benchmarks)."""
    import numpy as np

    shapes = variables_shape(model, *example_args, **example_kwargs)
    if fill == "normal":
        rng = np.random.default_rng(0)

        def make(s):
            return jnp.asarray(
                rng.normal(0.0, 0.02, size=s.shape).astype(np.float32), s.dtype)

        return jax.tree.map(make, shapes)
    return jax.tree.map(lambda s: jnp.full(s.shape, fill, s.dtype), shapes)


def enable_compilation_cache(path: str = "/root/.cache/jax_comp_cache"):
    """Persistent compilation cache so repeated bench/driver runs skip XLA
    compiles."""
    import os

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
