"""Parameter counting (mirror of /root/reference/scOT/utils.py:85-97)."""

from __future__ import annotations

import jax
import numpy as np

# Keep in sync with training.optimizer._EMBED_TOP_KEYS.
_EMBED_TOP_KEYS = ("embeddings", "embed_norm", "patch_recovery",
                   "position_embeddings", "mask_token")


def get_num_parameters(params) -> int:
    """Total trainable parameter count of a params pytree."""
    return sum(int(np.prod(np.shape(leaf))) for leaf in jax.tree.leaves(params))


def get_num_parameters_no_embed(params) -> int:
    """Parameter count excluding embedding and patch-recovery modules (the
    reference's name-convention variant, utils.py:92-97)."""
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        top = str(getattr(path[0], "key", path[0]))
        if top not in _EMBED_TOP_KEYS:
            total += int(np.prod(np.shape(leaf)))
    return total
