"""Optimizer construction: AdamW with the reference Trainer's 4-way parameter
grouping (/root/reference/scOT/trainer.py:295-445) mapped onto optax label
trees.

Groups and rules (evaluated in this order, as the reference does):
1. "embeddings"      — any param under the embedding or patch-recovery modules
                       (torch rule: name contains "embeddings"/"patch_recovery");
                       own LR, with weight decay. Active only when
                       ``learning_rate_embedding_recovery`` is set.
2. "time_embedding"  — ConditionalLayerNorm params (our ``cond_scale``/
                       ``cond_shift`` submodules); own LR, no decay. Active
                       only when ``learning_rate_time_embedding`` is set (and,
                       per the reference's branch structure, an embeddings LR
                       is allowed to be absent).
3. "decay"           — everything not in a LayerNorm-family module and not a
                       bias.
4. "no_decay"        — the rest (biases, norm scales/shifts).
"""

from __future__ import annotations

from typing import Optional

import jax
import optax


# Top-level param-tree keys that constitute the "embeddings" group. Our module
# names differ from torch's, so list them explicitly: the patch embedding, its
# norm, absolute position embeddings / mask token, and patch recovery.
_EMBED_TOP_KEYS = ("embeddings", "embed_norm", "patch_recovery",
                   "position_embeddings", "mask_token")
# Path fragments identifying LayerNorm-family params (plain LN and CLN).
_NORM_FRAGMENTS = ("LayerNorm_0", "cond_scale", "cond_shift")
_CLN_FRAGMENTS = ("cond_scale", "cond_shift")


def _path_strings(path) -> list:
    return [str(getattr(k, "key", getattr(k, "name", k))) for k in path]


def label_params(params, use_embeddings_group: bool, use_time_group: bool):
    """Label tree for optax.multi_transform."""

    def label(path, leaf):
        parts = _path_strings(path)
        if use_embeddings_group and parts[0] in _EMBED_TOP_KEYS:
            return "embeddings"
        is_cln = any(f in parts for f in _CLN_FRAGMENTS)
        if use_time_group and is_cln:
            return "time_embedding"
        is_norm = any(f in parts for f in _NORM_FRAGMENTS)
        # torch's get_decay_parameter_names excludes any param whose NAME
        # contains "bias" — this also catches PatchRecovery's projection_bias.
        is_bias = "bias" in parts[-1]
        if not is_norm and not is_bias:
            return "decay"
        return "no_decay"

    return jax.tree_util.tree_map_with_path(label, params)


def make_lr_schedule(kind: str, peak_lr: float, total_steps: int,
                     warmup_ratio: float = 0.0) -> optax.Schedule:
    """HF-style schedules: cosine/linear decay to 0, or constant — each with a
    linear warmup fraction."""
    warmup = int(round(warmup_ratio * total_steps))
    decay = max(total_steps - warmup, 1)
    if kind == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, peak_lr, max(warmup, 1) if warmup else 0, total_steps, end_value=0.0
        ) if warmup else optax.cosine_decay_schedule(peak_lr, decay)
    if kind == "linear":
        sched = [optax.linear_schedule(peak_lr, 0.0, decay)]
        if warmup:
            sched.insert(0, optax.linear_schedule(0.0, peak_lr, warmup))
            return optax.join_schedules(sched, [warmup])
        return sched[0]
    if kind in ("constant", "constant_with_warmup"):
        if warmup:
            return optax.join_schedules(
                [optax.linear_schedule(0.0, peak_lr, warmup),
                 optax.constant_schedule(peak_lr)], [warmup])
        return optax.constant_schedule(peak_lr)
    raise ValueError(f"Unknown lr scheduler {kind!r}")


def build_optimizer(
    params,
    *,
    learning_rate: float,
    total_steps: int,
    weight_decay: float = 0.0,
    lr_scheduler_type: str = "cosine",
    warmup_ratio: float = 0.0,
    learning_rate_embedding_recovery: Optional[float] = None,
    learning_rate_time_embedding: Optional[float] = None,
    adam_beta1: float = 0.9,
    adam_beta2: float = 0.999,
    adam_epsilon: float = 1e-8,
    max_grad_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    use_emb = learning_rate_embedding_recovery is not None
    use_time = learning_rate_time_embedding is not None
    labels = label_params(params, use_emb, use_time)

    def adamw(lr, wd):
        return optax.adamw(
            make_lr_schedule(lr_scheduler_type, lr, total_steps, warmup_ratio),
            b1=adam_beta1, b2=adam_beta2, eps=adam_epsilon, weight_decay=wd,
        )

    transforms = {
        "decay": adamw(learning_rate, weight_decay),
        "no_decay": adamw(learning_rate, 0.0),
    }
    if use_emb:
        transforms["embeddings"] = adamw(learning_rate_embedding_recovery, weight_decay)
    if use_time:
        transforms["time_embedding"] = adamw(learning_rate_time_embedding, 0.0)

    tx = optax.multi_transform(transforms, labels)
    if max_grad_norm is not None and max_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx
