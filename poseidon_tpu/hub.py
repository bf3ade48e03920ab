"""HF-Hub / PyTorch checkpoint bridge.

Maps the reference's PyTorch ``ScOT`` state dict (camlab-ethz/Poseidon-{T,B,L}
layout; naming per /root/reference/scOT/model.py: embeddings / encoder /
decoder / patch_recovery / residual_blocks) onto this package's Flax param
pytree, handling the layout differences:

- torch ``nn.Linear`` weight (out, in)        -> Dense kernel (in, out)
- torch ``nn.Conv2d``  weight (O, I, kh, kw)  -> Conv kernel (kh, kw, I, O)
- patchify Conv2d (E, C, p, p)                -> GEMM kernel (p*p*C, E) in
  (dy, dx, c) row order (see models.layers.PatchEmbed)
- patch-recovery ConvTranspose2d (E, O, p, p) -> GEMM kernel (E, p*p*O) in
  (dy, dx, o) column order; bias (O,) tiled p*p times
- decoder stage k in the torch ModuleList corresponds to pyramid level
  ``num_stages - 1 - k`` (the reference builds decode stages deepest-first,
  model.py:1139)

Also implements the ``from_pretrained(..., ignore_mismatched_sizes=True)``
finetune surgery (reference train.py:330-335): when the new config changes
in/out channels, mismatched embedding/recovery tensors keep their fresh init.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from .config import ScOTConfig

# ---------------------------------------------------------------------------
# Tensor re-layout helpers
# ---------------------------------------------------------------------------

def _linear_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _conv_w(w: np.ndarray) -> np.ndarray:
    # (O, I, kh, kw) -> (kh, kw, I, O)
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _patch_embed_w(w: np.ndarray) -> np.ndarray:
    # (E, C, p, p) -> (p, p, C, E) -> (p*p*C, E)
    e = w.shape[0]
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0)).reshape(-1, e)


def _patch_recovery_w(w: np.ndarray) -> np.ndarray:
    # ConvTranspose2d weight (E, O, p, p) -> (E, p, p, O) -> (E, p*p*O)
    e = w.shape[0]
    return np.ascontiguousarray(w.transpose(0, 2, 3, 1)).reshape(e, -1)


# ---------------------------------------------------------------------------
# Name mapping
# ---------------------------------------------------------------------------

def _norm_entries(dst: dict, torch_prefix: str, use_conditioning: bool,
                  getw, name: str = "norm") -> None:
    """Map a (Conditional)LayerNorm at ``torch_prefix`` into dst[name]."""
    if use_conditioning:
        dst[name] = {
            "cond_scale": {
                "kernel": getw(f"{torch_prefix}.weight.weight", _linear_w),
                "bias": getw(f"{torch_prefix}.weight.bias"),
            },
            "cond_shift": {
                "kernel": getw(f"{torch_prefix}.bias.weight", _linear_w),
                "bias": getw(f"{torch_prefix}.bias.bias"),
            },
        }
    else:
        dst[name] = {
            "LayerNorm_0": {
                "scale": getw(f"{torch_prefix}.weight"),
                "bias": getw(f"{torch_prefix}.bias"),
            }
        }


def _block_entries(torch_prefix: str, cfg: ScOTConfig, getw) -> dict:
    """One SwinBlock: attention + norms + MLP."""
    out = {
        "attn": {
            "query": {
                "kernel": getw(f"{torch_prefix}.attention.self.query.weight", _linear_w),
            },
            "key": {
                "kernel": getw(f"{torch_prefix}.attention.self.key.weight", _linear_w),
            },
            "value": {
                "kernel": getw(f"{torch_prefix}.attention.self.value.weight", _linear_w),
            },
            "proj": {
                "kernel": getw(f"{torch_prefix}.attention.output.dense.weight", _linear_w),
                "bias": getw(f"{torch_prefix}.attention.output.dense.bias"),
            },
            "cpb_mlp1": {
                "kernel": getw(
                    f"{torch_prefix}.attention.self.continuous_position_bias_mlp.0.weight",
                    _linear_w),
                "bias": getw(
                    f"{torch_prefix}.attention.self.continuous_position_bias_mlp.0.bias"),
            },
            "cpb_mlp2": {
                "kernel": getw(
                    f"{torch_prefix}.attention.self.continuous_position_bias_mlp.2.weight",
                    _linear_w),
            },
            "logit_scale": getw(f"{torch_prefix}.attention.self.logit_scale"),
        },
        "mlp_fc1": {
            "kernel": getw(f"{torch_prefix}.intermediate.dense.weight", _linear_w),
            "bias": getw(f"{torch_prefix}.intermediate.dense.bias"),
        },
        "mlp_fc2": {
            "kernel": getw(f"{torch_prefix}.output.dense.weight", _linear_w),
            "bias": getw(f"{torch_prefix}.output.dense.bias"),
        },
    }
    if cfg.qkv_bias:
        out["attn"]["query"]["bias"] = getw(f"{torch_prefix}.attention.self.query.bias")
        out["attn"]["value"]["bias"] = getw(f"{torch_prefix}.attention.self.value.bias")
    _norm_entries(out, f"{torch_prefix}.layernorm_before", cfg.use_conditioning,
                  getw, "norm_attn")
    _norm_entries(out, f"{torch_prefix}.layernorm_after", cfg.use_conditioning,
                  getw, "norm_mlp")
    return out


def convert_torch_state_dict(state_dict: Dict[str, np.ndarray],
                             cfg: ScOTConfig) -> dict:
    """Convert a reference PyTorch state dict to this package's params tree.

    Always COPIES: ``torch.Tensor.numpy()`` shares memory with the live
    tensor, so pass-through leaves (biases, norm scales) would otherwise
    alias the torch model's parameters — an in-place ``optimizer.step()``
    on the torch side would silently mutate the converted jax tree."""
    sd = {k: np.array(v) for k, v in state_dict.items()}
    consumed = set()

    def getw(key: str, f=None):
        consumed.add(key)
        w = sd[key]
        return f(w) if f is not None else w

    params: dict = {}

    # embeddings
    params["embeddings"] = {
        "projection": {
            "kernel": getw("embeddings.patch_embeddings.projection.weight", _patch_embed_w),
            "bias": getw("embeddings.patch_embeddings.projection.bias"),
        }
    }
    _norm_entries(params, "embeddings.norm", cfg.use_conditioning, getw, "embed_norm")
    if "embeddings.mask_token" in sd:
        params["mask_token"] = getw("embeddings.mask_token")
    if "embeddings.position_embeddings" in sd and cfg.use_absolute_embeddings:
        params["position_embeddings"] = getw("embeddings.position_embeddings")

    def _tree_stack(trees):
        import jax

        return jax.tree.map(lambda *xs: np.stack(xs), *trees)

    def _stage_blocks(torch_stage_prefix: str, depth: int, scanned: bool) -> dict:
        """Blocks of one stage, in either unrolled (stage_i_block_j) or
        scanned (stage_i_pairs with leading pair axis) layout."""
        blocks = [
            _block_entries(f"{torch_stage_prefix}.blocks.{j}", cfg, getw)
            for j in range(depth)
        ]
        if not scanned:
            return {f"block_{j}": b for j, b in enumerate(blocks)}
        pairs = [{"block_a": blocks[2 * m], "block_b": blocks[2 * m + 1]}
                 for m in range(depth // 2)]
        return {"pairs": _tree_stack(pairs)}

    # encoder
    enc: dict = {}
    for i in range(cfg.num_stages):
        depth = cfg.depths[i]
        scanned = cfg.scan_blocks and depth >= 2 and depth % 2 == 0
        st = _stage_blocks(f"encoder.layers.{i}", depth, scanned)
        if scanned:
            enc[f"stage_{i}_pairs"] = st["pairs"]
        else:
            for j in range(depth):
                enc[f"stage_{i}_block_{j}"] = st[f"block_{j}"]
        if i < cfg.num_stages - 1:
            ds = {
                "reduction": {
                    "kernel": getw(f"encoder.layers.{i}.downsample.reduction.weight",
                                   _linear_w),
                }
            }
            _norm_entries(ds, f"encoder.layers.{i}.downsample.norm",
                          cfg.use_conditioning, getw)
            enc[f"downsample_{i}"] = ds
    params["encoder"] = enc

    # decoder: torch layer index k <-> pyramid level (num_stages - 1 - k)
    dec: dict = {}
    for k in range(cfg.num_stages):
        lvl = cfg.num_stages - 1 - k
        depth = cfg.depths[lvl]
        scanned = cfg.scan_blocks and depth >= 2 and depth % 2 == 0
        st = _stage_blocks(f"decoder.layers.{k}", depth, scanned)
        if scanned:
            dec[f"stage_{lvl}_pairs"] = st["pairs"]
        else:
            for j in range(depth):
                dec[f"stage_{lvl}_block_{j}"] = st[f"block_{j}"]
        if lvl > 0:
            us = {
                "expand": {
                    "kernel": getw(f"decoder.layers.{k}.upsample.upsample.weight",
                                   _linear_w),
                },
                "mixup": {
                    "kernel": getw(f"decoder.layers.{k}.upsample.mixup.weight",
                                   _linear_w),
                },
            }
            _norm_entries(us, f"decoder.layers.{k}.upsample.norm",
                          cfg.use_conditioning, getw)
            dec[f"upsample_{lvl}"] = us
    params["decoder"] = dec

    # residual skip blocks
    for i, depth in enumerate(cfg.skip_connections):
        for j in range(depth):
            pre = f"residual_blocks.{i}.{j}"
            if cfg.residual_model == "convnext":
                blk = {
                    "dwconv": {
                        "kernel": getw(f"{pre}.dwconv.weight", _conv_w),
                        "bias": getw(f"{pre}.dwconv.bias"),
                    },
                    "pwconv1": {
                        "kernel": getw(f"{pre}.pwconv1.weight", _linear_w),
                        "bias": getw(f"{pre}.pwconv1.bias"),
                    },
                    "pwconv2": {
                        "kernel": getw(f"{pre}.pwconv2.weight", _linear_w),
                        "bias": getw(f"{pre}.pwconv2.bias"),
                    },
                    "layer_scale": getw(f"{pre}.weight"),
                }
                _norm_entries(blk, f"{pre}.norm", cfg.use_conditioning, getw)
            else:
                blk = {
                    "conv1": {"kernel": getw(f"{pre}.conv1.weight", _conv_w),
                              "bias": getw(f"{pre}.conv1.bias")},
                    "conv2": {"kernel": getw(f"{pre}.conv2.weight", _conv_w),
                              "bias": getw(f"{pre}.conv2.bias")},
                    "bn1": {"scale": getw(f"{pre}.bn1.weight"),
                            "bias": getw(f"{pre}.bn1.bias")},
                    "bn2": {"scale": getw(f"{pre}.bn2.weight"),
                            "bias": getw(f"{pre}.bn2.bias")},
                }
            params[f"residual_{i}_{j}"] = blk

    # patch recovery
    params["patch_recovery"] = {
        "projection": {
            "kernel": getw("patch_recovery.projection.weight", _patch_recovery_w),
        },
        "projection_bias": getw("patch_recovery.projection.bias"),
        "mixup": {"kernel": getw("patch_recovery.mixup.weight", _conv_w)},
    }

    return params


def convert_torch_batch_stats(state_dict: Dict[str, np.ndarray],
                              cfg: ScOTConfig) -> Optional[dict]:
    """BatchNorm running stats for the resnet residual variant."""
    if cfg.residual_model != "resnet":
        return None
    out: dict = {}
    for i, depth in enumerate(cfg.skip_connections):
        for j in range(depth):
            pre = f"residual_blocks.{i}.{j}"
            out[f"residual_{i}_{j}"] = {
                "bn1": {"mean": np.asarray(state_dict[f"{pre}.bn1.running_mean"]),
                        "var": np.asarray(state_dict[f"{pre}.bn1.running_var"])},
                "bn2": {"mean": np.asarray(state_dict[f"{pre}.bn2.running_mean"]),
                        "var": np.asarray(state_dict[f"{pre}.bn2.running_var"])},
            }
    return out


# ---------------------------------------------------------------------------
# Checkpoint loading
# ---------------------------------------------------------------------------

def load_torch_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    """Load a PyTorch checkpoint directory (safetensors preferred)."""
    st_path = os.path.join(model_dir, "model.safetensors")
    bin_path = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        return load_file(st_path)
    if os.path.exists(bin_path):
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(
        f"No model.safetensors or pytorch_model.bin in {model_dir}")


def load_config(model_dir: str) -> ScOTConfig:
    with open(os.path.join(model_dir, "config.json")) as f:
        return ScOTConfig.from_dict(json.load(f))


def _merge_with_init(loaded: dict, init: dict, replaced: list,
                     path: Tuple[str, ...] = ()) -> dict:
    """Recursively overlay ``loaded`` onto ``init``; keep the fresh init where a
    tensor is missing or shape-mismatched (``ignore_mismatched_sizes``)."""
    out = {}
    for key, init_val in init.items():
        lv = loaded.get(key) if isinstance(loaded, dict) else None
        if isinstance(init_val, dict):
            out[key] = _merge_with_init(lv or {}, init_val, replaced, path + (key,))
        else:
            if lv is not None and tuple(np.shape(lv)) == tuple(init_val.shape):
                out[key] = np.asarray(lv, dtype=np.float32)
            else:
                replaced.append("/".join(path + (key,)))
                out[key] = init_val
    return out


def _inv_linear_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _inv_conv_w(w: np.ndarray) -> np.ndarray:
    # (kh, kw, I, O) -> (O, I, kh, kw)
    return np.ascontiguousarray(np.asarray(w).transpose(3, 2, 0, 1))


def _inv_patch_embed_w(w: np.ndarray, patch_size: int) -> np.ndarray:
    # (p*p*C, E) -> (p, p, C, E) -> (E, C, p, p)
    p = patch_size
    e = w.shape[-1]
    return np.ascontiguousarray(
        np.asarray(w).reshape(p, p, -1, e).transpose(3, 2, 0, 1))


def _inv_patch_recovery_w(w: np.ndarray, patch_size: int) -> np.ndarray:
    # (E, p*p*O) -> (E, p, p, O) -> (E, O, p, p)
    p = patch_size
    e = w.shape[0]
    return np.ascontiguousarray(
        np.asarray(w).reshape(e, p, p, -1).transpose(0, 3, 1, 2))


def export_torch_state_dict(params: dict, cfg: ScOTConfig,
                            batch_stats: Optional[dict] = None) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_torch_state_dict`: lay the Flax params tree
    out as a reference-format PyTorch state dict (numpy values), so models
    trained here can be loaded by the PyTorch reference / pushed to the Hub."""
    out: Dict[str, np.ndarray] = {}

    def put_norm(torch_prefix: str, node: dict):
        if cfg.use_conditioning:
            out[f"{torch_prefix}.weight.weight"] = _inv_linear_w(node["cond_scale"]["kernel"])
            out[f"{torch_prefix}.weight.bias"] = np.asarray(node["cond_scale"]["bias"])
            out[f"{torch_prefix}.bias.weight"] = _inv_linear_w(node["cond_shift"]["kernel"])
            out[f"{torch_prefix}.bias.bias"] = np.asarray(node["cond_shift"]["bias"])
        else:
            out[f"{torch_prefix}.weight"] = np.asarray(node["LayerNorm_0"]["scale"])
            out[f"{torch_prefix}.bias"] = np.asarray(node["LayerNorm_0"]["bias"])

    def put_block(torch_prefix: str, node: dict):
        attn = node["attn"]
        out[f"{torch_prefix}.attention.self.query.weight"] = _inv_linear_w(attn["query"]["kernel"])
        out[f"{torch_prefix}.attention.self.key.weight"] = _inv_linear_w(attn["key"]["kernel"])
        out[f"{torch_prefix}.attention.self.value.weight"] = _inv_linear_w(attn["value"]["kernel"])
        if cfg.qkv_bias:
            out[f"{torch_prefix}.attention.self.query.bias"] = np.asarray(attn["query"]["bias"])
            out[f"{torch_prefix}.attention.self.value.bias"] = np.asarray(attn["value"]["bias"])
        out[f"{torch_prefix}.attention.self.logit_scale"] = np.asarray(attn["logit_scale"])
        out[f"{torch_prefix}.attention.self.continuous_position_bias_mlp.0.weight"] = \
            _inv_linear_w(attn["cpb_mlp1"]["kernel"])
        out[f"{torch_prefix}.attention.self.continuous_position_bias_mlp.0.bias"] = \
            np.asarray(attn["cpb_mlp1"]["bias"])
        out[f"{torch_prefix}.attention.self.continuous_position_bias_mlp.2.weight"] = \
            _inv_linear_w(attn["cpb_mlp2"]["kernel"])
        out[f"{torch_prefix}.attention.output.dense.weight"] = _inv_linear_w(attn["proj"]["kernel"])
        out[f"{torch_prefix}.attention.output.dense.bias"] = np.asarray(attn["proj"]["bias"])
        out[f"{torch_prefix}.intermediate.dense.weight"] = _inv_linear_w(node["mlp_fc1"]["kernel"])
        out[f"{torch_prefix}.intermediate.dense.bias"] = np.asarray(node["mlp_fc1"]["bias"])
        out[f"{torch_prefix}.output.dense.weight"] = _inv_linear_w(node["mlp_fc2"]["kernel"])
        out[f"{torch_prefix}.output.dense.bias"] = np.asarray(node["mlp_fc2"]["bias"])
        put_norm(f"{torch_prefix}.layernorm_before", node["norm_attn"])
        put_norm(f"{torch_prefix}.layernorm_after", node["norm_mlp"])

    out["embeddings.patch_embeddings.projection.weight"] = _inv_patch_embed_w(
        params["embeddings"]["projection"]["kernel"], cfg.patch_size)
    out["embeddings.patch_embeddings.projection.bias"] = np.asarray(
        params["embeddings"]["projection"]["bias"])
    put_norm("embeddings.norm", params["embed_norm"])
    if "mask_token" in params:
        out["embeddings.mask_token"] = np.asarray(params["mask_token"])
    if "position_embeddings" in params:
        out["embeddings.position_embeddings"] = np.asarray(params["position_embeddings"])

    import jax

    def stage_block(node: dict, i: int, j: int) -> dict:
        """Fetch block j of a stage from either layout (scanned pairs or
        unrolled)."""
        if f"stage_{i}_pairs" in node:
            pairs = node[f"stage_{i}_pairs"]
            sub = pairs["block_a" if j % 2 == 0 else "block_b"]
            return jax.tree.map(lambda a: np.asarray(a)[j // 2], sub)
        return node[f"stage_{i}_block_{j}"]

    for i in range(cfg.num_stages):
        for j in range(cfg.depths[i]):
            put_block(f"encoder.layers.{i}.blocks.{j}",
                      stage_block(params["encoder"], i, j))
        if i < cfg.num_stages - 1:
            ds = params["encoder"][f"downsample_{i}"]
            out[f"encoder.layers.{i}.downsample.reduction.weight"] = \
                _inv_linear_w(ds["reduction"]["kernel"])
            put_norm(f"encoder.layers.{i}.downsample.norm", ds["norm"])

    for k in range(cfg.num_stages):
        lvl = cfg.num_stages - 1 - k
        for j in range(cfg.depths[lvl]):
            put_block(f"decoder.layers.{k}.blocks.{j}",
                      stage_block(params["decoder"], lvl, j))
        if lvl > 0:
            us = params["decoder"][f"upsample_{lvl}"]
            out[f"decoder.layers.{k}.upsample.upsample.weight"] = \
                _inv_linear_w(us["expand"]["kernel"])
            out[f"decoder.layers.{k}.upsample.mixup.weight"] = \
                _inv_linear_w(us["mixup"]["kernel"])
            put_norm(f"decoder.layers.{k}.upsample.norm", us["norm"])

    for i, depth in enumerate(cfg.skip_connections):
        for j in range(depth):
            pre = f"residual_blocks.{i}.{j}"
            blk = params[f"residual_{i}_{j}"]
            if cfg.residual_model == "convnext":
                out[f"{pre}.dwconv.weight"] = _inv_conv_w(blk["dwconv"]["kernel"])
                out[f"{pre}.dwconv.bias"] = np.asarray(blk["dwconv"]["bias"])
                out[f"{pre}.pwconv1.weight"] = _inv_linear_w(blk["pwconv1"]["kernel"])
                out[f"{pre}.pwconv1.bias"] = np.asarray(blk["pwconv1"]["bias"])
                out[f"{pre}.pwconv2.weight"] = _inv_linear_w(blk["pwconv2"]["kernel"])
                out[f"{pre}.pwconv2.bias"] = np.asarray(blk["pwconv2"]["bias"])
                out[f"{pre}.weight"] = np.asarray(blk["layer_scale"])
                put_norm(f"{pre}.norm", blk["norm"])
            else:
                out[f"{pre}.conv1.weight"] = _inv_conv_w(blk["conv1"]["kernel"])
                out[f"{pre}.conv1.bias"] = np.asarray(blk["conv1"]["bias"])
                out[f"{pre}.conv2.weight"] = _inv_conv_w(blk["conv2"]["kernel"])
                out[f"{pre}.conv2.bias"] = np.asarray(blk["conv2"]["bias"])
                for bn in ("bn1", "bn2"):
                    out[f"{pre}.{bn}.weight"] = np.asarray(blk[bn]["scale"])
                    out[f"{pre}.{bn}.bias"] = np.asarray(blk[bn]["bias"])
                    if batch_stats is not None:
                        st = batch_stats[f"residual_{i}_{j}"][bn]
                        out[f"{pre}.{bn}.running_mean"] = np.asarray(st["mean"])
                        out[f"{pre}.{bn}.running_var"] = np.asarray(st["var"])

    out["patch_recovery.projection.weight"] = _inv_patch_recovery_w(
        params["patch_recovery"]["projection"]["kernel"], cfg.patch_size)
    out["patch_recovery.projection.bias"] = np.asarray(
        params["patch_recovery"]["projection_bias"])
    out["patch_recovery.mixup.weight"] = _inv_conv_w(
        params["patch_recovery"]["mixup"]["kernel"])
    return {k: np.asarray(v, np.float32) for k, v in out.items()}


def unroll_scanned_params(params: dict, cfg: ScOTConfig) -> dict:
    """Bridge the scanned param layout (``stage_i_pairs`` with a leading
    pair axis, ``config.scan_blocks=True``) to the unrolled layout
    (``stage_i_block_j``) of the SAME weights, flax-to-flax.

    Scanned pair ``p`` holds executed blocks ``2p`` (block_a) and ``2p+1``
    (block_b) — for the encoder and the decoder alike, since block names
    follow EXECUTION order in both (models/scot.py:321-337, 379-398).
    Non-pair entries (downsample/upsample, odd-depth unrolled stages) pass
    through unchanged. Returns a new tree; the input is not mutated.
    """
    import re as _re

    import jax

    out = dict(params)
    for section in ("encoder", "decoder"):
        if section not in params:
            continue
        node = dict(params[section])
        for key in list(node):
            m = _re.fullmatch(r"stage_(\d+)_pairs", key)
            if m is None:
                continue
            pairs = node.pop(key)
            i = int(m.group(1))
            for p in range(cfg.depths[i] // 2):
                node[f"stage_{i}_block_{2 * p}"] = jax.tree.map(
                    lambda a, _p=p: a[_p], pairs["block_a"])
                node[f"stage_{i}_block_{2 * p + 1}"] = jax.tree.map(
                    lambda a, _p=p: a[_p], pairs["block_b"])
        out[section] = node
    return out


def save_pretrained(save_dir: str, params: dict, cfg: ScOTConfig,
                    batch_stats: Optional[dict] = None) -> None:
    """Write a reference-compatible checkpoint directory (model.safetensors +
    config.json) loadable by the PyTorch reference's ``ScOT.from_pretrained``
    — the Hub-push path of the reference (train.py:412-413) without egress."""
    from safetensors.numpy import save_file

    os.makedirs(save_dir, exist_ok=True)
    sd = export_torch_state_dict(params, cfg, batch_stats)
    save_file(sd, os.path.join(save_dir, "model.safetensors"))
    d = cfg.to_dict()
    d["model_type"] = "swinv2"  # Hub compat, reference model.py:69
    with open(os.path.join(save_dir, "config.json"), "w") as f:
        json.dump(d, f, indent=2)


def resolve_model_path(model_dir_or_repo_id: str) -> str:
    """Resolve a model source to a local directory. A string that is not an
    existing local directory is treated as a HF Hub repo id (e.g.
    ``"camlab-ethz/Poseidon-B"``, reference README.md:27-33) and downloaded
    via ``huggingface_hub.snapshot_download`` (honors HF_HOME cache; raises a
    clear error when offline)."""
    if os.path.isdir(model_dir_or_repo_id):
        return model_dir_or_repo_id
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:  # pragma: no cover
        raise FileNotFoundError(
            f"{model_dir_or_repo_id!r} is not a local directory and "
            "huggingface_hub is unavailable to download it") from e
    try:
        return snapshot_download(
            repo_id=model_dir_or_repo_id,
            allow_patterns=["config.json", "model.safetensors",
                            "pytorch_model.bin"])
    except Exception as e:
        raise FileNotFoundError(
            f"{model_dir_or_repo_id!r} is not a local checkpoint directory and "
            f"downloading it from the HF Hub failed ({type(e).__name__}: {e}). "
            "If you are offline, pre-download it with huggingface-cli or pass "
            "a local path.") from e


def push_to_hub(repo_id: str, export_dir: str) -> bool:
    """Upload a ``save_pretrained`` export to the HF Hub (reference
    train.py:412-413 ``model.push_to_hub``). Returns True on success; callers
    keep the local export either way."""
    try:
        from huggingface_hub import HfApi

        api = HfApi()
        api.create_repo(repo_id=repo_id, exist_ok=True)
        api.upload_folder(repo_id=repo_id, folder_path=export_dir)
        return True
    except Exception as e:
        print(f"Hub push to {repo_id!r} failed ({type(e).__name__}: {e}); "
              f"checkpoint remains exported at {export_dir}")
        return False


def from_pretrained(
    model_dir: str,
    config: Optional[ScOTConfig] = None,
    ignore_mismatched_sizes: bool = False,
    dtype=None,
):
    """Load a reference PyTorch checkpoint into a Flax ScOT.

    ``model_dir`` may be a local directory or a HF Hub repo id
    ("camlab-ethz/Poseidon-{T,B,L}", reference README.md:27-33).

    Mirrors ``ScOT.from_pretrained(path, config=new_config,
    ignore_mismatched_sizes=True)`` (reference train.py:330-335): with a new
    config whose in/out channels differ, the embedding/patch-recovery tensors
    that no longer fit keep their freshly initialized values (to be trained
    with the dedicated ``embeddings`` learning-rate group).

    Returns: (model, variables, replaced_names)
    """
    import jax.numpy as jnp

    from .models.scot import ScOT

    model_dir = resolve_model_path(model_dir)
    cfg = config if config is not None else load_config(model_dir)
    model = ScOT(config=cfg, dtype=dtype or jnp.float32)

    sd = load_torch_state_dict(model_dir)
    src_cfg = load_config(model_dir) if config is not None else cfg
    # Convert with the SOURCE channel shapes, then overlay onto target init.
    conv_cfg = cfg.replace(num_channels=src_cfg.num_channels,
                           num_out_channels=src_cfg.num_out_channels)
    loaded = convert_torch_state_dict(sd, conv_cfg)

    ex_x = np.zeros((1, cfg.num_channels, cfg.image_size, cfg.image_size), np.float32)
    ex_t = np.zeros((1,), np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ex_x), jnp.asarray(ex_t))

    replaced: list = []
    params = _merge_with_init(loaded, jax.tree.map(np.asarray, variables["params"]), replaced)
    if replaced and not ignore_mismatched_sizes:
        raise ValueError(
            "Checkpoint/config mismatch for: " + ", ".join(replaced)
            + " — pass ignore_mismatched_sizes=True to re-initialize them.")
    new_vars = dict(variables)
    new_vars["params"] = jax.tree.map(jnp.asarray, params)
    bs = convert_torch_batch_stats(sd, cfg)
    if bs is not None and "batch_stats" in variables:
        new_vars["batch_stats"] = jax.tree.map(
            jnp.asarray, _merge_with_init(bs, jax.tree.map(np.asarray, variables["batch_stats"]), []))
    return model, new_vars, replaced
