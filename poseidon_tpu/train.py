"""Training / finetuning CLI.

Capability mirror of /root/reference/scOT/train.py: YAML/JSON config with the
same key set (dataset, num_trajectories, model_name or explicit architecture
keys, lr, lr_embedding_recovery, lr_time_embedding, weight_decay,
lr_scheduler, warmup_ratio, early_stopping_patience, num_epochs, batch_size,
max_grad_norm), MODEL_MAP named sizes, dataset-shape-derived model config,
finetuning with embedding/recovery replacement, and the post-training test
protocol (direct + autoregressive, in/out-of-distribution).

Usage:
    python -m poseidon_tpu.train --config configs/run.yaml \
        --data_path /data --checkpoint_path /ckpts
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

# Reference scOT/train.py:16 — avoid HDF5 file-locking contention across
# loader threads / training processes.
os.environ.setdefault("HDF5_USE_FILE_LOCKING", "FALSE")

import jax
import numpy as np

from .config import MODEL_MAP, ScOTConfig
from .data.base import BaseTimeDataset, ConcatDataset, TimeWrapper
from .data.registry import get_dataset
from .metrics import ChannelGroupMetrics
from .models.scot import ScOT
from .parallel.host import broadcast_object, is_primary
from .training import Trainer, TrainingArguments
from .utils.params import get_num_parameters, get_num_parameters_no_embed

SEED = 0


def read_cli(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    """Shared CLI flags (mirror of reference utils.py:4-82)."""
    parser.add_argument("--config", type=str, required=True,
                        help="Path to YAML/JSON config file or a JSON string")
    parser.add_argument("--json_config", action="store_true",
                        help="Whether --config is a JSON string")
    parser.add_argument("--wandb_run_name", type=str, default=None)
    parser.add_argument("--wandb_project_name", type=str, default="scOT")
    parser.add_argument("--max_num_train_time_steps", type=int, default=None)
    parser.add_argument("--train_time_step_size", type=int, default=None)
    parser.add_argument("--train_small_time_transition", action="store_true",
                        help="Train only next-step transitions")
    parser.add_argument("--data_path", type=str, required=True)
    parser.add_argument("--checkpoint_path", type=str, required=True)
    parser.add_argument("--disable_tqdm", action="store_true")
    parser.add_argument("--push_to_hf_hub", type=str, default=None)
    parser.add_argument("--just_velocities", action="store_true")
    parser.add_argument("--move_data", type=str, default=None)
    return parser


_SCI_FLOAT = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+$")


def _coerce_sci(v):
    """pyyaml implements YAML 1.1, whose float regex requires a decimal
    point before the exponent — ``1e-6`` (valid YAML 1.2, and what
    json.dump emits for small floats) silently loads as a STRING and later
    crashes the optimizer with a bewildering TypeError. Coerce such
    strings back to float."""
    if isinstance(v, str) and _SCI_FLOAT.match(v):
        return float(v)
    return v


def load_config(params) -> dict:
    if params.json_config:
        return json.loads(params.config)
    with open(params.config) as f:
        if params.config.endswith(".json"):
            raw = json.load(f)
        else:
            import yaml

            raw = yaml.safe_load(f)
    # Accept W&B-style {key: {value: ...}} nesting.
    return {k: _coerce_sci(v["value"] if isinstance(v, dict)
                           and set(v) == {"value"} else v)
            for k, v in raw.items()}


def build_model_config(config: dict, dataset, time_involved: bool) -> ScOTConfig:
    """Dataset-shape-derived model config (reference train.py:247-275)."""
    return ScOTConfig(
        image_size=dataset.resolution,
        patch_size=config["patch_size"],
        num_channels=dataset.input_dim,
        num_out_channels=dataset.output_dim,
        embed_dim=config["embed_dim"],
        depths=tuple(config["depths"]),
        num_heads=tuple(config["num_heads"]),
        skip_connections=tuple(config["skip_connections"]),
        window_size=config["window_size"],
        mlp_ratio=config["mlp_ratio"],
        qkv_bias=True,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0,
        hidden_act="gelu",
        use_absolute_embeddings=False,
        initializer_range=0.02,
        layer_norm_eps=1e-5,
        p=1,
        channel_slice_list_normalized_loss=tuple(dataset.channel_slice_list),
        residual_model="convnext",
        use_conditioning=time_involved,
        learn_residual=False,
        # TPU performance knobs — settable from the YAML/JSON config (the
        # production fast path is attention_impl=pallas + bf16 scores).
        attention_impl=config.get("attention_impl", "xla"),
        score_dtype=config.get("score_dtype", "float32"),
        scan_blocks=bool(config.get("scan_blocks", False)),
    )


def setup_datasets(config: dict, params):
    """Train/val datasets with the CLI's time-restriction flags."""
    kwargs = {}
    if params.just_velocities and "incompressible" in str(config["dataset"]):
        kwargs["just_velocities"] = True
    if params.move_data is not None:
        kwargs["move_to_local_scratch"] = params.move_data
    if params.max_num_train_time_steps is not None:
        kwargs["max_num_time_steps"] = params.max_num_train_time_steps
    if params.train_time_step_size is not None:
        kwargs["time_step_size"] = params.train_time_step_size
    if params.train_small_time_transition:
        kwargs["allowed_time_transitions"] = [1]

    train_ds = get_dataset(config["dataset"], which="train",
                           num_trajectories=config["num_trajectories"],
                           data_path=params.data_path, **kwargs)
    val_ds = get_dataset(config["dataset"], which="val",
                         num_trajectories=config["num_trajectories"],
                         data_path=params.data_path, **kwargs)
    return train_ds, val_ds


def is_time_involved(dataset) -> bool:
    return isinstance(dataset, BaseTimeDataset) or (
        isinstance(dataset, ConcatDataset)
        and isinstance(dataset.datasets[0], BaseTimeDataset))


def wandb_setup(params, config: dict):
    """Rank-0 W&B init with config mirroring (reference train.py:128-150).

    Returns ``(run, sweep_id, run_name)``. Degrades gracefully when W&B is
    unavailable/offline: the ``WANDB_SWEEP_ID`` environment variable (which a
    ``wandb agent`` exports to its workers) stands in for ``run.sweep_id`` so
    the sweep-aware checkpoint layout still works, and the run name falls back
    to ``--wandb_run_name`` or a timestamp."""
    import time as _time

    run = None
    sweep_id = os.environ.get("WANDB_SWEEP_ID") or None
    if is_primary() and (params.wandb_run_name is not None or sweep_id):
        try:
            import wandb

            run = wandb.init(project=params.wandb_project_name,
                             name=params.wandb_run_name, config=config)
        except Exception as e:  # offline container / no credentials
            print(f"wandb.init failed ({e}); continuing with jsonl logging")
    if run is not None:
        if getattr(run, "sweep_id", None):
            sweep_id = run.sweep_id
        run_name = run.name or params.wandb_run_name
    else:
        run_name = params.wandb_run_name
    run_name = run_name or _time.strftime("run-%Y%m%d-%H%M%S")
    return run, sweep_id, run_name


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train (or finetune) scOT on TPU.")
    parser = read_cli(parser)
    parser.add_argument("--finetune_from", type=str, default=None,
                        help="Path to a pretrained checkpoint dir (HF layout)")
    parser.add_argument("--replace_embedding_recovery", action="store_true",
                        help="Replace embeddings/recovery when channels differ")
    parser.add_argument("--resume_training", action="store_true")
    params = parser.parse_args(argv)

    # Persistent XLA compilation cache: a warm second process skips the
    # multi-minute remote compile (measured 112 s cold -> 34.6 s warm,
    # BASELINE.md round-4). The reference is eager torch and pays no compile
    # at all (train.py:409) — closing startup latency is parity work.
    from .utils.init import enable_compilation_cache

    enable_compilation_cache()

    np.random.seed(SEED)
    config = load_config(params)
    run, sweep_id, run_name = wandb_setup(params, config)
    if "model_name" in config:
        # MODEL_MAP merge + W&B config mirror (reference train.py:171-177).
        # An unknown name must fail loudly — silently skipping the merge
        # would train whatever stale dims the config happens to carry.
        if config["model_name"] not in MODEL_MAP:
            raise KeyError(
                f"unknown model_name {config['model_name']!r}; "
                f"expected one of {sorted(MODEL_MAP)}")
        config = {**config, **MODEL_MAP[config["model_name"]]}
        if run is not None:
            run.config.update(MODEL_MAP[config["model_name"]],
                              allow_val_change=True)

    # Checkpoint dir convention <ckpt>/<project>/[<sweep_id>/]<run>
    # (reference train.py:152-169) — the sweep segment is what
    # inference.py's eval_sweep walks.
    parts = [params.checkpoint_path, params.wandb_project_name]
    if sweep_id:
        parts.append(sweep_id)
    parts.append(run_name)
    ckpt_dir = broadcast_object(os.path.join(*parts))
    os.makedirs(ckpt_dir, exist_ok=True)

    train_ds, val_ds = setup_datasets(config, params)
    time_involved = is_time_involved(train_ds)

    if params.finetune_from is not None and not params.replace_embedding_recovery:
        # Reference semantics (train.py:273-275, 330-335): WITHOUT
        # --replace_embedding_recovery the checkpoint's OWN config is used
        # verbatim (the reference passes config=None to from_pretrained) —
        # no dataset-shaped surgery; a channel mismatch with the dataset
        # fails loudly downstream instead of silently re-initializing the
        # embedding/recovery tensors. Only the TPU execution knobs (which
        # never change the computed function or — except scan_blocks,
        # handled by the hub bridge — the param tree) come from the run
        # config.
        from .hub import load_config as load_ckpt_config
        from .hub import resolve_model_path

        ckpt_cfg = load_ckpt_config(resolve_model_path(params.finetune_from))
        model_config = ckpt_cfg.replace(
            attention_impl=config.get("attention_impl", ckpt_cfg.attention_impl),
            score_dtype=config.get("score_dtype", ckpt_cfg.score_dtype),
            scan_blocks=bool(config.get("scan_blocks", ckpt_cfg.scan_blocks)),
        )
    else:
        model_config = build_model_config(config, train_ds, time_involved)

    # ``batch_size`` in the config is PER-DEVICE, as in the reference
    # (train.py:280 passes it to per_device_train_batch_size under accelerate);
    # the Trainer takes the global batch, so scale by the data-parallel size.
    num_model_shards = int(config.get("num_model_shards", 1))
    dp_size = max(jax.device_count() // num_model_shards, 1)
    global_batch = int(config["batch_size"]) * dp_size

    args = TrainingArguments(
        output_dir=ckpt_dir,
        train_batch_size=global_batch,
        eval_batch_size=global_batch,
        num_model_shards=num_model_shards,
        gradient_checkpointing=bool(config.get("gradient_checkpointing", False)),
        num_train_epochs=config["num_epochs"],
        learning_rate=config["lr"],
        learning_rate_embedding_recovery=(
            None if (params.finetune_from is None or "lr_embedding_recovery" not in config)
            else config["lr_embedding_recovery"]),
        learning_rate_time_embedding=(
            None if (params.finetune_from is None or "lr_time_embedding" not in config)
            else config["lr_time_embedding"]),
        weight_decay=config["weight_decay"],
        lr_scheduler_type=config.get("lr_scheduler", "cosine"),
        warmup_ratio=config.get("warmup_ratio", 0.0),
        max_grad_norm=config.get("max_grad_norm", 1.0),
        compute_dtype=config.get("compute_dtype", "bfloat16"),
        save_steps=config.get("save_steps"),
        early_stopping_patience=config.get("early_stopping_patience"),
        seed=SEED,
        report_to="wandb" if run is not None else "jsonl",
        run_name=run_name,
        resume_from_checkpoint=params.resume_training,
    )

    variables = None
    if params.finetune_from is not None:
        from .hub import from_pretrained

        # ignore_mismatched_sizes only with --replace_embedding_recovery: the
        # no-flag path carries the checkpoint's own config, so any mismatch
        # is a real error and must raise (reference train.py:330-335 passes
        # ignore_mismatched_sizes=True but with config=None there is nothing
        # to mismatch against).
        _, variables, replaced = from_pretrained(
            params.finetune_from, config=model_config,
            ignore_mismatched_sizes=params.replace_embedding_recovery)
        if is_primary() and replaced:
            print(f"Re-initialized {len(replaced)} mismatched tensors "
                  f"(embedding/recovery replacement)")
    model = ScOT(config=model_config, dtype=_dtype(args.compute_dtype),
                 remat=args.gradient_checkpointing)
    if (model_config.scan_blocks and not args.gradient_checkpointing
            and jax.default_backend() in ("tpu", "axon")):
        # Known failure mode: scan_blocks + non-remat backward + optimizer in
        # one jit crashes the TPU compiler (see CLAUDE.md); scan+remat and
        # unrolled configs both compile fine.
        print("WARNING: scan_blocks without gradient_checkpointing is known "
              "to crash the TPU compiler on the full train step; enable "
              "gradient_checkpointing or disable scan_blocks.")

    channel_slices = list(train_ds.channel_slice_list)
    channel_names = list(train_ds.printable_channel_description)

    # Streaming-capable battery: the Trainer evaluates without materializing
    # every prediction on the host (see ChannelGroupMetrics.per_sample).
    metrics_fn = ChannelGroupMetrics(channel_slices, channel_names)

    trainer = Trainer(model, args, train_dataset=train_ds, eval_dataset=val_ds,
                      compute_metrics=metrics_fn, variables=variables)

    if is_primary():
        n = get_num_parameters(trainer.state.params)
        n_no = get_num_parameters_no_embed(trainer.state.params)
        print(f"Model size: {n}")
        print(f"Model size without embeddings: {n_no}")

    trainer.train(resume_from_checkpoint=params.resume_training)
    trainer.save_model(ckpt_dir)

    if params.push_to_hf_hub is not None and is_primary():
        # Reference Hub push (train.py:412-413): export a reference-compatible
        # checkpoint dir, then upload it when Hub credentials/network exist
        # (the local export is kept either way).
        from .hub import push_to_hub, save_pretrained

        export_dir = os.path.join(ckpt_dir, "hub_export")
        save_pretrained(export_dir,
                        jax.tree.map(np.asarray, trainer.state.params),
                        model_config,
                        batch_stats=(jax.tree.map(np.asarray, trainer.state.batch_stats)
                                     if trainer.state.batch_stats is not None else None))
        print(f"Exported Hub-compatible checkpoint to {export_dir}")
        if push_to_hub(params.push_to_hf_hub, export_dir):
            print(f"Pushed to HF Hub repo {params.push_to_hf_hub}")

    # ----- post-training test protocol (reference train.py:415-537) --------
    do_test = (params.max_num_train_time_steps is None
               and params.train_time_step_size is None
               and not params.train_small_time_transition
               and ".time" not in str(config["dataset"]))
    if not do_test:
        return trainer

    test_kwargs = {}
    if params.just_velocities and "incompressible" in str(config["dataset"]):
        test_kwargs["just_velocities"] = True
    if params.move_data is not None:
        test_kwargs["move_to_local_scratch"] = params.move_data
    out_kwargs = dict(test_kwargs)
    if time_involved:
        test_kwargs.update(max_num_time_steps=1, time_step_size=14,
                           allowed_time_transitions=[1])
        out_kwargs.update(max_num_time_steps=1, time_step_size=20,
                          allowed_time_transitions=[1])
    if "RayleighTaylor" in str(config["dataset"]):
        test_kwargs.update(max_num_time_steps=1, time_step_size=7,
                           allowed_time_transitions=[1])
        out_kwargs.update(max_num_time_steps=1, time_step_size=10,
                          allowed_time_transitions=[1])

    test_ds = get_dataset(config["dataset"], which="test",
                          num_trajectories=config["num_trajectories"],
                          data_path=params.data_path, **test_kwargs)
    try:
        out_ds = get_dataset(str(config["dataset"]) + ".out", which="test",
                             num_trajectories=config["num_trajectories"],
                             data_path=params.data_path, **out_kwargs)
    except Exception:
        out_ds = None

    def _plot(pred, prefix):
        # Prediction image grids (reference train.py:483-537): logged to W&B
        # when a run is active, always saved as PNG next to the checkpoints.
        if not is_primary() or pred.predictions.shape[0] < 4:
            return
        try:
            from .utils.plotting import create_predictions_plot

            fname = prefix.strip("/").replace("/", "_") + "_predictions.png"
            create_predictions_plot(
                pred.predictions, pred.label_ids,
                out_path=os.path.join(ckpt_dir, fname),
                wandb_prefix=prefix.strip("/"), seed=SEED)
        except Exception as e:  # plotting must never kill the test protocol
            print(f"prediction plot failed for {prefix}: {e}")

    results = {}
    pred = trainer.predict(test_ds, metric_key_prefix="test/")
    results.update(pred.metrics)
    _plot(pred, "test")
    if out_ds is not None:
        pred = trainer.predict(out_ds, metric_key_prefix="test_out_dist/")
        results.update(pred.metrics)
        _plot(pred, "test_out_dist")
    if time_involved and test_kwargs["time_step_size"] // 2 > 0:
        trainer.set_ar_steps(test_kwargs["time_step_size"] // 2)
        pred = trainer.predict(test_ds, metric_key_prefix="test/ar/")
        results.update(pred.metrics)
        _plot(pred, "test/ar")
        if out_ds is not None:
            trainer.set_ar_steps(out_kwargs["time_step_size"] // 2)
            pred = trainer.predict(out_ds, metric_key_prefix="test_out_dist/ar/")
            results.update(pred.metrics)
            _plot(pred, "test_out_dist/ar")
        trainer.set_ar_steps(None)

    if is_primary():
        trainer.log(results)
        print(json.dumps(results, indent=2, default=float))
    return trainer


def _dtype(name: str):
    import jax.numpy as jnp

    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


if __name__ == "__main__":
    main()
