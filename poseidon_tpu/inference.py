"""Inference / evaluation CLI.

Capability mirror of /root/reference/scOT/inference.py with the same modes:

- ``save_samples``: save n (input, prediction, label) sample triples as .npy
- ``save_samples_sweep``: same across every run of a W&B sweep
- ``eval``: evaluate a model on a test set (direct or AR), append CSV
- ``eval_sweep``: evaluate every run in a W&B sweep
- ``eval_accumulation_error``: per-step error of the AR rollout against
  ground-truth trajectories
- ``eval_resolutions``: evaluate at different input resolutions (the dataset
  spectrally downsamples; the model FFT-resamples back to its native size)

Library helpers (get_trainer / rollout / get_test_set / get_trajectories)
match the reference's import surface (inference.py:35-330).
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import re
from typing import List, Optional

# Reference scOT/train.py:16 — avoid HDF5 file-locking contention.
os.environ.setdefault("HDF5_USE_FILE_LOCKING", "FALSE")

import numpy as np

from .config import ScOTConfig
from .data.registry import get_dataset
from .metrics import lp_error, relative_lp_error
from .models.scot import ScOT
from .training import Trainer, TrainingArguments


# ---------------------------------------------------------------------------
# Library helpers
# ---------------------------------------------------------------------------

def make_compute_metrics(channel_slice_list, printable_channel_description,
                         full_data: bool = False):
    """Relative + absolute L1 stat battery (reference inference.py:76-200).
    ``full_data`` additionally attaches the per-sample error lists
    (``relative_full_data`` / ``full_data`` keys, reference inference.py:140-144).

    Returns a :class:`~poseidon_tpu.metrics.ChannelGroupMetrics` — callable
    like before, and additionally exposing the streaming
    ``per_sample``/``from_samples`` protocol the Trainer uses to evaluate
    large sets without materializing every prediction in host memory."""
    from .metrics import ChannelGroupMetrics

    return ChannelGroupMetrics(channel_slice_list, printable_channel_description,
                               absolute=True, full_data=full_data)


def load_model(model_path: str, dtype=None):
    """Load a model from either a reference-format (PyTorch/HF) dir or this
    framework's native orbax save."""
    native = os.path.join(model_path, "model")
    if os.path.isdir(native):
        import jax
        import orbax.checkpoint as ocp

        with open(os.path.join(model_path, "config.json")) as f:
            cfg = ScOTConfig.from_dict(json.load(f))
        model = ScOT(config=cfg, dtype=dtype)
        import jax.numpy as jnp

        x = jnp.zeros((1, cfg.num_channels, cfg.image_size, cfg.image_size))
        template = jax.jit(model.init)(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(
                os.path.abspath(native),
                item={"params": template["params"],
                      "batch_stats": template.get("batch_stats", {})})
        variables = {"params": restored["params"]}
        if restored.get("batch_stats"):
            variables["batch_stats"] = restored["batch_stats"]
        return model, variables
    from .hub import from_pretrained

    model, variables, _ = from_pretrained(model_path, dtype=dtype)
    return model, variables


def get_trainer(model_path: str, batch_size: int, dataset,
                full_data: bool = False, output_all_steps: bool = False,
                workers: int = 8) -> Trainer:
    """Build an inference-only Trainer around a saved model
    (reference inference.py:35-207)."""
    model, variables = load_model(model_path)
    args = TrainingArguments(
        output_dir="/tmp/poseidon_tpu_inference", train_batch_size=batch_size,
        eval_batch_size=batch_size, num_workers=workers, report_to="none",
        compute_dtype="float32")
    compute_metrics = make_compute_metrics(
        dataset.channel_slice_list, dataset.printable_channel_description, full_data)
    trainer = Trainer(model, args, eval_dataset=dataset,
                      compute_metrics=compute_metrics, variables=variables)
    if output_all_steps:
        # Remembered until ar_steps is actually set (e.g. by rollout()).
        trainer.set_ar_steps(None, output_all_steps=True)
    return trainer


def rollout(trainer: Trainer, dataset, ar_steps=1, output_all_steps=False):
    """AR rollout over a test set (reference inference.py:210-235)."""
    trainer.set_ar_steps(ar_steps, output_all_steps=output_all_steps)
    out = trainer.predict(dataset, metric_key_prefix="")
    trainer.set_ar_steps(None)
    return out


def get_test_set(dataset_name: str, data_path: str, initial_time: int,
                 final_time: int, num_trajectories: int = -1, **kwargs):
    """Pinned-start single-step test set (reference inference.py:238-271)."""
    return get_dataset(
        dataset_name, which="test", num_trajectories=num_trajectories,
        data_path=data_path, fix_input_to_time_step=initial_time,
        time_step_size=final_time - initial_time, max_num_time_steps=1, **kwargs)


def get_first_n_inputs(dataset, n: int) -> np.ndarray:
    """First n input fields of a dataset (reference inference.py:274-281)."""
    return np.stack([dataset[i]["pixel_values"] for i in range(n)])


def get_trajectories(dataset_name: str, data_path: str, initial_time: int,
                     final_time: int, time_step_size: int,
                     num_trajectories: int = -1, **kwargs):
    """Ground-truth trajectory frames between two times, for accumulation-
    error evaluation (reference inference.py:284-330). Returns
    (inputs (N,C,H,W), trajectory labels (N, steps, C_out, H, W))."""
    steps = list(range(initial_time + time_step_size, final_time + 1, time_step_size))
    sets = [get_test_set(dataset_name, data_path, initial_time, t2,
                         num_trajectories, **kwargs) for t2 in steps]
    n = len(sets[0])
    inputs = np.stack([sets[0][i]["pixel_values"] for i in range(n)])
    labels = np.stack([
        np.stack([s[i]["labels"] for s in sets], axis=0) for i in range(n)])
    return inputs, labels


def append_csv(path: str, row: dict):
    """Cumulative CSV results (reference inference.py:945-950)."""
    exists = os.path.exists(path)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "a", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(row.keys()))
        if not exists:
            writer.writeheader()
        writer.writerow(row)


# ---------------------------------------------------------------------------
# Modes
# ---------------------------------------------------------------------------

def mode_save_samples(params):
    ds = get_test_set(params.dataset, params.data_path,
                      params.initial_time, params.final_time,
                      num_trajectories=-1)
    trainer = get_trainer(params.model_path, params.batch_size, ds)
    if params.ar_steps is not None:
        trainer.set_ar_steps(params.ar_steps)
    out = trainer.predict(ds)
    os.makedirs(params.file, exist_ok=True)
    n = min(params.num_samples, len(out.predictions))
    inputs = np.stack([ds[i]["pixel_values"] for i in range(n)])
    np.save(os.path.join(params.file, "inputs.npy"), inputs)
    np.save(os.path.join(params.file, "predictions.npy"), out.predictions[:n])
    np.save(os.path.join(params.file, "labels.npy"), out.label_ids[:n])
    print(json.dumps(out.metrics, default=float))


def mode_eval(params):
    ds = get_test_set(params.dataset, params.data_path,
                      params.initial_time, params.final_time,
                      num_trajectories=-1)
    trainer = get_trainer(params.model_path, params.batch_size, ds,
                          full_data=getattr(params, "full_data", False))
    if params.ar_steps is not None:
        trainer.set_ar_steps(params.ar_steps)
    # Streamed: metrics only, predictions never gathered to host memory.
    out = trainer.predict(ds, return_predictions=False)
    row = {"model": params.model_path, "dataset": params.dataset,
           "initial_time": params.initial_time, "final_time": params.final_time,
           "ar_steps": params.ar_steps, **out.metrics}
    append_csv(params.file, row)
    print(json.dumps(out.metrics, default=float))


def mode_eval_accumulation_error(params):
    """Per-step AR error vs ground-truth trajectories
    (reference inference.py:725-908)."""
    dt = params.time_step_size or 2
    steps = list(range(params.initial_time + dt, params.final_time + 1, dt))
    ds = get_test_set(params.dataset, params.data_path,
                      params.initial_time, params.final_time,
                      num_trajectories=-1)
    trainer = get_trainer(params.model_path, params.batch_size, ds)
    trainer.set_ar_steps(
        [ (t - params.initial_time) / (params.final_time - params.initial_time)
          for t in steps], output_all_steps=True)
    preds, _, _ = trainer._predict_arrays(ds)  # (N, steps, C, H, W)
    _, traj = get_trajectories(params.dataset, params.data_path,
                               params.initial_time, params.final_time, dt,
                               num_trajectories=-1)
    # Full per-step stat battery (reference inference.py:736-908): every
    # relative+absolute stat per channel group at each rollout step.
    battery = make_compute_metrics(
        ds.channel_slice_list, ds.printable_channel_description,
        full_data=getattr(params, "full_data", False))
    rows = []
    for si, t2 in enumerate(steps):
        row = {"model": params.model_path, "dataset": params.dataset,
               "initial_time": params.initial_time, "final_time": t2,
               **battery(preds[:, si], traj[:, si])}
        rows.append(row)
        append_csv(params.file, row)
    print(json.dumps(rows, default=float))


def mode_eval_resolutions(params):
    """Resolution-generalization eval (reference inference.py:909-943): the
    dataset spectrally downsamples to each resolution, the model FFT-resamples
    internally."""
    results = []
    for res in params.resolutions:
        kwargs = {} if res in (None, 128) else {"resolution": res}
        ds = get_test_set(params.dataset, params.data_path,
                          params.initial_time, params.final_time,
                          num_trajectories=-1, **kwargs)
        trainer = get_trainer(params.model_path, params.batch_size, ds)
        if params.ar_steps is not None:
            trainer.set_ar_steps(params.ar_steps)
        out = trainer.predict(ds, return_predictions=False)
        row = {"model": params.model_path, "dataset": params.dataset,
               "resolution": res, **out.metrics}
        results.append(row)
        append_csv(params.file, row)
    print(json.dumps(results, default=float))


class _LocalRun:
    """Offline stand-in for a wandb.Api run: a run name found on disk."""

    def __init__(self, name, dataset):
        self.name = name
        self.config = {"dataset": dataset} if dataset else {}


def _sweep_runs(params):
    """Runs of a sweep: from the W&B API (reference inference.py:643-655), or
    — offline — from ``--run_names`` / the checkpoint directory listing."""
    if getattr(params, "run_names", None):
        return [_LocalRun(n, params.dataset) for n in params.run_names]
    if params.wandb_entity is None:
        # No API access: every run directory under the sweep checkpoint dir.
        sweep_dir = os.path.join(params.base_checkpoint_dir,
                                 params.wandb_project, params.sweep_id)
        names = sorted(os.listdir(sweep_dir)) if os.path.isdir(sweep_dir) else []
        return [_LocalRun(n, params.dataset) for n in names]
    import wandb

    api = wandb.Api()
    sweep = api.sweep(f"{params.wandb_entity}/{params.wandb_project}/{params.sweep_id}")
    runs = [r for r in sweep.runs
            if params.allow_failed or r.state == "finished"]
    if params.exclude_dataset:
        runs = [r for r in runs if r.config.get("dataset") not in params.exclude_dataset]
    if params.only_dataset:
        runs = [r for r in runs if r.config.get("dataset") in params.only_dataset]
    if params.filter_trajectories:
        runs = [r for r in runs
                if r.config.get("num_trajectories") in params.filter_trajectories]
    return runs


def _resolve_model_path(ckpt_dir: str) -> Optional[str]:
    """The loadable model dir inside a run's checkpoint dir: the dir itself
    for this framework's native saves (``model/`` + config.json), else the
    best candidate subdir — ``best`` if present, then the HIGHEST-step
    ``checkpoint-N`` (numeric, not lexical: checkpoint-1000 must not beat
    checkpoint-2000), with a warning when the choice is ambiguous (the
    reference warns and skips such runs, inference.py:676-693)."""
    if os.path.isdir(os.path.join(ckpt_dir, "model")):
        return ckpt_dir
    dirs = [d for d in os.listdir(ckpt_dir)
            if os.path.isdir(os.path.join(ckpt_dir, d)) and d != "profile"]
    if not dirs:
        return None
    if "best" in dirs:
        pick = "best"
    else:
        def step(d):
            m = re.match(r"checkpoint-(\d+)$", d)
            return int(m.group(1)) if m else -1
        pick = max(sorted(dirs), key=step)
    if len(dirs) > 1:
        print(f"WARNING: more than one checkpoint in {ckpt_dir}; "
              f"choosing {pick}")
    return os.path.join(ckpt_dir, pick)


def _sweep_iterate(params, fn):
    runs = _sweep_runs(params)
    for run in runs:
        ckpt_dir = os.path.join(params.base_checkpoint_dir, params.wandb_project,
                                params.sweep_id, run.name)
        if not os.path.isdir(ckpt_dir):
            print(f"skip {run.name}: no checkpoint at {ckpt_dir}")
            continue
        model_path = _resolve_model_path(ckpt_dir)
        if model_path is None:
            print(f"skip {run.name}: nothing loadable in {ckpt_dir}")
            continue
        sub = argparse.Namespace(**vars(params))
        sub.model_path = model_path
        sub.dataset = run.config.get("dataset") or params.dataset
        fn(sub)


def main(argv=None):
    # Persistent XLA compilation cache (same as the train CLI): repeated
    # inference invocations — the sweep modes call the model per run — skip
    # the remote compile after the first process.
    from .utils.init import enable_compilation_cache

    enable_compilation_cache()

    parser = argparse.ArgumentParser(
        description="Do different evaluations for a model, see --mode.")
    parser.add_argument("--model_path", type=str, default=None)
    parser.add_argument("--data_path", type=str, required=True)
    parser.add_argument("--dataset", type=str, default=None)
    parser.add_argument("--file", type=str, required=True,
                        help="Output CSV / sample directory")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--initial_time", type=int, default=0)
    parser.add_argument("--final_time", type=int, default=14)
    parser.add_argument("--time_step_size", type=int, default=None)
    parser.add_argument("--ar_steps", type=int, default=None)
    parser.add_argument("--mode", type=str, required=True,
                        choices=["save_samples", "save_samples_sweep", "eval",
                                 "eval_sweep", "eval_accumulation_error",
                                 "eval_resolutions"])
    parser.add_argument("--num_samples", type=int, default=4)
    parser.add_argument("--full_data", action="store_true",
                        help="Attach per-sample error lists to the output "
                             "(reference inference.py:371)")
    parser.add_argument("--resolutions", type=int, nargs="+", default=[32, 64, 96, 128])
    parser.add_argument("--wandb_project", type=str, default=None)
    parser.add_argument("--wandb_entity", type=str, default=None)
    parser.add_argument("--sweep_id", type=str, default=None)
    parser.add_argument("--base_checkpoint_dir", type=str, default=None)
    parser.add_argument("--exclude_dataset", type=str, nargs="+", default=[])
    parser.add_argument("--only_dataset", type=str, nargs="+", default=[])
    parser.add_argument("--allow_failed", action="store_true")
    parser.add_argument("--filter_trajectories", type=int, nargs="+", default=[])
    parser.add_argument("--run_names", type=str, nargs="+", default=[],
                        help="Evaluate these sweep run names directly "
                             "(offline mode: skips the W&B API)")
    params = parser.parse_args(argv)

    if params.mode == "save_samples":
        mode_save_samples(params)
    elif params.mode == "save_samples_sweep":
        _sweep_iterate(params, mode_save_samples)
    elif params.mode == "eval":
        mode_eval(params)
    elif params.mode == "eval_sweep":
        _sweep_iterate(params, mode_eval)
    elif params.mode == "eval_accumulation_error":
        mode_eval_accumulation_error(params)
    elif params.mode == "eval_resolutions":
        mode_eval_resolutions(params)


if __name__ == "__main__":
    main()
