"""Autoregressive rollout as a jitted ``lax.scan``.

Behavioral mirror of the reference Trainer's rollout engine
(/root/reference/scOT/trainer.py:447-603):

- int ``ar_steps`` n: lead time is divided by n and the model is applied n
  times, feeding the (gradient-stopped) output back as the input;
- list ``ar_steps``: per-step time is ``lead_time * step_i``;
- when the model has extra static input channels (num_channels >
  num_out_channels), those channels of the ORIGINAL input are re-attached to
  each fed-back prediction;
- ``output_all_steps`` stacks every intermediate prediction along a new time
  axis (B, n, C_out, H, W).

The reference detaches between steps (trainer.py:489), i.e. gradients do NOT
flow through the rollout — replicated with ``stop_gradient``.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp

StepFn = Callable[[jax.Array, jax.Array], jax.Array]  # (x, time) -> prediction


def _step_times(time: jax.Array, ar_steps: Union[int, Sequence[float]]) -> jax.Array:
    if isinstance(ar_steps, int):
        return jnp.broadcast_to(time / ar_steps, (ar_steps,) + time.shape)
    factors = jnp.asarray(list(ar_steps), dtype=time.dtype)
    return factors[:, None] * time[None, :]


def autoregressive_rollout_stateful(
    step_fn: Callable,
    pixel_values: jax.Array,
    time: jax.Array,
    ar_steps: Union[int, Sequence[float]],
    num_out_channels: int,
    state=None,
):
    """AR rollout whose step carries mutable state (e.g. BatchNorm running
    stats) and receives the step index (for per-step dropout rngs).

    ``step_fn(x, time, step_index, state) -> (prediction, new_state)`` — the
    reference runs every rollout step in train mode during AR training
    (trainer.py:468-503), so dropout/drop-path fire and BN stats update
    sequentially across steps.

    Returns ``(all_predictions (B, n, C_out, H, W), final_state)``.
    """
    c_in = pixel_values.shape[1]
    has_static = c_in > num_out_channels
    static = pixel_values[:, num_out_channels:] if has_static else None
    step_times = _step_times(time, ar_steps)
    n = step_times.shape[0]

    def body(carry, xs):
        x, st = carry
        t, i = xs
        pred, st = step_fn(x, t, i, st)
        # Detach only the FED-BACK input (reference trainer.py:489): per-step
        # losses keep gradients through their own forward, nothing crosses steps.
        fed = jax.lax.stop_gradient(pred)
        nxt = jnp.concatenate([fed, static], axis=1) if has_static else fed
        return (nxt, st), pred

    (_, final_state), stacked = jax.lax.scan(
        body, (pixel_values, state), (step_times, jnp.arange(n)))
    return jnp.swapaxes(stacked, 0, 1), final_state


def autoregressive_rollout(
    step_fn: StepFn,
    pixel_values: jax.Array,
    time: jax.Array,
    ar_steps: Union[int, Sequence[float]],
    num_out_channels: int,
    output_all_steps: bool = False,
) -> jax.Array:
    """Run the AR rollout. Returns the final prediction (B, C_out, H, W), or
    all intermediate predictions (B, n, C_out, H, W) if output_all_steps."""
    c_in = pixel_values.shape[1]
    has_static = c_in > num_out_channels
    static = pixel_values[:, num_out_channels:] if has_static else None

    step_times = _step_times(time, ar_steps)

    def body(carry, t):
        pred = step_fn(carry, t)
        # The reference detaches only the FED-BACK input (trainer.py:489):
        # per-step losses still get gradients through that step's forward,
        # but nothing flows across steps.
        fed = jax.lax.stop_gradient(pred)
        nxt = jnp.concatenate([fed, static], axis=1) if has_static else fed
        return nxt, pred if output_all_steps else pred[:, :num_out_channels]

    final, stacked = jax.lax.scan(body, pixel_values, step_times)
    if output_all_steps:
        return jnp.swapaxes(stacked, 0, 1)  # (n, B, ...) -> (B, n, ...)
    return stacked[-1]


def rollout_with_intermediates(
    model,
    variables,
    pixel_values: jax.Array,
    time: jax.Array,
    ar_steps: Union[int, Sequence[float]],
    **apply_kwargs,
):
    """AR rollout that also stacks every step's hidden states and attention
    probabilities along a new time axis (axis 1), mirroring the reference's
    ``output_all_steps`` surface (/root/reference/scOT/trainer.py:576-592:
    ``hidden_states_`` / ``attentions_`` are zipped across steps and each
    leaf stacked at dim 1).

    Runs an eager Python loop (one jittable forward per step) — this is an
    inspection/evaluation surface, not a training path. Returns
    ``(predictions (B, n, C_out, H, W), hidden_states, attentions)`` where
    the latter two are lists with one (B, n, ...) array per layer.
    """
    from ..models.scot import forward_with_intermediates

    num_out = model.config.num_out_channels
    c_in = pixel_values.shape[1]
    static = pixel_values[:, num_out:] if c_in > num_out else None
    step_times = _step_times(time, ar_steps)

    preds, hs_steps, attn_steps = [], [], []
    x = pixel_values
    for i in range(step_times.shape[0]):
        pred, hs, attn = forward_with_intermediates(
            model, variables, x, step_times[i], **apply_kwargs)
        preds.append(pred)
        hs_steps.append(hs)
        attn_steps.append(attn)
        fed = jax.lax.stop_gradient(pred)
        x = jnp.concatenate([fed, static], axis=1) if static is not None else fed

    stack = lambda per_step: [jnp.stack(layer, axis=1) for layer in zip(*per_step)]
    return jnp.stack(preds, axis=1), stack(hs_steps), stack(attn_steps)


def rollout_loss(
    step_fn: StepFn,
    loss_fn: Callable[[jax.Array, jax.Array], jax.Array],
    pixel_values: jax.Array,
    time: jax.Array,
    labels: jax.Array,
    ar_steps: Union[int, Sequence[float]],
    num_out_channels: int,
):
    """Mean of per-step losses against the (final) labels, as the reference
    accumulates during AR prediction (trainer.py:468-523). Returns
    (loss, final_prediction)."""
    preds = autoregressive_rollout(
        step_fn, pixel_values, time, ar_steps, num_out_channels,
        output_all_steps=True)
    n = preds.shape[1]
    losses = [loss_fn(preds[:, i], labels) for i in range(n)]
    return jnp.mean(jnp.stack(losses)), preds[:, -1]
