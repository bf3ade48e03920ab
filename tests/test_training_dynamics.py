"""Training-DYNAMICS parity vs the PyTorch reference (VERDICT r2 item 6).

Forward parity is covered by test_parity(_full).py; this test compares the
integrated optimizer behavior — AdamW with the reference's decay/no-decay
param grouping, cosine schedule, global-norm clipping — over 200 real
training steps from the SAME bridged initial weights on the SAME synthetic
batch sequence, mirroring the reference loop semantics exactly:
HF Trainer step order is clip -> AdamW(0.9, 0.999, 1e-8) -> cosine LR
(reference trainer.py:295-420, train.py:276-301; optimizer grouping branch
with neither extra LR set).

Marked slow: ~200 fwd+bwd steps in BOTH frameworks on CPU.
"""

import math
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

try:
    from scOT.model import ScOT as TorchScOT  # noqa: F401
    HAVE_REF = True
except Exception:  # pragma: no cover
    HAVE_REF = False

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not HAVE_REF, reason="reference model unavailable"),
]

import jax
import jax.numpy as jnp

from poseidon_tpu import scot_loss
from poseidon_tpu.models.scot import apply_pixel_mask  # noqa: F401
from poseidon_tpu.training.optimizer import build_optimizer

from test_parity import build_pair

STEPS = 200
BATCH = 8
LR = 1e-3
WD = 1e-6
CLIP = 1.0


def _decay_parameter_names(model) -> set:
    """HF get_decay_parameter_names semantics: every param except biases and
    params owned by LayerNorm instances (transformers/trainer.py)."""
    norm_owned = set()
    for mod_name, mod in model.named_modules():
        if isinstance(mod, torch.nn.LayerNorm):
            for pn, _ in mod.named_parameters(recurse=False):
                norm_owned.add(f"{mod_name}.{pn}" if mod_name else pn)
    return {
        n for n, p in model.named_parameters()
        if n not in norm_owned and "bias" not in n
    }


def _cosine_lambda(step: int) -> float:
    # HF get_scheduler("cosine"), 0 warmup: 0.5*(1+cos(pi*progress)).
    progress = step / STEPS
    return max(0.0, 0.5 * (1.0 + math.cos(math.pi * progress)))


def _make_batches(num_channels, image_size):
    rng = np.random.default_rng(7)
    batches = []
    for _ in range(STEPS + 1):  # +1 held-out eval batch
        x = rng.normal(size=(BATCH, num_channels, image_size, image_size)).astype(np.float32)
        t = rng.uniform(0.1, 1.0, size=(BATCH,)).astype(np.float32)
        y = (x[:, :2] * np.exp(-t)[:, None, None, None]).astype(np.float32)
        batches.append((x, t, y))
    return batches


class TestTrainingDynamics:
    def test_200_step_loss_curves_match(self):
        tmodel, jmodel, variables, tcfg, jcfg = build_pair()
        num_channels, image_size = 3, 32
        batches = _make_batches(num_channels, image_size)

        # ---- torch reference loop (HF semantics, no HF Trainer) ----------
        tmodel.train()
        decay = _decay_parameter_names(tmodel)
        groups = [
            {"params": [p for n, p in tmodel.named_parameters() if n in decay],
             "weight_decay": WD},
            {"params": [p for n, p in tmodel.named_parameters() if n not in decay],
             "weight_decay": 0.0},
        ]
        opt = torch.optim.AdamW(groups, lr=LR, betas=(0.9, 0.999), eps=1e-8)
        sched = torch.optim.lr_scheduler.LambdaLR(opt, _cosine_lambda)
        t_losses = []
        for x, t, y in batches[:STEPS]:
            out = tmodel(pixel_values=torch.from_numpy(x),
                         time=torch.from_numpy(t),
                         labels=torch.from_numpy(y))
            out.loss.backward()
            torch.nn.utils.clip_grad_norm_(tmodel.parameters(), CLIP)
            opt.step()
            sched.step()
            opt.zero_grad(set_to_none=True)
            t_losses.append(float(out.loss.detach()))

        # ---- jax loop (build_optimizer: same groups/schedule/clip) -------
        params = variables["params"]
        tx = build_optimizer(
            params, learning_rate=LR, total_steps=STEPS, weight_decay=WD,
            lr_scheduler_type="cosine", warmup_ratio=0.0, max_grad_norm=CLIP)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, x, t, y):
            def loss_fn(p):
                pred = jmodel.apply({"params": p}, x, t)
                return scot_loss(pred, y, jcfg)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            import optax

            return optax.apply_updates(params, updates), opt_state, loss

        j_losses = []
        for x, t, y in batches[:STEPS]:
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(x), jnp.asarray(t), jnp.asarray(y))
            j_losses.append(float(loss))

        t_losses = np.asarray(t_losses)
        j_losses = np.asarray(j_losses)

        # Early steps: tight agreement (same weights, same batches).
        np.testing.assert_allclose(j_losses[:10], t_losses[:10], rtol=2e-4)
        # Whole curve: fp32 accumulation-order drift only.
        np.testing.assert_allclose(j_losses, t_losses, rtol=2e-2)
        # Training must actually have worked in both. (The normalized-L1
        # loss starts at ~1.0 = "predicting zeros"; 200 steps at batch 8
        # measurably learn but don't halve it — the reference run lands at
        # ~0.90. Require a clear monotone-ish improvement, not a magic 2x.)
        assert t_losses[-1] < 0.95 * t_losses[0]
        assert j_losses[-1] < 0.95 * j_losses[0]
        # Final-loss agreement (the number PARITY.md records).
        rel = abs(j_losses[-1] - t_losses[-1]) / t_losses[-1]
        assert rel < 5e-3, f"final losses diverged: {t_losses[-1]} vs {j_losses[-1]}"

        # Held-out eval: median relative-L1 through both stacks agree.
        from poseidon_tpu.metrics import relative_lp_error

        x, t, y = batches[-1]
        with torch.no_grad():
            tmodel.eval()
            tpred = tmodel(pixel_values=torch.from_numpy(x),
                           time=torch.from_numpy(t)).output.numpy()
        jpred = np.asarray(jmodel.apply({"params": params}, jnp.asarray(x),
                                        jnp.asarray(t)))
        terr = float(np.median(relative_lp_error(tpred, y, p=1)))
        jerr = float(np.median(relative_lp_error(jpred, y, p=1)))
        assert abs(terr - jerr) / terr < 2e-2, (terr, jerr)
        print(f"dynamics parity: torch final loss {t_losses[-1]:.6f}, "
              f"jax {j_losses[-1]:.6f}, rel {rel:.2e}; "
              f"held-out median relL1 torch {terr:.4f} jax {jerr:.4f}")


@pytest.mark.slow
class TestARTrainingDynamics:
    """AR-mode training dynamics parity (VERDICT r3 item 5): the reference
    routes TRAINING through ``_model_forward`` whenever ``ar_steps`` is set
    (/root/reference/scOT/trainer.py:452-523) — int mode divides the lead
    time by n and feeds each (detached) prediction back with the static
    input channels re-attached; list mode runs per-step time
    ``lead_time * step_i``; loss is the MEAN of per-step losses against the
    final labels. The JAX side here is the PRODUCTION code path:
    ``Trainer._train_step`` with ``set_ar_steps`` (the lax.scan rollout),
    not a re-implementation."""

    AR_STEPS_INT = 2
    N = 100  # 2 forwards/step in both frameworks ~= the 200-step direct test

    def _torch_ar_loop(self, tmodel, batches, ar_steps, n_steps):
        tmodel.train()
        decay = _decay_parameter_names(tmodel)
        groups = [
            {"params": [p for n, p in tmodel.named_parameters() if n in decay],
             "weight_decay": WD},
            {"params": [p for n, p in tmodel.named_parameters() if n not in decay],
             "weight_decay": 0.0},
        ]
        opt = torch.optim.AdamW(groups, lr=LR, betas=(0.9, 0.999), eps=1e-8)
        sched = torch.optim.lr_scheduler.LambdaLR(
            opt, lambda s: max(0.0, 0.5 * (1.0 + math.cos(math.pi * s / n_steps))))
        num_out = tmodel.config.num_out_channels
        losses = []
        for x, t, y in batches[:n_steps]:
            pv = torch.from_numpy(x)
            labels = torch.from_numpy(y)
            lead = torch.from_numpy(t)
            if isinstance(ar_steps, int):
                times = [lead / ar_steps] * ar_steps
            else:
                times = [lead * s for s in ar_steps]
            loss = 0
            for time_i in times:
                out = tmodel(pixel_values=pv, time=time_i, labels=labels)
                loss = loss + out.loss
                # detached feedback + static-channel re-attach
                # (reference trainer.py:485-501)
                pv = torch.cat(
                    [out.output.detach(), torch.from_numpy(x)[:, num_out:]],
                    dim=1)
            loss = loss / len(times)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(tmodel.parameters(), CLIP)
            opt.step()
            sched.step()
            opt.zero_grad(set_to_none=True)
            losses.append(float(loss.detach()))
        return np.asarray(losses)

    def _jax_ar_loop(self, jmodel, variables, batches, ar_steps, n_steps,
                     tmp_path):
        import jax
        import jax.numpy as jnp

        from poseidon_tpu.training import Trainer, TrainingArguments

        batch_size = batches[0][0].shape[0]

        class _SizedDS:  # only len() feeds the schedule's total_steps
            def __len__(self):
                return n_steps * batch_size

        args = TrainingArguments(
            output_dir=str(tmp_path), train_batch_size=batch_size,
            eval_batch_size=batch_size, num_train_epochs=1,
            learning_rate=LR, weight_decay=WD, max_grad_norm=CLIP,
            lr_scheduler_type="cosine", warmup_ratio=0.0,
            compute_dtype="float32", report_to="none")
        trainer = Trainer(jmodel, args, train_dataset=_SizedDS(),
                          variables=variables)
        trainer.set_ar_steps(ar_steps)
        step = trainer._jitted("train", trainer._train_step)
        state = trainer.state
        rng = jax.random.PRNGKey(0)  # all dropout rates are 0
        losses = []
        for x, t, y in batches[:n_steps]:
            batch = {"pixel_values": jnp.asarray(x), "time": jnp.asarray(t),
                     "labels": jnp.asarray(y)}
            state, metrics = step(state, batch, rng)
            losses.append(float(metrics["loss"]))
        return np.asarray(losses)

    def _run(self, ar_steps, tmp_path, n_steps):
        tmodel, jmodel, variables, _tcfg, _jcfg = build_pair()
        batches = _make_batches(3, 32)
        t_losses = self._torch_ar_loop(tmodel, batches, ar_steps, n_steps)
        j_losses = self._jax_ar_loop(jmodel, variables, batches, ar_steps,
                                     n_steps, tmp_path)
        np.testing.assert_allclose(j_losses[:10], t_losses[:10], rtol=2e-4)
        np.testing.assert_allclose(j_losses, t_losses, rtol=2e-2)
        rel = abs(j_losses[-1] - t_losses[-1]) / t_losses[-1]
        assert rel < 5e-3, f"final losses diverged: {t_losses[-1]} vs {j_losses[-1]}"
        print(f"AR({ar_steps}) dynamics parity: torch final "
              f"{t_losses[-1]:.6f}, jax {j_losses[-1]:.6f}, rel {rel:.2e}")

    def test_ar_int_mode(self, tmp_path):
        self._run(self.AR_STEPS_INT, tmp_path, self.N)

    def test_ar_list_mode(self, tmp_path):
        self._run([0.5, 1.0], tmp_path, 50)
