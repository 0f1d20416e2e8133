"""The hot loop: jitted train/eval steps + epoch drivers.

TPU-native replacement of reference engine.py:20-117. One jitted ``train_step``
does H2D-batched uint8 augmentation, bf16 forward, loss, backward, and the
optimizer update in a single XLA program (donated state, no GradScaler — bf16
keeps fp32 range). Gradient all-reduce over the mesh's ``data`` axis is inserted
by XLA when the batch is sharded and params are replicated.

Per-iteration metrics (softmax confidences, argmax predictions, ground truth,
loss) are returned as DEVICE arrays and collected lazily — the epoch never
blocks on a D2H sync (the reference syncs every iteration via ``.item()`` /
``.cpu().tolist()``, logging.py:261-281); numpy conversion happens once at epoch
end, preserving the exact per-sample values sklearn metrics need.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nkbx.train.optim import (
    OptimizerBundle,
    apply_coupled_wd,
    mask_frozen_grads,
    scale_updates,
    select_frozen_opt_state,
)
from nkbx.train.state import TrainState


def _iter_metrics(preds, label, mask, loss_out):
    """Per-batch metric payload mirroring BaseLogger.log_iter (logging.py:261-281)."""
    if isinstance(preds, dict):
        out = {
            t: {
                "confidences": jax.nn.softmax(preds[t].astype(jnp.float32), axis=-1),
                "predictions": jnp.argmax(preds[t], axis=-1),
                "ground_truth": label[t],
                "loss": loss_out[t],
            }
            for t in preds
        }
        out["loss"] = loss_out["loss"]
        out["mask"] = mask
        return out
    return {
        "confidences": jax.nn.softmax(preds.astype(jnp.float32), axis=-1),
        "predictions": jnp.argmax(preds, axis=-1),
        "ground_truth": label,
        "loss": loss_out,
        "mask": mask,
    }


def _bind_augment(module, augment_fn, train: bool):
    """Augment callable that emits the backbone's compute dtype directly.

    The fused normalize then writes ONE bf16 tensor instead of a float32
    round-trip through HBM (the conv would cast to bf16 anyway — same values).
    Augment fns without an ``out_dtype`` kwarg keep the plain 3-arg contract.
    """
    if augment_fn is None:
        return lambda image, key: image
    out_dtype = getattr(getattr(module, "backbone", None), "dtype", None)
    takes_dtype = False
    if out_dtype is not None:
        import inspect

        try:
            takes_dtype = "out_dtype" in inspect.signature(augment_fn).parameters
        except (TypeError, ValueError):  # builtins / odd callables
            takes_dtype = False
    if takes_dtype:
        return lambda image, key: augment_fn(image, key, train, out_dtype=out_dtype)
    return lambda image, key: augment_fn(image, key, train)


def build_train_step(model, criterion, bundle: OptimizerBundle, augment_fn=None,
                     log_gradients: bool = False, masked_bn: bool = False,
                     scan_steps: int = 1, grad_accum_steps: int = 1,
                     ema_decay: float = 0.0, mixup: dict | None = None,
                     freeze_semantics: str = "decay"):
    """Returns jitted (state, image_u8, label, mask, key, lr_factor, freeze_scale)
    -> (state, metrics).

    ``freeze_semantics`` governs the optimizer moments while the backbone is
    frozen (``freeze_scale=0``): ``"decay"`` (default) feeds zero gradients,
    so Adam moments decay toward zero during the freeze; ``"torch"``
    reproduces torch exactly — frozen params are skipped, their moments and
    bias-correction step count stay stale until unfreeze (reference
    model.py:59-64 requires_grad semantics). Both are one compiled program
    across freeze/unfreeze flips.

    ``masked_bn=True`` weights padded batch rows out of BatchNorm batch
    statistics (use when the loader may pad, i.e. ``drop_last=False``): the
    per-channel mean/var then equal the stats over only the valid rows, so a
    partial final batch trains exactly like a smaller batch would.

    ``scan_steps > 1`` returns a MULTI-STEP program: image/label/mask carry a
    leading (K,) dim and ``lax.scan`` runs K identical train steps in ONE
    device dispatch (metrics come back stacked (K, ...)). Per-step semantics
    are unchanged — the PRNG folds in ``state.step`` inside the body — but the
    per-dispatch host round trip is paid once per K steps, which matters on
    remote-hosted/tunneled TPUs (~1 ms/step on the dev chip, PERF.md).

    ``grad_accum_steps > 1`` splits each batch into A sequential microbatches
    (``lax.scan``): gradients are accumulated (valid-count weighted, so the
    update equals the full-batch gradient) and ONE optimizer update is applied.
    Activation memory scales with B/A — the standard recipe when the target
    batch does not fit in HBM. Caveat (inherent to accumulation, same as
    torch): BatchNorm batch statistics are computed per MICROBATCH (ghost-BN
    semantics), not over the full batch.
    """
    if scan_steps > 1 and grad_accum_steps > 1:
        raise ValueError("steps_per_dispatch and grad_accum_steps are mutually "
                         "exclusive (unvalidated metric-stacking interaction)")
    if freeze_semantics not in ("decay", "torch"):
        raise ValueError(f"freeze_semantics must be 'decay' or 'torch', "
                         f"got {freeze_semantics!r}")
    module = model.module
    augment = _bind_augment(module, augment_fn, train=True)
    inner_mass = getattr(getattr(criterion, "criterion", None), "_mass_fn", None)
    if grad_accum_steps > 1 and inner_mass is not None:
        raise ValueError(
            "multi-task grad_accum_steps with a mass-normalized criterion "
            "(class-weighted CE / focal): per-target normalizers differ per "
            "microbatch and a single per-microbatch weight cannot reproduce "
            "the full-batch gradient (single-task stays exact via "
            "criterion.batch_mass) — use an unweighted loss or no accumulation")
    mix = None
    if mixup is not None:
        from nkbx.train.mixup import build_mixup

        mix = build_mixup(mixup)
        nonuniform_mass = (getattr(criterion, "_mass_fn", None) is not None
                           or inner_mass is not None)
        if grad_accum_steps > 1 and nonuniform_mass:
            raise ValueError(
                "mixup + grad_accum_steps with a mass-normalized criterion "
                "(class-weighted CE / focal): the primary and partner label "
                "masses differ per microbatch, so a single per-microbatch "
                "weight cannot reproduce the full-batch gradient — drop one "
                "of the three (unweighted loss, no accumulation, or no mixup)")

    def _micro_grads(params, batch_stats, x, label, mask, drop_key,
                     label_b=None, lam=None):
        bn_mask = mask.reshape((-1,) + (1,) * (x.ndim - 1)) if masked_bn else None

        def loss_fn(params):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            preds, mutated = module.apply(
                variables, x, train=True, mask=bn_mask,
                rngs={"dropout": drop_key}, mutable=["batch_stats"],
            )
            loss_out = criterion(preds, label, mask=mask)
            if label_b is not None:
                # mixup: lam * loss(labels) + (1-lam) * loss(labels[::-1])
                loss_b = criterion(preds, label_b, mask=mask)
                loss_out = jax.tree_util.tree_map(
                    lambda a, b: lam * a + (1.0 - lam) * b, loss_out, loss_b)
            scalar = loss_out["loss"] if isinstance(loss_out, dict) else loss_out
            return scalar, (preds, mutated.get("batch_stats", {}), loss_out)

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    def train_step(state: TrainState, image, label, mask, key, lr_factor, freeze_scale):
        step_key = jax.random.fold_in(key, state.step)
        if mix is not None:
            aug_key, drop_key, mix_key = jax.random.split(step_key, 3)
        else:
            aug_key, drop_key = jax.random.split(step_key)
        x = augment(image, aug_key)
        label_b = lam = None
        if mix is not None:
            # partner falls back to self where the reversed row is padded
            # (multi-host sentinel padding / drop_last=False), keeping those
            # rows exactly unmixed
            x, lam, partner = mix(x, mix_key, mask)
            label_b = jax.tree_util.tree_map(lambda v: v[partner], label)

        if grad_accum_steps > 1:
            a = grad_accum_steps
            b = x.shape[0]
            if b % a:
                raise ValueError(f"grad_accum_steps={a} must divide batch {b}")

            def split(v):
                return v.reshape((a, b // a) + v.shape[1:])

            xs = split(x)
            ls = jax.tree_util.tree_map(split, label)
            ms = split(mask)
            # mixup pairs row i with row B-1-i of the FULL batch; the flipped
            # labels are split the same way as the images
            lbs = (jax.tree_util.tree_map(split, label_b)
                   if label_b is not None else None)

            def micro(carry, inputs):
                bs, gsum, nsum = carry
                if lbs is not None:
                    i, x_i, l_i, m_i, lb_i = inputs
                else:
                    i, x_i, l_i, m_i = inputs
                    lb_i = None
                (_, (preds, new_bs, loss_out)), g = _micro_grads(
                    state.params, bs, x_i, l_i, m_i, jax.random.fold_in(drop_key, i),
                    label_b=lb_i, lam=lam)
                # the criterion normalizes its mean by batch_mass (class-weight
                # sum for weighted CE, unignored count for focal, valid count
                # otherwise); weighting each microbatch gradient by ITS mass
                # and normalizing by the total reproduces the full-batch mean
                # gradient exactly
                if hasattr(criterion, "batch_mass"):
                    n = criterion.batch_mass(l_i, m_i)
                else:
                    n = m_i.sum().astype(jnp.float32)
                gsum = jax.tree_util.tree_map(lambda s, gi: s + gi * n, gsum, g)
                return (new_bs if new_bs else bs, gsum, nsum + n), \
                    _iter_metrics(preds, l_i, m_i, loss_out)

            init = (state.batch_stats,
                    jax.tree_util.tree_map(jnp.zeros_like, state.params),
                    jnp.asarray(0.0))
            idx = jnp.arange(a)
            inputs = (idx, xs, ls, ms) if lbs is None else (idx, xs, ls, ms, lbs)
            (new_bs, gsum, nsum), metrics = jax.lax.scan(micro, init, inputs)
            grads = jax.tree_util.tree_map(
                lambda g: g / jnp.maximum(nsum, 1e-12), gsum)
            preds = loss_out = None  # metrics already stacked (A, ...)
        else:
            (_, (preds, new_bs, loss_out)), grads = _micro_grads(
                state.params, state.batch_stats, x, label, mask, drop_key,
                label_b=label_b, lam=lam)
            metrics = None

        grads = apply_coupled_wd(grads, state.params, bundle.coupled_wds)
        grads = mask_frozen_grads(grads, freeze_scale)
        updates, new_opt_state = bundle.tx.update(grads, state.opt_state, state.params)
        if freeze_semantics == "torch":
            # torch-exact: while frozen, the backbone group's moments and step
            # count keep their pre-step values (torch skips frozen params)
            new_opt_state = select_frozen_opt_state(
                new_opt_state, state.opt_state, freeze_scale)
        updates = scale_updates(updates, state.params, bundle.lrs, lr_factor, freeze_scale)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        new_ema_bs = state.ema_batch_stats
        if ema_decay > 0 and state.ema_params is not None:
            # torch-timm ModelEmaV2 recursion over the WHOLE model state
            # (params AND BN buffers): e <- d*e + (1-d)*p
            def _ema(e, p):
                return e * ema_decay + p.astype(e.dtype) * (1 - ema_decay)

            new_ema = jax.tree_util.tree_map(_ema, state.ema_params, new_params)
            if new_ema_bs is not None:
                new_ema_bs = jax.tree_util.tree_map(
                    _ema, state.ema_batch_stats,
                    new_bs if new_bs else state.batch_stats)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_bs if new_bs else state.batch_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
            ema_params=new_ema,
            ema_batch_stats=new_ema_bs,
        )
        if metrics is None:
            metrics = _iter_metrics(preds, label, mask, loss_out)
        if log_gradients:
            metrics["grad_norms"] = {
                "/".join(str(getattr(p, "key", p)) for p in path): jnp.linalg.norm(g.astype(jnp.float32))
                for path, g in jax.tree_util.tree_leaves_with_path(grads)
            }
        return new_state, metrics

    if scan_steps > 1:
        def multi_step(state: TrainState, images, labels, masks, key, lr_factor,
                       freeze_scale):
            def body(st, xs):
                im, lb, mk = xs
                return train_step(st, im, lb, mk, key, lr_factor, freeze_scale)

            return jax.lax.scan(body, state, (images, labels, masks))

        jitted = jax.jit(multi_step, donate_argnums=(0,))
    else:
        jitted = jax.jit(train_step, donate_argnums=(0,))
    return _StepFn(jitted, masked_bn=masked_bn, scan_steps=scan_steps)


class _StepFn:
    """Jitted step plus the step-shape config train_epoch must know
    (``scan_steps``: feed K stacked batches per dispatch; ``masked_bn``:
    padding already handled). A wrapper rather than attributes on the
    PjitFunction so the config can never be silently dropped; other jit
    attributes (``lower`` etc.) are forwarded."""

    def __init__(self, fn, masked_bn: bool, scan_steps: int):
        self._fn = fn
        self.masked_bn = masked_bn
        self.scan_steps = scan_steps

    def __call__(self, *args, **kwargs):
        return self._fn(*args, **kwargs)

    def __getattr__(self, name):
        if name == "_fn":  # guard: avoid recursion before __init__ ran
            raise AttributeError(name)
        return getattr(self._fn, name)


def build_predict_fn(model, augment_fn=None):
    """(variables, image_u8) -> logits, dispatching to the serving bundle or
    the jitted module (shared by inference.py and build_eval_step)."""
    if getattr(model, "serving", None) is not None:
        def predict(variables, image):
            x = augment_fn(image, jax.random.PRNGKey(0), False) if augment_fn is not None else image
            return model.serving.forward(np.asarray(x))

        return predict

    module = model.module

    @jax.jit
    def predict(variables, image):
        x = augment_fn(image, jax.random.PRNGKey(0), False) if augment_fn is not None else image
        return module.apply(variables, x, train=False)

    return predict


def build_eval_step(model, criterion, augment_fn=None):
    """Returns jitted (state, image_u8, label, mask) -> metrics (no grads)."""
    module = model.module

    if getattr(model, "serving", None) is not None:
        # exported .nkbx bundle: the serving module jits internally (bucketed
        # dynamic batch), so only augmentation + loss run here
        predict = build_predict_fn(model, augment_fn)

        def eval_step_serving(state: TrainState, image, label, mask):
            preds = predict(None, image)
            loss_out = criterion(preds, label, mask=mask)
            return _iter_metrics(preds, label, mask, loss_out)

        return eval_step_serving

    augment = _bind_augment(module, augment_fn, train=False)

    def eval_step(state: TrainState, image, label, mask):
        x = augment(image, jax.random.PRNGKey(0))
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        preds = module.apply(variables, x, train=False)
        loss_out = criterion(preds, label, mask=mask)
        return _iter_metrics(preds, label, mask, loss_out)

    return jax.jit(eval_step)


# ---------------------------------------------------------------------------
# Epoch collection (BaseLogger-equivalent, device-lazy)
# ---------------------------------------------------------------------------


class EpochCollector:
    """Accumulates per-iter device metrics; converts to host lists at epoch end.

    ``mode="exact"`` (default) retains the per-sample device arrays and
    returns the same dict shape as reference BaseLogger.get_epoch_results
    (logging.py:287-294): running_loss (per-iter floats), confidences,
    predictions, ground_truth — lists (single-task) or per-target dicts
    (multi-task) — with padded rows removed. Memory is O(N*C) per epoch.

    ``mode="bounded"`` folds every batch into O(C^2 + C*N_BINS) device state
    (confusion counts + score histograms, nkbx.metrics bounded_* — SURVEY.md
    §5.5): balanced accuracy is exactly sklearn's, ROC-AUC within ~1/N_BINS.
    Use for ImageNet-scale epochs; config key ``metrics_accumulation``.
    """

    def __init__(self, task: str = "single", mode: str = "exact"):
        if mode not in ("exact", "bounded"):
            raise ValueError(f"Unknown metrics accumulation mode {mode!r}")
        self.task = task
        self.mode = mode
        self.init_iter_logs()

    def init_iter_logs(self):
        self._batches = []
        self._bounded = {}
        self._losses = defaultdict(list)
        self._grad_norms = []
        self.epoch_images_example = None

    def log_iter(self, metrics):
        if self.mode == "bounded":
            self._fold(metrics)
        else:
            self._batches.append(metrics)

    # -- bounded mode ------------------------------------------------------

    _jit_update = None

    @classmethod
    def _update_fn(cls):
        if cls._jit_update is None:
            from nkbx.metrics import bounded_update

            cls._jit_update = jax.jit(bounded_update)
        return cls._jit_update

    def _fold_one(self, key, m, mask):
        from nkbx.metrics import make_bounded_state

        if key not in self._bounded:
            # last dim is n_classes for both (B, C) and scan-stacked (K, B, C)
            self._bounded[key] = make_bounded_state(m["confidences"].shape[-1])
        self._bounded[key] = self._update_fn()(
            self._bounded[key], m["confidences"], m["predictions"],
            m["ground_truth"], mask, m["loss"],
        )
        self._losses[key].append(m["loss"])

    def _fold(self, metrics):
        if "grad_norms" in metrics:
            self._grad_norms.append(metrics["grad_norms"])
        if self.task == "multi":
            for t, tm in metrics.items():
                if isinstance(tm, dict) and "confidences" in tm:
                    self._fold_one(t, tm, metrics["mask"])
            self._losses["loss"].append(metrics["loss"])
        else:
            self._fold_one(None, metrics, metrics["mask"])

    def log_images_if_needed(self, images):
        if self.epoch_images_example is None:
            self.epoch_images_example = np.asarray(images)

    @staticmethod
    def _gather_global(tree):
        """Multi-host: all-gather global sharded leaves; pass local ones through.

        Leaves are grouped by (shape, dtype, sharding) and each group is
        stacked on device and gathered in ONE collective — a per-leaf gather
        would serialize thousands of dispatches at epoch end (one per step per
        metric, ~120 ms each on tunneled backends).
        """
        from jax.experimental import multihost_utils

        leaves, treedef = jax.tree_util.tree_flatten(tree)
        groups: dict = defaultdict(list)
        for i, x in enumerate(leaves):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                groups[(x.shape, x.dtype, x.sharding)].append(i)
        for idxs in groups.values():
            stacked = jnp.stack([leaves[i] for i in idxs])
            gathered = np.asarray(multihost_utils.process_allgather(stacked, tiled=True))
            for j, i in enumerate(idxs):
                leaves[i] = gathered[j]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    @staticmethod
    def _aggregate_grads(grad_logs):
        grad_log = defaultdict(list)
        for g in grad_logs:
            totals = None
            for k, v in g.items():
                vals = np.ravel(np.asarray(v)).tolist()  # scalar or (K,) stacked
                grad_log[f"Gradients/{k}"].extend(vals)
                totals = vals if totals is None else [a + b for a, b in zip(totals, vals)]
            grad_log["Gradients/Total"].extend(totals or [])
        return dict(grad_log)

    def _bounded_results(self):
        from nkbx.metrics import bounded_targetwise_metrics

        payload = {"states": self._bounded, "losses": dict(self._losses),
                   "grads": self._grad_norms}
        if jax.process_count() > 1:
            # folded states are replicated jit outputs (already global);
            # gather is an identity reshard that makes them host-fetchable
            payload = self._gather_global(payload)
        payload = jax.device_get(payload)
        states, losses = payload["states"], payload["losses"]

        def flat_losses(v):
            return [float(f) for x in v for f in np.ravel(np.asarray(x))]

        results = {"images": self.epoch_images_example}
        if self.task == "multi":
            results["running_loss"] = {k: flat_losses(v) for k, v in losses.items()}
            results["bounded_metrics"] = {t: bounded_targetwise_metrics(s)
                                          for t, s in states.items()}
            results["confusion_counts"] = {t: np.asarray(s["counts"])
                                           for t, s in states.items()}
        else:
            results["running_loss"] = flat_losses(losses.get(None, []))
            state = states[None]
            results["bounded_metrics"] = bounded_targetwise_metrics(state)
            results["confusion_counts"] = np.asarray(state["counts"])
        if payload["grads"]:
            results["metrics_grad_log"] = self._aggregate_grads(payload["grads"])
        return results

    def get_epoch_results(self):
        if self.mode == "bounded":
            return self._bounded_results()
        # ONE bulk D2H transfer for the whole epoch's accumulated metrics:
        # per-batch float()/np.asarray() fetches cost a full round trip each
        # (~120 ms on tunneled backends; see CLAUDE.md). On multi-host runs the
        # per-sample arrays are global (sharded across hosts): all-gather them
        # so EVERY host computes exact full-set metrics — same values as a
        # single-host run on the same data (reference metrics.py semantics;
        # the arrays are tiny: predictions/GT are (B,), confidences (B, C)).
        # Every host must reach this point in lockstep (the loader's sentinel
        # padding guarantees the same step count per host).
        if jax.process_count() > 1:
            self._batches = self._gather_global(self._batches)
        self._batches = jax.device_get(self._batches)
        if self.task == "multi":
            running_loss = defaultdict(list)
            confidences = defaultdict(list)
            predictions = defaultdict(list)
            ground_truth = defaultdict(list)
            for m in self._batches:
                valid = np.asarray(m["mask"])
                for t, tm in m.items():
                    if t in ("mask", "loss", "grad_norms"):
                        continue
                    running_loss[t].extend(np.ravel(np.asarray(tm["loss"])).tolist())
                    confidences[t].extend(np.asarray(tm["confidences"])[valid].tolist())
                    predictions[t].extend(np.asarray(tm["predictions"])[valid].tolist())
                    ground_truth[t].extend(np.asarray(tm["ground_truth"])[valid].tolist())
                running_loss["loss"].extend(np.ravel(np.asarray(m["loss"])).tolist())
        else:
            running_loss, confidences, predictions, ground_truth = [], [], [], []
            for m in self._batches:
                # boolean masking handles both (B, ...) and scan-stacked
                # (K, B, ...) metric shapes; losses are flattened per step
                valid = np.asarray(m["mask"])
                running_loss.extend(np.ravel(np.asarray(m["loss"])).tolist())
                confidences.extend(np.asarray(m["confidences"])[valid].tolist())
                predictions.extend(np.asarray(m["predictions"])[valid].tolist())
                ground_truth.extend(np.asarray(m["ground_truth"])[valid].tolist())
        results = {
            "running_loss": running_loss,
            "confidences": confidences,
            "predictions": predictions,
            "ground_truth": ground_truth,
            "images": self.epoch_images_example,
        }
        grad_logs = [m["grad_norms"] for m in self._batches if "grad_norms" in m]
        if grad_logs:
            results["metrics_grad_log"] = self._aggregate_grads(grad_logs)
        return results


# ---------------------------------------------------------------------------
# Epoch drivers (reference engine.py:20-117 equivalents)
# ---------------------------------------------------------------------------


def _put_batch(batch, mesh=None, stacked=False):
    """Host batch -> device, batch-dim sharded over the mesh's data axis.

    ``stacked=True``: arrays carry a leading scan-steps dim (K, B, ...) — the
    data axis is then dim 1."""
    arrays = {k: v for k, v in batch.items() if isinstance(v, (np.ndarray, dict))}
    if mesh is not None:
        if not stacked:
            from nkbx.parallel import shard_batch

            return shard_batch(mesh, arrays)
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        sharding = NamedSharding(mesh, P(None, "data"))
        if jax.process_count() > 1:
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
                arrays,
            )
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), arrays)
    return jax.tree_util.tree_map(jnp.asarray, arrays)


def _stack_batches(batches):
    """Stack K loader batches into (K, B, ...) arrays for a scan-steps chunk."""
    subset = [{k: b[k] for k in ("image", "label", "mask")} for b in batches]
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *subset)


def train_epoch(
    state: TrainState,
    train_loader,
    train_step: Callable,
    epoch: int,
    key,
    lr_factor: float,
    freeze_scale: float,
    epoch_logger: Optional[EpochCollector] = None,
    mesh=None,
    progress: bool = True,
    cfg=None,
    start_batch: int = 0,
):
    """One training epoch; returns (state, epoch_results).

    ``start_batch > 0`` continues a preempted epoch from its cursor (the
    loader skips the already-trained prefix of the epoch's deterministic
    permutation). The returned ``epoch_results["consumed_batches"]`` counts
    the total batches of this epoch consumed so far (``start_batch`` + those
    dispatched here) — the trainer persists it as the preemption cursor.
    Metrics of a resumed epoch cover only the remaining batches.
    """
    # declare the mesh BEFORE the step traces: the fused Pallas attention
    # must lower through shard_map on multi-device meshes (GSPMD cannot
    # partition pallas_call). SCOPED to this epoch — restored on return, so
    # the engine neither leaks its mesh into unrelated later traces nor
    # clobbers a mesh the caller declared via attention_mesh().
    from nkbx.ops.attention import attention_mesh

    with attention_mesh(mesh):
        return _train_epoch_inner(
            state, train_loader, train_step, epoch, key, lr_factor,
            freeze_scale, epoch_logger, mesh, progress, cfg, start_batch)


def _train_epoch_inner(state, train_loader, train_step, epoch, key, lr_factor,
                       freeze_scale, epoch_logger, mesh, progress, cfg,
                       start_batch=0):
    import jax as _jax

    from nkbx.core import Throughput

    task = getattr(cfg, "task", "single") if cfg is not None else "single"
    logger = epoch_logger if epoch_logger is not None else EpochCollector(task)
    logger.init_iter_logs()
    lr_f = jnp.asarray(lr_factor, jnp.float32)
    fz = jnp.asarray(freeze_scale, jnp.float32)
    # per-chip rate from LOCAL images over LOCAL chips (each host feeds its own)
    tp = Throughput(n_chips=_jax.local_device_count())

    # start_batch passed positionally only when resuming, so simple fake
    # loaders with an epoch(e) signature keep working
    it = (train_loader.epoch(epoch, start_batch) if start_batch
          else train_loader.epoch(epoch))
    if progress:
        from tqdm import tqdm

        it = tqdm(it, leave=False, desc="Training",
                  total=len(train_loader) - start_batch)
    show_full = bool(getattr(cfg, "show_full_current_loss_in_terminal", False)) if cfg else False
    task_multi = task == "multi"
    spd = getattr(train_step, "scan_steps", 1)
    first = True
    step_i = 0
    prev_metrics = None
    buf = []

    def warn_if_unmasked_partial(all_valid):
        if (
            not all_valid
            and not getattr(train_step, "masked_bn", False)
            and not getattr(train_epoch, "_warned_partial", False)
        ):
            import warnings

            warnings.warn(
                "Partial (padded) batch in TRAIN mode with an unmasked-BN train "
                "step: BatchNorm batch statistics include the zero padding rows. "
                "Build the step with masked_bn=True (the trainer does this "
                "automatically when drop_last=False) or use drop_last=True."
            )
            train_epoch._warned_partial = True

    def dispatch(batches):
        nonlocal state, prev_metrics, step_i, first
        if spd > 1:
            # K loader batches -> ONE lax.scan dispatch (K steps on device);
            # the final short chunk retraces once for its smaller K (cached)
            dev = _put_batch(_stack_batches(batches), mesh, stacked=True)
        else:
            dev = _put_batch(batches[0], mesh)
        state, metrics = train_step(state, dev["image"], dev["label"], dev["mask"],
                                    key, lr_f, fz)
        if first:
            # sync once after the compiling step BEFORE any further dispatch
            # (incl. the bounded-metrics fold below): queueing work behind an
            # in-flight compilation degrades tunneled-TPU sessions badly
            _last_loss(metrics)
        logger.log_iter(metrics)
        tp.step(int(sum(b["mask"].sum() for b in batches)))
        warn_if_unmasked_partial(all(bool(b["mask"].all()) for b in batches))
        if first:
            logger.log_images_if_needed(batches[0]["image"])
            first = False
        prev_metrics = metrics
        step_i += len(batches)

    def _last_loss(metrics):
        return float(np.ravel(np.asarray(metrics["loss"]))[-1])

    # preemption (SIGTERM) breaks the epoch at a step boundary. Single
    # process: check the local flag every batch (free). Multi-host: signal
    # delivery is per-host, so hosts agree via an OR-reduction of their local
    # flags (preempt.agreed()) at a fixed batch cadence — every host executes
    # the collective at the SAME loop index (the loader pads all hosts to
    # equal batch counts), so they all take the same branch at the same step
    # and the saved cursor is globally consistent. Config key
    # preempt_sync_every (default 8 batches; 0 = epoch-boundary only, the
    # pre-r5 behavior).
    from nkbx.train import preempt as _preempt

    multi = _jax.process_count() > 1
    sync_every = 8
    if cfg is not None:
        sync_every = int(getattr(cfg, "preempt_sync_every", 8) or 0)
    preempted = False
    for bi, batch in enumerate(it):
        if multi:
            if sync_every and bi % sync_every == 0 and _preempt.agreed():
                preempted = True
                break
        elif _preempt.requested():
            preempted = True
            break
        buf.append(batch)
        if len(buf) < spd:
            continue
        # capture the last ALREADY-dispatched step's metrics before this
        # dispatch overwrites prev_metrics, so the postfix fetch below never
        # blocks on the step still in flight
        older = prev_metrics
        dispatch(buf)
        buf = []
        if progress and spd == 1 and older is not None and step_i % 10 == 1:
            # show the PREVIOUS step's loss (already materialized) and only
            # every 10 steps: each float() is a ~120 ms D2H round trip on
            # tunneled backends (the reference syncs EVERY iteration,
            # engine.py:53 + logging.py:261-281). _last_loss ravels: with
            # grad_accum_steps > 1 the loss comes back stacked (A,).
            if task_multi and show_full:
                it.set_postfix_str(", ".join(
                    f"loss {k}: {_last_loss(v):.4f}" for k, v in older.items()
                    if isinstance(v, dict) and "loss" in v
                ))
            else:
                it.set_postfix_str(f"Loss: {_last_loss(older):.4f}")
    if buf and not preempted:
        dispatch(buf)
    if prev_metrics is not None:
        # Sync on the final loss (depends on the whole step chain) so the
        # throughput number is honest. Do NOT block_until_ready on the donated
        # state: on tunneled-TPU backends that returns early and degrades the
        # session (see bench.py).
        _last_loss(prev_metrics)
    results = logger.get_epoch_results()
    results["throughput"] = tp.snapshot()
    results["preempted"] = preempted
    # total batches of this epoch consumed (dispatched to the device) so far;
    # batches buffered for an unfinished scan chunk at preemption are NOT
    # counted — they re-read on resume
    results["consumed_batches"] = start_batch + step_i
    return state, results


def val_epoch(
    state: TrainState,
    val_loader,
    eval_step: Callable,
    epoch: int = 0,
    epoch_logger: Optional[EpochCollector] = None,
    mesh=None,
    progress: bool = True,
    task: str = "single",
):
    from nkbx.ops.attention import attention_mesh

    logger = epoch_logger if epoch_logger is not None else EpochCollector(task)
    logger.init_iter_logs()
    it = val_loader.epoch(epoch)
    if progress:
        from tqdm import tqdm

        it = tqdm(it, leave=False, desc="Evaluating", total=len(val_loader))
    first = True
    # scoped like train_epoch — Pallas fused attention needs shard_map on
    # multi-device meshes, and the declaration must not leak past the epoch
    with attention_mesh(mesh):
        for batch in it:
            dev = _put_batch(batch, mesh)
            metrics = eval_step(state, dev["image"], dev["label"], dev["mask"])
            if first:
                # sync BEFORE the logger's fold dispatch (see train_epoch)
                float(metrics["loss"])
            logger.log_iter(metrics)
            if first:
                logger.log_images_if_needed(batch["image"])
                first = False
    return logger.get_epoch_results()
