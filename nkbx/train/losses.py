"""Losses: cross-entropy (optional class weights), focal, multi-task wrapper.

Same math as reference losses.py:10-176, verified against torch in
tests/test_losses.py:

- ``cross_entropy``: torch ``nn.CrossEntropyLoss(weight)`` semantics — weighted
  mean = sum(w_y * nll_y) / sum(w_y);
- ``focal_loss``: -alpha_y * (1 - p_y)^gamma * log(p_y), mean over unignored
  samples (reference losses.py:59-94, incl. ``ignore_index``);
- ``MultitaskCriterion``: per-target losses + summed ``"loss"`` key
  (reference losses.py:97-151).

All criteria take a validity ``mask`` (nkbx pads the final batch to keep jit
shapes static); masked-out rows contribute nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_FOCAL_GAMMA = 2.0


def _log_softmax(logits):
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def cross_entropy(logits, labels, weight=None, mask=None,
                  label_smoothing: float = 0.0):
    """Mean-reduced CE over valid rows, torch CrossEntropyLoss-compatible
    (incl. ``label_smoothing``, exact torch semantics: the smoothed eps/C mass
    on each class carries THAT class's weight —
    (1-eps)*w[y]*nll + eps/C * sum_c w_c*(-log p_c), normalized by sum w[y])."""
    log_p = _log_softmax(logits)
    nll = -jnp.take_along_axis(log_p, labels[:, None], axis=-1)[:, 0]
    w = jnp.ones_like(nll) if weight is None else jnp.asarray(weight)[labels]
    if label_smoothing > 0.0:
        wc = (jnp.ones(log_p.shape[-1], log_p.dtype) if weight is None
              else jnp.asarray(weight))
        smooth = jnp.sum(-log_p * wc, axis=-1) / log_p.shape[-1]
        per_sample = (1.0 - label_smoothing) * w * nll + label_smoothing * smooth
    else:
        per_sample = w * nll
    if mask is not None:
        m = mask.astype(per_sample.dtype)
        per_sample = per_sample * m
        w = w * m
    denom = jnp.maximum(jnp.sum(w), 1e-12)
    return jnp.sum(per_sample) / denom


def focal_loss(logits, labels, alpha=None, gamma: float = DEFAULT_FOCAL_GAMMA,
               ignore_index: int = -100, mask=None, reduction: str = "mean"):
    """Focal loss (https://arxiv.org/abs/1708.02002), reference losses.py math."""
    log_p = _log_softmax(logits)
    valid = labels != ignore_index
    if mask is not None:
        valid = valid & mask
    safe_labels = jnp.where(valid, labels, 0)
    log_pt = jnp.take_along_axis(log_p, safe_labels[:, None], axis=-1)[:, 0]
    a = jnp.ones_like(log_pt) if alpha is None else jnp.asarray(alpha)[safe_labels]
    ce = -a * log_pt
    pt = jnp.exp(log_pt)
    loss = (1.0 - pt) ** gamma * ce
    loss = jnp.where(valid, loss, 0.0)
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    n = jnp.sum(valid.astype(jnp.float32))
    # torch reference returns 0.0 when every label is ignored (losses.py:69-70)
    return jnp.where(n > 0, jnp.sum(loss) / jnp.maximum(n, 1.0), 0.0)


class SingletaskCriterion:
    """Callable (logits, labels, mask) -> scalar loss."""

    def __init__(self, fn, mass_fn=None):
        self.fn = fn
        self._mass_fn = mass_fn

    def __call__(self, pred, true, mask=None):
        return self.fn(pred, true, mask=mask)

    def batch_mass(self, labels, mask=None):
        """This criterion's mean-normalizer over a batch — the weight a
        microbatch's mean-gradient must carry for EXACT gradient accumulation
        (nkbx.train.engine): sum of class weights over valid rows for weighted
        CE, the unignored-valid count for focal, the valid count otherwise."""
        if self._mass_fn is not None:
            return self._mass_fn(labels, mask)
        if mask is None:
            return jnp.asarray(float(labels.shape[0]))
        return jnp.sum(mask.astype(jnp.float32))


class MultitaskCriterion:
    """Per-target loss dict + summed ``"loss"`` (reference losses.py:97-151)."""

    def __init__(self, criterion: SingletaskCriterion):
        self.criterion = criterion

    def __call__(self, pred: dict, true: dict, mask=None):
        assert pred.keys() == true.keys(), (sorted(pred), sorted(true))
        out = {}
        total = 0.0
        for target_name in sorted(pred.keys()):
            target_loss = self.criterion(pred[target_name], true[target_name], mask=mask)
            out[target_name] = target_loss
            total = total + target_loss
        out["loss"] = total
        return out

    def batch_mass(self, true: dict, mask=None):
        """Shared valid-row count: one scalar cannot represent heterogeneous
        per-target normalizers, so multi-task gradient accumulation is exact
        when every target's normalizer equals the valid count (no class
        weights, no ignored labels) — which all shipped configs satisfy."""
        labels = next(iter(true.values())) if isinstance(true, dict) else true
        if mask is None:
            return jnp.asarray(float(labels.shape[0]))
        return jnp.sum(mask.astype(jnp.float32))


def get_loss(cfg_loss: dict):
    """Config -> criterion (reference losses.py:154-176 surface).

    cfg_loss: {"task": "single"|"multi", "type": "CrossEntropyLoss"|"FocalLoss",
               optional "weight" (CE) / "alpha", "gamma" (focal)}
    """
    kind = cfg_loss["type"]
    mass_fn = None
    if kind == "CrossEntropyLoss":
        weight = np.asarray(cfg_loss["weight"], dtype=np.float32) if "weight" in cfg_loss else None
        smoothing = float(cfg_loss.get("label_smoothing", 0.0))

        def fn(logits, labels, mask=None):
            return cross_entropy(logits, labels, weight=weight, mask=mask,
                                 label_smoothing=smoothing)

        if weight is not None:
            def mass_fn(labels, mask, _w=weight):
                w = jnp.asarray(_w)[labels]
                if mask is not None:
                    w = w * mask.astype(w.dtype)
                return jnp.sum(w)
    elif kind == "FocalLoss":
        alpha = np.asarray(cfg_loss["alpha"], dtype=np.float32) if "alpha" in cfg_loss else None
        gamma = cfg_loss.get("gamma", DEFAULT_FOCAL_GAMMA)

        def fn(logits, labels, mask=None):
            return focal_loss(logits, labels, alpha=alpha, gamma=gamma, mask=mask)

        def mass_fn(labels, mask):
            valid = labels != -100  # focal_loss default ignore_index
            if mask is not None:
                valid = valid & mask
            return jnp.sum(valid.astype(jnp.float32))
    else:
        raise NotImplementedError(f"Unknown loss type in config: {kind}")

    base = SingletaskCriterion(fn, mass_fn=mass_fn)
    if cfg_loss.get("task", "single") == "multi":
        return MultitaskCriterion(base)
    return base
