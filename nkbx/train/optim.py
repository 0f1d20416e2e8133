"""Optimizers + LR schedules, torch-semantics-compatible, built on optax.

Reference surface (utils.py:10-61): two param groups — backbone vs classifier —
with per-group lr and weight decay; optimizer types adam / radam / nadam
(decoupled wd) / sparse_adam / sgd; epoch-stepped schedules step / multistep /
cosine.

TPU-first design: the optimizer produces *unit-lr* update directions per group;
the jitted train step scales them by ``lr_group * schedule_factor * freeze_scale``
passed as device scalars. That keeps the jit signature constant across

- epoch LR changes (reference scheduler.step(), engine.py:77-78),
- backbone freeze/unfreeze flips (reference model.py:59-64 requires_grad) —

no recompiles, no optimizer-state surgery.

Weight-decay coupling matches torch:
- adam / radam / sgd: coupled (wd*p added to the gradient before moments);
- nadam: decoupled (lr*wd*p subtracted at the step — torch
  ``decoupled_weight_decay=True``, reference utils.py:35), realized here by
  adding wd*p *after* the moment transform so the shared lr scaling applies.

Freeze semantics note: frozen backbone gradients are zeroed before the moment
update, so Adam moments decay toward zero during a freeze (torch instead skips
frozen params entirely, leaving stale moments). Both resume cleanly on unfreeze.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple

import jax
import optax

from nkbx.models.classifier import param_labels


class OptimizerBundle(NamedTuple):
    tx: optax.GradientTransformation  # unit-lr direction transform
    lrs: dict  # {"backbone": lr, "classifier": lr}
    labels_fn: Callable  # params -> label pytree ("backbone"/"classifier")
    coupled_wds: dict = {"backbone": 0.0, "classifier": 0.0}  # grad-coupled wd per group


_COUPLED_WD = {"adam", "radam", "sparse_adam", "sgd"}


class ScaleByTorchNAdamState(NamedTuple):
    count: Any = None
    mu_product: Any = None
    mu: Any = None
    nu: Any = None


def scale_by_torch_nadam(b1: float = 0.9, b2: float = 0.999,
                         eps: float = 1e-8, psi: float = 4e-3):
    """torch.optim.NAdam-exact update direction (unit lr).

    torch's NAdam (Dozat 2016, as torch implements it) ANNEALS the momentum
    coefficient — mu_t = b1*(1 - 0.5*0.96^(t*psi)) — and bias-corrects with
    the running product of mu_i. ``optax.scale_by_adam(nesterov=True)`` has
    no such schedule, so early-training trajectories drift from the
    reference's ``torch.optim.NAdam`` recipe (reference utils.py:35).
    Lockstep-tested against torch in tests/test_optim.py.
    """
    import jax.numpy as jnp

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return ScaleByTorchNAdamState(
            count=jnp.zeros([], jnp.int32),
            mu_product=jnp.ones([], jnp.float32),
            mu=zeros,
            nu=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(updates, state, params=None):
        del params
        t = state.count + 1
        tf = t.astype(jnp.float32)
        mu_t = b1 * (1.0 - 0.5 * 0.96 ** (tf * psi))
        mu_t1 = b1 * (1.0 - 0.5 * 0.96 ** ((tf + 1.0) * psi))
        mu_prod = state.mu_product * mu_t
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * g * g, state.nu, updates)
        bc2 = 1.0 - b2 ** tf

        def direction(m, v, g):
            m_hat = (mu_t1 * m / (1.0 - mu_prod * mu_t1)
                     + (1.0 - mu_t) * g / (1.0 - mu_prod))
            return m_hat / (jnp.sqrt(v / bc2) + eps)

        out = jax.tree_util.tree_map(direction, mu, nu, updates)
        return out, ScaleByTorchNAdamState(count=t, mu_product=mu_prod,
                                           mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def _direction(kind: str, wd: float) -> optax.GradientTransformation:
    """Unit-lr update direction.

    Coupled weight decay (adam/radam/sgd: wd*p added to the gradient) is NOT in
    this chain — it is applied explicitly to the gradients in the train step
    via :func:`apply_coupled_wd` BEFORE the freeze mask, so that frozen params
    feed zero into the moments (an in-chain ``add_decayed_weights`` would keep
    injecting wd*p during a freeze, converging Adam moments to the decay
    direction and causing full-magnitude sign(p) steps at unfreeze).
    Decoupled wd (nadam) stays in the chain after the moments, where the
    downstream lr*freeze scaling already gates it.
    """
    kind = kind.lower()
    if kind in ("adam", "sparse_adam"):
        # sparse_adam: TPU/XLA has no sparse gradients; dense adam is the
        # faithful equivalent
        return optax.scale_by_adam()
    if kind == "radam":
        return optax.scale_by_radam()
    if kind == "nadam":
        # torch-exact NAdam (annealed momentum) + decoupled weight decay
        # (p*(1-lr*wd), realized as the lr-scaled additive term downstream)
        return optax.chain(scale_by_torch_nadam(), optax.add_decayed_weights(wd))
    if kind == "sgd":
        return optax.identity()
    raise NotImplementedError(f"Unknown optimizer in config: {kind}")


def get_optimizer(params, cfg_optimizer: dict) -> OptimizerBundle:
    """Two-group (backbone/classifier) optimizer from a reference-style config."""
    base_lr = cfg_optimizer.get("lr", 0.001)
    backbone_lr = cfg_optimizer.get("backbone_lr", base_lr)
    classifier_lr = cfg_optimizer.get("classifier_lr", base_lr)
    base_wd = cfg_optimizer.get("weight_decay", 0.0)
    backbone_wd = cfg_optimizer.get("backbone_weight_decay", base_wd)
    classifier_wd = cfg_optimizer.get("classifier_weight_decay", base_wd)
    kind = cfg_optimizer["type"]

    tx = optax.multi_transform(
        {
            "backbone": _direction(kind, backbone_wd),
            "classifier": _direction(kind, classifier_wd),
        },
        param_labels,
    )
    coupled = kind.lower() in _COUPLED_WD
    return OptimizerBundle(
        tx=tx,
        lrs={"backbone": float(backbone_lr), "classifier": float(classifier_lr)},
        labels_fn=param_labels,
        coupled_wds={
            "backbone": float(backbone_wd) if coupled else 0.0,
            "classifier": float(classifier_wd) if coupled else 0.0,
        },
    )


def scale_updates(updates, params, lrs: dict, lr_factor, freeze_scale):
    """Apply -lr_group * schedule * (freeze for backbone) to update directions.

    ``lr_factor`` and ``freeze_scale`` are device scalars (traced), so schedule
    and freeze-policy changes never retrigger compilation.
    """
    labels = param_labels(params)

    def scale(u, lab):
        lr = lrs[lab]
        s = lr_factor * (freeze_scale if lab == "backbone" else 1.0)
        return -lr * s * u

    return jax.tree_util.tree_map(scale, updates, labels)


def mask_frozen_grads(grads, freeze_scale):
    """Zero backbone grads when frozen (freeze_scale=0), before moment updates."""
    labels = param_labels(grads)
    return jax.tree_util.tree_map(
        lambda g, lab: g * (freeze_scale if lab == "backbone" else 1.0), grads, labels
    )


def select_frozen_opt_state(new_state, old_state, freeze_scale):
    """torch-exact freeze (config ``freeze_semantics = "torch"``).

    torch's optimizers SKIP ``requires_grad=False`` params entirely
    (reference model.py:59-64 freeze + utils.py:10-28 groups): their Adam
    moments go STALE during a freeze and the per-param step count stops, so
    bias correction resumes where it left off at unfreeze. The default nkbx
    semantics instead feed zero gradients, which decays the moments toward
    zero. This helper realizes the torch behavior without optimizer-state
    surgery: after ``tx.update`` runs, the backbone group's state (moments AND
    step count) is restored to its pre-step values whenever ``freeze_scale``
    (a traced 0/1 scalar) is 0 — one compiled program for both phases.
    """
    import jax.numpy as jnp

    frozen = freeze_scale == 0
    inner = dict(new_state.inner_states)
    inner["backbone"] = jax.tree_util.tree_map(
        lambda n, o: jnp.where(frozen, o, n),
        new_state.inner_states["backbone"], old_state.inner_states["backbone"])
    return new_state._replace(inner_states=inner)


def apply_coupled_wd(grads, params, coupled_wds: dict):
    """torch-style coupled weight decay: grad += wd_group * param.

    Applied BEFORE :func:`mask_frozen_grads`, so frozen params contribute zero
    to the optimizer moments (matching torch, where frozen params are skipped
    entirely).
    """
    if not any(coupled_wds.values()):
        return grads
    labels = param_labels(grads)
    return jax.tree_util.tree_map(
        lambda g, p, lab: g + coupled_wds[lab] * p, grads, params, labels
    )


# ---------------------------------------------------------------------------
# Epoch LR schedules (reference utils.py:45-61: stepped once per epoch)
# ---------------------------------------------------------------------------


def get_scheduler(lr_policy: dict) -> Callable[[int], float]:
    """Return factor(epoch) -> multiplicative LR factor in [0, 1]."""
    if not lr_policy:
        return lambda epoch: 1.0
    kind = lr_policy["type"]
    if kind == "step":
        step_size, gamma = lr_policy["step_size"], lr_policy["gamma"]
        return lambda epoch: gamma ** (epoch // step_size)
    if kind == "multistep":
        steps, gamma = sorted(lr_policy["steps"]), lr_policy["gamma"]
        return lambda epoch: gamma ** sum(1 for s in steps if epoch >= s)
    if kind == "cosine":
        t_max = lr_policy["n_epochs"]
        return lambda epoch: 0.5 * (1.0 + math.cos(math.pi * epoch / t_max))
    raise NotImplementedError(f"Learning rate policy {kind} not implemented.")


def backbone_state_factor(backbone_state_policy: dict, epoch: int, prev: float = 1.0) -> float:
    """Resolve the freeze scale for an epoch from a {epoch: 'freeze'|'unfreeze'}
    policy (reference train.py:40-41): the policy at the largest key <= epoch wins.
    """
    state = None
    for e in sorted(k for k in backbone_state_policy if k <= epoch):
        state = backbone_state_policy[e]
    if state is None:
        return prev
    return 0.0 if state == "freeze" else 1.0
