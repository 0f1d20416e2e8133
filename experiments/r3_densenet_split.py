"""Round-3: split-concat DenseNet lowering — MEASURED NEGATIVE (−38%).

Hypothesis: the densenet121 profile (r3_postfusion_profile.py) shows 19%
of the train step in concatenate kernels (the growing channel-concat is
materialized every layer, ~6.3 ms/step), so keeping the features as a
LIST of 128-channel groups — BN per channel slice, the 1x1 conv as a sum
of per-group matmuls, one small concat per 4 layers — should recover most
of it. The lowering is a pure reparametrization (identical param/stat
trees, torch-exact running stats incl. the row mask; verified to 2e-5 on
CPU before measuring).

Measured (bs=64 @224 bf16 full train step, scan K=4, chip idle):

    plain concat   34.96 ms/step  1,831 img/s
    split groups   56.81 ms/step  1,127 img/s   (−38%)

Verdict: NEGATIVE, decisively. The per-group K≤128 matmul fragmentation
(24-layer block 3 ends at 10 groups per layer) plus per-group BN stat
reductions cost far more than the concat stores they replace — XLA's
concat program keeps ONE full-K MXU contraction per layer and fuses the
BN/relu into it. The split lowering was REVERTED from the package
(nkbx/models/densenet.py stays concat-based); this file keeps the full
variant inline so the result is reproducible. Don't re-attempt without
new evidence (e.g. an MXU-native grouped contraction).

Usage:
  PYTHONPATH=/root/.axon_site python experiments/r3_densenet_split.py all
  PYTHONPATH=/root/.axon_site python experiments/r3_densenet_split.py <0|1>
"""

import json
import os
import subprocess
import sys
import time
from functools import partial
from typing import Any, Sequence

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

BS = 64
K = 4
_GROUP = 128


def _build_split_densenet121():
    """The reverted split lowering, inlined (param/stat-tree-identical to
    nkbx.models.densenet.DenseNet — see this file's docstring)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from nkbx.models.common import TorchBatchNorm, global_avg_pool
    from nkbx.models.densenet import _BNReluConv

    class _BNParams(nn.Module):
        features: int

        @nn.compact
        def __call__(self):
            c = self.features
            ra_mean = self.variable("batch_stats", "mean",
                                    lambda: jnp.zeros(c, jnp.float32))
            ra_var = self.variable("batch_stats", "var",
                                   lambda: jnp.ones(c, jnp.float32))
            scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            return scale, bias, ra_mean, ra_var

    def _split_bn_relu(parts, scale, bias, ra_mean, ra_var, train, mask,
                       initializing, dtype, momentum=0.9, epsilon=1e-5):
        outs, means, vars_ = [], [], []
        off = 0
        for p in parts:
            ci = p.shape[-1]
            if train:
                axes = tuple(range(p.ndim - 1))
                xf = p.astype(jnp.float32)
                where = None if mask is None else jnp.broadcast_to(
                    jnp.asarray(mask, bool), p.shape)
                mean = jnp.mean(xf, axes, where=where)
                mean2 = jnp.mean(xf * xf, axes, where=where)
                var = jnp.maximum(mean2 - mean * mean, 0.0)
                means.append(mean)
                vars_.append(var)
            else:
                mean = ra_mean.value[off:off + ci]
                var = ra_var.value[off:off + ci]
            inv = jax.lax.rsqrt(var + epsilon) * scale[off:off + ci]
            b = bias[off:off + ci]
            outs.append(nn.relu(
                ((p.astype(jnp.float32) - mean) * inv + b).astype(dtype)))
            off += ci
        if train and not initializing:
            p0 = parts[0]
            if mask is None:
                n = jnp.asarray(float(np.prod(p0.shape[:-1])))
            else:
                where0 = jnp.broadcast_to(jnp.asarray(mask, bool), p0.shape)
                n = jnp.sum(where0, dtype=jnp.float32) / p0.shape[-1]
            mean_full = jnp.concatenate(means)
            unbiased = jnp.concatenate(vars_) * (n / jnp.maximum(n - 1.0, 1.0))
            m = momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean_full
            ra_var.value = m * ra_var.value + (1.0 - m) * unbiased
        return outs

    class _Conv1x1Params(nn.Module):
        in_features: int
        features: int

        @nn.compact
        def __call__(self):
            return self.param("kernel", nn.initializers.lecun_normal(),
                              (1, 1, self.in_features, self.features),
                              jnp.float32)

    class _SplitBNReluConv1x1(nn.Module):
        features: int
        dtype: Any = jnp.float32

        @nn.compact
        def __call__(self, parts, train=False, mask=None):
            c_total = sum(p.shape[-1] for p in parts)
            scale, bias, ra_mean, ra_var = _BNParams(c_total, name="BatchNorm_0")()
            kernel = _Conv1x1Params(c_total, self.features, name="Conv_0")()
            hs = _split_bn_relu(parts, scale, bias, ra_mean, ra_var,
                                train, mask if train else None,
                                self.is_initializing(), self.dtype)
            acc, off = None, 0
            kd = kernel.astype(self.dtype)
            for h in hs:
                ci = h.shape[-1]
                p_ = jax.lax.dot_general(
                    h.reshape(-1, ci), kd[0, 0, off:off + ci, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = p_ if acc is None else acc + p_
                off += ci
            b, hh, ww, _ = parts[0].shape
            return acc.astype(self.dtype).reshape(b, hh, ww, self.features)

    class SplitDenseLayer(nn.Module):
        growth_rate: int
        bn_size: int = 4
        dtype: Any = jnp.float32

        @nn.compact
        def __call__(self, parts, train=False, mask=None):
            y = _SplitBNReluConv1x1(self.bn_size * self.growth_rate,
                                    dtype=self.dtype,
                                    name="bottleneck")(parts, train, mask)
            return _BNReluConv(self.growth_rate, 3, dtype=self.dtype,
                               name="conv")(y, train, mask)

    def _coalesce(parts):
        tail, acc = [], 0
        for p in reversed(parts):
            if p.shape[-1] >= _GROUP:
                break
            tail.append(p)
            acc += p.shape[-1]
        if acc >= _GROUP and tail:
            head = parts[:len(parts) - len(tail)]
            return head + [jnp.concatenate(list(reversed(tail)), axis=-1)]
        return parts

    class SplitDenseNet(nn.Module):
        block_config: Sequence[int]
        growth_rate: int = 32
        init_features: int = 64
        dtype: Any = jnp.float32

        @property
        def num_features(self):
            c = self.init_features
            for i, n in enumerate(self.block_config):
                c += n * self.growth_rate
                if i != len(self.block_config) - 1:
                    c //= 2
            return c

        @nn.compact
        def __call__(self, x, train=False, mask=None):
            x = nn.Conv(self.init_features, (7, 7), strides=(2, 2),
                        padding=((3, 3), (3, 3)), use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="stem_conv")(x.astype(self.dtype))
            x = TorchBatchNorm(use_running_average=not train, dtype=self.dtype,
                               name="stem_norm")(x, mask=mask if train else None)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
            parts = [x]
            for i, n_layers in enumerate(self.block_config):
                for j in range(n_layers):
                    y = SplitDenseLayer(self.growth_rate, dtype=self.dtype,
                                        name=f"block{i}_layer{j}")(parts, train, mask)
                    parts = _coalesce(parts + [y])
                if i != len(self.block_config) - 1:
                    c_out = sum(p.shape[-1] for p in parts) // 2
                    x = _SplitBNReluConv1x1(c_out, dtype=self.dtype,
                                            name=f"transition{i}")(parts, train, mask)
                    parts = [nn.avg_pool(x, (2, 2), strides=(2, 2))]
            scale, bias, ra_mean, ra_var = _BNParams(
                sum(p.shape[-1] for p in parts), name="final_norm")()
            hs = _split_bn_relu(parts, scale, bias, ra_mean, ra_var,
                                train, mask if train else None,
                                self.is_initializing(), self.dtype)
            return jnp.concatenate(
                [global_avg_pool(h) for h in hs], axis=-1).astype(jnp.float32)

    return SplitDenseNet(block_config=(6, 12, 24, 16), dtype=jnp.bfloat16)


def run(split):
    import jax
    import jax.numpy as jnp

    import nkbx.transforms as T
    from nkbx.models.classifier import ClassificationModel, SingletaskClassifier
    from nkbx.models.densenet import densenet121
    from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

    backbone = (_build_split_densenet121() if split
                else densenet121(dtype=jnp.bfloat16))
    module = SingletaskClassifier(backbone=backbone, n_classes=1000)
    init = jax.jit(lambda rng: module.init(
        {"params": rng}, jnp.zeros((1, 224, 224, 3), jnp.float32), train=False))
    variables = dict(init(jax.random.PRNGKey(0)))
    model = ClassificationModel(module, variables,
                                [f"c{i}" for i in range(1000)], "single",
                                backbone.num_features)

    pipeline = T.Compose([T.HorizontalFlip(p=0.5), T.Normalize()])
    criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
    bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.1})
    step = build_train_step(model, criterion, bundle,
                            augment_fn=pipeline.device_apply, scan_steps=K)
    state = TrainState.create(model.params, model.batch_stats, bundle.tx)

    r = np.random.default_rng(0)
    image = jnp.asarray(np.broadcast_to(
        r.integers(0, 255, (BS, 224, 224, 3)).astype(np.uint8),
        (K, BS, 224, 224, 3)).copy())
    label = jnp.asarray(np.broadcast_to(
        r.integers(0, 1000, (BS,)).astype(np.int64), (K, BS)).copy())
    mask = jnp.ones((K, BS), bool)
    args = (image, label, mask, jax.random.PRNGKey(0),
            jnp.asarray(1.0), jnp.asarray(1.0))

    def sync(metrics):
        return float(metrics["loss"][-1])

    state, metrics = step(state, *args)
    sync(metrics)
    state, metrics = step(state, *args)
    sync(metrics)
    t0 = time.perf_counter()
    for _ in range(4):
        state, metrics = step(state, *args)
    loss = sync(metrics)
    dt = (time.perf_counter() - t0) / (4 * K)
    print(json.dumps({"split_concat": split, "bs": BS,
                      "ms_per_step": round(dt * 1e3, 2),
                      "img_per_s": round(BS / dt, 1), "loss": round(loss, 4)}))


def run_all():
    for flag in ("0", "1"):
        p = subprocess.run([sys.executable, __file__, flag],
                           capture_output=True, text=True, timeout=1800)
        line = next((ln for ln in p.stdout.splitlines()
                     if ln.startswith("{")), None)
        print(line if line else
              f'{{"split_concat": {flag}, "error": {p.stderr.splitlines()[-1:]!r}}}')


if __name__ == "__main__":
    arg = sys.argv[1] if len(sys.argv) > 1 else "all"
    run_all() if arg == "all" else run(arg == "1")
