"""Round-3: second attack on ViT-B/16 attention (N=197), aimed by profile.

The first sweep (r3_swin_attention.py, PERF.md) measured the window kernel
NEGATIVE for vit_base @224 (−7%): with G=B=64 groups the VMEM block picker
lands at W=2 windows/block and the 12 heads run as a sequential python loop
inside each grid step — poor pipelining, while XLA's batched lowering fills
the MXU. But XLA pays ~119 MB/layer of f32 score traffic (B·H·197²·4), which
at the tunnel's ~462 GB/s should be tens of ms/step across 12 layers — so a
kernel with a PARALLEL head grid should beat both. Two candidates:

  headbatch — our own kernel (nkbx/ops/attention.py) fed (B·H, N, d) with
              heads=1: heads ride the batched group dim instead of the
              python loop (the (B,N,H,d)→(B,H,N,d) transpose is ~0.5 ms of
              HBM round trips, far below the score traffic it deletes).
  flash     — the stock jax pallas TPU flash kernel (grid over (batch,
              heads, q-blocks), KV loop inside), tokens padded 197→256 with
              segment ids so padded q rows attend ONLY a padded kv row
              (keeps softmax rows finite; padded dk/dv land on discarded
              tokens).

Usage: python experiments/r3_vit_attention2.py {xla|sep|headbatch|flash} [bs]
— one variant per invocation, chip idle, host quiet (CLAUDE.md). Results are
recorded in PERF.md ("Round-3 ViT attention, second attack").
"""

import json
import sys
import time

import numpy as np

BS = 64
K = 4


def _headbatch_attention_fn(query, key, value, bias=None, mask=None, **kw):
    """attention_fn: heads ride the kernel's group dim (heads=1 per group)."""
    import jax.numpy as jnp

    from nkbx.ops.attention import fused_attention

    assert bias is None and mask is None
    b, n, h, d = query.shape
    zeros = jnp.zeros((1, n, n), jnp.float32)

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, n, d)

    o = fused_attention(fold(query), fold(key), fold(value), zeros, zeros,
                        d ** -0.5, 1)
    return o.reshape(b, h, n, d).transpose(0, 2, 1, 3)


def _flash_attention_fn(query, key, value, bias=None, mask=None, **kw):
    """attention_fn: stock pallas flash kernel, padded to 256 tokens."""
    import jax.numpy as jnp
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    assert bias is None and mask is None
    b, n, h, d = query.shape
    npad = -(-n // 128) * 128

    def fold(x):
        x = x.transpose(0, 2, 1, 3)  # (b, h, n, d)
        return jnp.pad(x, ((0, 0), (0, 0), (0, npad - n), (0, 0)))

    seg = jnp.asarray(
        np.concatenate([np.zeros(n, np.int32), np.ones(npad - n, np.int32)]))
    seg = jnp.broadcast_to(seg[None], (b, npad))
    o = fa.flash_attention(fold(query), fold(key), fold(value),
                           segment_ids=fa.SegmentIds(q=seg, kv=seg),
                           sm_scale=d ** -0.5)
    return o[:, :, :n].transpose(0, 2, 1, 3)


def run(variant):
    import jax
    import jax.numpy as jnp

    import nkbx.transforms as T
    from nkbx.models import vit as vit_mod
    from nkbx.models.classifier import ClassificationModel, SingletaskClassifier
    from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

    if variant == "headbatch":
        vit_mod._fused_attention_fn = _headbatch_attention_fn
    elif variant == "flash":
        vit_mod._fused_attention_fn = _flash_attention_fn
    fused = variant in ("sep", "headbatch", "flash")

    backbone = vit_mod.vit_base_patch16_224(dtype=jnp.bfloat16,
                                            fused_attention=fused)
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
    key = jax.random.PRNGKey(0)
    one = jnp.asarray(1.0)
    args = (image, label, mask, key, one, one)

    def sync(metrics):
        return float(metrics["loss"][-1])

    state, metrics = step(state, *args)
    sync(metrics)
    state, metrics = step(state, *args)
    sync(metrics)
    chunks = 4
    t0 = time.perf_counter()
    for _ in range(chunks):
        state, metrics = step(state, *args)
    loss = sync(metrics)
    dt = (time.perf_counter() - t0) / (chunks * K)
    print(json.dumps({"variant": variant, "bs": BS,
                      "ms_per_step": round(dt * 1e3, 2),
                      "img_per_s": round(BS / dt, 1), "loss": round(loss, 4)}))


if __name__ == "__main__":
    if len(sys.argv) > 2:
        BS = int(sys.argv[2])
    run(sys.argv[1] if len(sys.argv) > 1 else "xla")
