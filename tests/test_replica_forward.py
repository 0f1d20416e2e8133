"""torch replica FORWARD parity vs the nkbx model with converted weights.

Round 4 gave every torch_ref layout replica a runnable ``forward`` (pooled
backbone features, the timm forward_features + global-pool contract). That
turns the replicas into full torch reference implementations: random replica
weights -> ``state_dict()`` -> nkbx converter -> the nkbx forward must match
the replica's own forward. This is both (a) the strongest offline evidence
that converted real checkpoints will agree end-to-end, and (b) the engine of
the torch-based ONNX exporter (nkbx/export/torch_onnx.py), whose emitted
graph IS the replica forward.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # full-model CPU forwards

# one representative per family (small geometry / input where allowed)
CASES = [
    ("resnet_tiny_test", 32, 2e-5),
    ("resnet14t", 32, 2e-5),            # tiered stem, bottleneck
    ("resnet50d", 32, 2e-5),            # deep stem + avg_down shortcut
    ("seresnext50_32x4d", 32, 2e-5),    # SE + grouped
    ("mobilenetv3_large_100", 64, 2e-5),
    ("mobilenetv3_small_100", 64, 2e-5),   # SE on the first DS block, "hs" earlier
    ("efficientnet_b0", 64, 2e-5),
    ("efficientnetv2_s", 64, 2e-5),
    ("densenet121", 64, 2e-5),
    ("convnext_tiny", 64, 2e-5),
    ("vit_tiny_patch16_224", 224, 5e-5),
    ("swin_tiny_patch4_window7_224", 224, 5e-5),
    ("unicom ViT-B/32", 224, 5e-4),     # BN1d feature head amplifies eps diffs
]


def _random_replica(name, seed=0):
    import torch

    from nkbx.models.torch_ref import build_replica

    replica = build_replica(name)
    replica.eval()
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in replica.parameters():
            if p.dim() > 1:
                p.normal_(0, 0.04)
            else:
                p.normal_(0, 0.01)
        for m in replica.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.01)
                m.running_var.uniform_(0.9, 1.1)
    return replica


@pytest.mark.parametrize("name,size,atol", CASES,
                         ids=[c[0].replace(" ", "_") for c in CASES])
def test_replica_forward_matches_converted_nkbx(name, size, atol):
    import torch

    from nkbx.models.convert import convert_torch_state_dict
    from nkbx.models.registry import create_backbone

    replica = _random_replica(name)
    sd = {k: v.numpy() for k, v in replica.state_dict().items()}
    out = convert_torch_state_dict(name, sd)
    module = create_backbone(name, dtype=jnp.float32)
    x = np.random.default_rng(0).normal(size=(2, size, size, 3)).astype(np.float32)
    variables = {"params": out["params"]}
    if out.get("batch_stats"):
        variables["batch_stats"] = out["batch_stats"]
    feats = module.apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        tfeats = replica(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(feats), tfeats.numpy(),
                               atol=atol, rtol=1e-4)
