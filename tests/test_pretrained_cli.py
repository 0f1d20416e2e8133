"""pretrained=True end-to-end (VERDICT round 1 #2).

The reference's ``pretrained=True`` transparently loads timm/unicom weights
(reference model.py:75-85). nkbx's equivalent: convert torch weights once with
``python -m nkbx.models.convert``, point $NKBX_PRETRAINED_DIR at the output,
and every ``get_model(..., pretrained=True)`` picks them up. This test drives
the WHOLE path: torch checkpoint file -> CLI -> registry lookup -> model build
-> a short fine-tune that reduces loss from the converted weights.
"""

import os
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # integration tier: excluded by -m 'not slow'


REPO = Path(__file__).resolve().parent.parent


def _synthetic_tiny_resnet_sd(rng):
    """timm-layout state_dict matching nkbx resnet_tiny_test (stem 16, stages
    (1,1) BasicBlock -> channels 64, 128)."""
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = (rng.normal(size=(o, i, k, k)) * 0.05).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.uniform(0.8, 1.2, size=c).astype(np.float32)
        sd[f"{name}.bias"] = (rng.normal(size=c) * 0.02).astype(np.float32)
        sd[f"{name}.running_mean"] = (rng.normal(size=c) * 0.1).astype(np.float32)
        sd[f"{name}.running_var"] = rng.uniform(0.5, 2.0, size=c).astype(np.float32)

    conv("conv1", 16, 3, 7)
    bn("bn1", 16)
    inc = 16
    for stage, c in enumerate((64, 128), start=1):
        p = f"layer{stage}.0"
        conv(f"{p}.conv1", c, inc, 3)
        bn(f"{p}.bn1", c)
        conv(f"{p}.conv2", c, c, 3)
        bn(f"{p}.bn2", c)
        conv(f"{p}.downsample.0", c, inc, 1)
        bn(f"{p}.downsample.1", c)
        inc = c
    return sd


@pytest.fixture(scope="module")
def pretrained_dir(tmp_path_factory):
    """torch.save a checkpoint, convert it via the CLI, return the dir."""
    import torch

    tmp = tmp_path_factory.mktemp("pretrained")
    rng = np.random.default_rng(42)
    sd = {k: torch.tensor(v) for k, v in _synthetic_tiny_resnet_sd(rng).items()}
    ckpt = tmp / "tiny.pth"
    # wrapper layout + DataParallel prefixes, as found in real checkpoints
    torch.save({"state_dict": {f"module.{k}": v for k, v in sd.items()}}, ckpt)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["NKBX_PRETRAINED_DIR"] = str(tmp)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-m", "nkbx.models.convert",
         "--model", "resnet_tiny_test", "--weights", str(ckpt)],
        env=env, capture_output=True, text=True, timeout=560,
    )
    assert r.returncode == 0, f"STDOUT:{r.stdout}\nSTDERR:{r.stderr[-3000:]}"
    assert (tmp / "resnet_tiny_test.msgpack").exists()
    return tmp


class TestPretrainedEndToEnd:
    def test_get_model_loads_converted_weights(self, pretrained_dir, monkeypatch):
        from nkbx.models import get_model

        monkeypatch.setenv("NKBX_PRETRAINED_DIR", str(pretrained_dir))
        model = get_model(
            {"task": "single", "model": "resnet_tiny_test", "pretrained": True},
            classes=["a", "b"], input_size=(32, 32), dtype=jnp.float32,
        )
        from nkbx.models.convert import s2d_conv1_weight

        sd = _synthetic_tiny_resnet_sd(np.random.default_rng(42))
        got = np.asarray(model.params["backbone"]["ConvBN_0"]["Conv_0"]["kernel"])
        want = s2d_conv1_weight(np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
        np.testing.assert_array_equal(got, want)
        got_var = np.asarray(
            model.batch_stats["backbone"]["BasicBlock_1"]["ConvBN_1"]["BatchNorm_0"]["var"]
        )
        np.testing.assert_array_equal(got_var, sd["layer2.0.bn2.running_var"])

    def test_missing_checkpoint_warns(self, monkeypatch, tmp_path):
        from nkbx.models.registry import create_backbone

        monkeypatch.setenv("NKBX_PRETRAINED_DIR", str(tmp_path))
        with pytest.warns(UserWarning, match="no converted checkpoint"):
            create_backbone("resnet_tiny_test", pretrained=True)

    def test_finetune_from_converted_weights(self, pretrained_dir, monkeypatch):
        """Fine-tuning from converted weights must run and reduce loss —
        the reference's primary use-case (every shipped config sets
        pretrained: True, configs/singletask_config.py:141)."""
        from nkbx.models import get_model
        from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

        monkeypatch.setenv("NKBX_PRETRAINED_DIR", str(pretrained_dir))
        model = get_model(
            {"task": "single", "model": "resnet_tiny_test", "pretrained": True},
            classes=["a", "b"], input_size=(32, 32), dtype=jnp.float32,
        )
        criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
        bundle = get_optimizer(model.params, {"type": "adam", "lr": 3e-3})
        step = build_train_step(model, criterion, bundle)
        state = TrainState.create(model.params, model.batch_stats, bundle.tx)

        r = np.random.default_rng(0)
        lab = r.integers(0, 2, (8,)).astype(np.int64)
        img = np.zeros((8, 32, 32, 3), np.uint8)
        img[lab == 0] = 40
        img[lab == 1] = 210
        img = jnp.asarray(img + r.integers(0, 20, img.shape).astype(np.uint8))
        one = jnp.asarray(1.0)
        key = jax.random.PRNGKey(0)

        losses = []
        for _ in range(8):
            state, metrics = step(state, img, jnp.asarray(lab),
                                  jnp.ones((8,), bool), key, one, one)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
