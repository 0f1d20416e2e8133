"""Reverse (flax -> torch) weight conversion: exact round-trip per family.

The reverse converter (nkbx/models/reverse.py) inverts the forward
converters generically by tracing element ids through them, so the test is
the strongest possible: convert a randomized torch state_dict forward, run
it back, and require BIT-EXACT equality on every emitted key — plus that
the result loads into the torch replica module (the pinned upstream layout,
nkbx/models/torch_ref.py) with ``strict=False`` whose missing_keys are
exactly the reported ``skipped`` list.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nkbx.models.convert import (convert_reference_checkpoint,  # noqa: E402
                                 convert_torch_state_dict)
from nkbx.models.reverse import (reverse_reference_checkpoint,  # noqa: E402
                                 reverse_torch_state_dict)
from nkbx.models.torch_ref import build_replica  # noqa: E402

pytestmark = pytest.mark.slow  # integration tier: excluded by -m 'not slow'


# one representative per family + the special stems/branches: tiered stem
# (resnet14t), SE + grouped convs (seresnext), s2d 7x7 stem (resnet18),
# fused-qkv ViT, unicom feature head (bias-free patch conv -> synthesized
# zeros branch), swin (>=0.9 downsample layout, skipped buffers)
NAMES = [
    "resnet18",
    "resnet14t",
    "resnet50d",
    "seresnext50_32x4d",
    "mobilenetv3_small_100",
    "efficientnet_b0",
    "efficientnetv2_s",
    "densenet121",
    "convnext_tiny",
    "vit_tiny_patch16_224",
    "unicom ViT-B/32",
    "swin_tiny_patch4_window7_224",
]

# keys the forward conversion legitimately never consumes: classifier heads
# nkbx replaces, BN step counters, and swin's recomputed buffers
_SKIP_OK = ("head.", "fc.", "classifier.", "num_batches_tracked",
            "relative_position_index", "attn_mask")


def _randomized_state_dict(name, seed=0):
    torch.manual_seed(seed)
    replica = build_replica(name)
    sd = replica.state_dict()
    with torch.no_grad():
        for v in sd.values():
            if v.is_floating_point() and v.numel():
                v.copy_(torch.randn_like(v))
    return replica, {k: v.numpy().copy() for k, v in sd.items()}


@pytest.mark.parametrize("name", NAMES)
def test_roundtrip_bit_exact(name):
    replica, np_sd = _randomized_state_dict(name)

    converted = convert_torch_state_dict(name, np_sd)
    back, skipped = reverse_torch_state_dict(name, converted)

    for k, v in back.items():
        assert np.array_equal(v, np_sd[k]), f"{name}: {k} does not round-trip"
        assert v.dtype == np_sd[k].dtype, k
    for k in skipped:
        assert any(s in k for s in _SKIP_OK), (
            f"{name}: unexpectedly unconsumed key {k}")

    missing, unexpected = replica.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in back.items()}, strict=False)
    assert not unexpected
    # torch's _BatchNorm._load_from_state_dict backward-compat path fills a
    # missing num_batches_tracked with 0 instead of reporting it (no version
    # metadata when loading a plain dict), so those skipped keys never appear
    # in missing_keys
    assert set(missing) == {k for k in skipped
                            if "num_batches_tracked" not in k}


def test_roundtrip_from_flax_init():
    """The real user path: weights that were never torch — a freshly
    initialized (then notionally trained) nkbx backbone reverses into a
    loadable torch state_dict (structure parity with the converter output is
    already pinned by tests/test_convert.py)."""
    import jax
    import jax.numpy as jnp

    from nkbx.models.registry import create_backbone

    module = create_backbone("resnet_tiny_test", dtype=jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                            train=False)
    tree = {"params": jax.device_get(variables["params"]),
            "batch_stats": jax.device_get(variables.get("batch_stats", {}))}

    back, skipped = reverse_torch_state_dict("resnet_tiny_test", tree)

    replica = build_replica("resnet_tiny_test")
    missing, unexpected = replica.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in back.items()},
        strict=False)
    assert not unexpected
    assert set(missing) == {k for k in skipped
                            if "num_batches_tracked" not in k}
    # spot-check the s2d stem inversion: the flax (4,4,4C,O) kernel's live
    # taps land in the 7x7 torch kernel with the exact inverse regroup
    from nkbx.models.convert import s2d_conv1_weight_inverse

    w7 = s2d_conv1_weight_inverse(tree["params"]["ConvBN_0"]["Conv_0"]["kernel"])
    assert np.array_equal(back["conv1.weight"],
                          np.transpose(w7, (3, 2, 0, 1)).astype(np.float32))


def _reference_sd(name, heads):
    """A reference-trained classifier state_dict: emb_model.* + heads."""
    _, np_sd = _randomized_state_dict(name, seed=1)
    out = {f"emb_model.{k}": v for k, v in np_sd.items()}
    rng = np.random.default_rng(2)
    feat = 128  # resnet_tiny_test embedding width
    for prefix, n_cls in heads.items():
        out[f"{prefix}.weight"] = rng.normal(size=(n_cls, feat)).astype(np.float32)
        out[f"{prefix}.bias"] = rng.normal(size=(n_cls,)).astype(np.float32)
    return out


@pytest.mark.parametrize("heads", [
    {"classifier.1": 5},                                  # single-task
    {"classifier.color.1": 3, "classifier.body.1": 7},    # multi-task
])
def test_reference_checkpoint_roundtrip(heads):
    sd = _reference_sd("resnet_tiny_test", heads)
    variables = convert_reference_checkpoint("resnet_tiny_test", sd)
    back, skipped = reverse_reference_checkpoint("resnet_tiny_test", variables)

    for k, v in back.items():
        assert np.array_equal(v, sd[k]), f"{k} does not round-trip"
    for k in skipped:
        assert k.startswith("emb_model.") and any(s in k for s in _SKIP_OK), k
    assert set(back) | set(skipped) == set(sd) | set(skipped)


def test_cli_to_torch(tmp_path):
    """CLI: msgpack (full classifier tree) -> reference-layout .pth."""
    from nkbx.models.convert import main, save_params_msgpack

    sd = _reference_sd("resnet_tiny_test", {"classifier.1": 4})
    variables = convert_reference_checkpoint("resnet_tiny_test", sd)
    src = tmp_path / "best.msgpack"
    save_params_msgpack(variables, str(src))

    out = tmp_path / "ref.pth"
    main(["--model", "resnet_tiny_test", "--to-torch",
          "--weights", str(src), "--out", str(out)])

    loaded = torch.load(str(out), map_location="cpu", weights_only=True)
    assert np.array_equal(loaded["classifier.1.weight"].numpy(),
                          sd["classifier.1.weight"])
    assert np.array_equal(loaded["emb_model.conv1.weight"].numpy(),
                          sd["emb_model.conv1.weight"])


def test_cli_to_torch_orbax_dir(tmp_path):
    """CLI: an orbax checkpoint dir (what train.py's weights/best|last hold —
    full train-state payload) reverses to a reference-layout .pth; the extra
    state (opt_state, step, meta) is ignored by the weight extraction."""
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from nkbx.models.convert import main

    sd = _reference_sd("resnet_tiny_test", {"classifier.1": 4})
    variables = convert_reference_checkpoint("resnet_tiny_test", sd)
    # an EMA shadow that differs from the raw params (shifted by 1)
    shifted = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) + 1.0, variables["params"])
    payload = {
        "params": jax.tree_util.tree_map(jnp.asarray, variables["params"]),
        "batch_stats": jax.tree_util.tree_map(
            jnp.asarray, variables["batch_stats"]),
        "ema_params": shifted,
        "ema_batch_stats": jax.tree_util.tree_map(
            jnp.asarray, variables["batch_stats"]),
        "step": jnp.zeros((), jnp.int32),
        "meta": {"epoch": 1, "best_val_acc": 0.0},
    }
    ckpt_dir = tmp_path / "weights" / "best"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(ckpt_dir.resolve(), payload)

    out = tmp_path / "ref.pth"
    main(["--model", "resnet_tiny_test", "--to-torch",
          "--weights", str(ckpt_dir), "--out", str(out)])

    loaded = torch.load(str(out), map_location="cpu", weights_only=True)
    assert np.array_equal(loaded["classifier.1.weight"].numpy(),
                          sd["classifier.1.weight"])
    assert np.array_equal(loaded["emb_model.conv1.weight"].numpy(),
                          sd["emb_model.conv1.weight"])

    # --ema exports the shadow instead
    out_ema = tmp_path / "ref_ema.pth"
    main(["--model", "resnet_tiny_test", "--to-torch", "--ema",
          "--weights", str(ckpt_dir), "--out", str(out_ema)])
    loaded_ema = torch.load(str(out_ema), map_location="cpu",
                            weights_only=True)
    assert np.array_equal(loaded_ema["emb_model.conv1.weight"].numpy(),
                          sd["emb_model.conv1.weight"] + 1.0)


def test_cli_to_torch_bare_backbone(tmp_path):
    """CLI: a converted-backbone msgpack reverses to a timm-layout .pth."""
    from nkbx.models.convert import main, save_params_msgpack

    _, np_sd = _randomized_state_dict("resnet_tiny_test", seed=3)
    converted = convert_torch_state_dict("resnet_tiny_test", np_sd)
    src = tmp_path / "backbone.msgpack"
    save_params_msgpack(converted, str(src))

    out = tmp_path / "backbone.pth"
    main(["--model", "resnet_tiny_test", "--to-torch",
          "--weights", str(src), "--out", str(out)])

    loaded = torch.load(str(out), map_location="cpu", weights_only=True)
    assert np.array_equal(loaded["conv1.weight"].numpy(), np_sd["conv1.weight"])


def test_cli_to_torch_ema_missing(tmp_path):
    """--ema on an artifact without an EMA shadow fails loudly."""
    from nkbx.models.convert import main, save_params_msgpack

    _, np_sd = _randomized_state_dict("resnet_tiny_test", seed=5)
    converted = convert_torch_state_dict("resnet_tiny_test", np_sd)
    src = tmp_path / "backbone.msgpack"
    save_params_msgpack(converted, str(src))
    with pytest.raises(ValueError, match="no separate EMA shadow"):
        main(["--model", "resnet_tiny_test", "--to-torch", "--ema",
              "--weights", str(src), "--out", str(tmp_path / "x.pth")])


def test_extra_leaves_fail_loudly():
    """A converted tree holding params the named model's converter never
    produces (wrong --model for the weights) must raise, not silently drop
    the extras from the export."""
    _, np_sd = _randomized_state_dict("resnet_tiny_test", seed=6)
    converted = convert_torch_state_dict("resnet_tiny_test", np_sd)
    converted["params"]["SEModule_0"] = {
        "kernel": np.zeros((4, 4), np.float32)}
    with pytest.raises(ValueError, match="wrong --model"):
        reverse_torch_state_dict("resnet_tiny_test", converted)


def test_synthesized_leaf_warns_when_trained():
    """A flax param the torch layout has no slot for (unicom's bias-free
    patch conv -> nkbx zeros bias) warns when it carries trained values."""
    _, np_sd = _randomized_state_dict("unicom ViT-B/32", seed=4)
    converted = convert_torch_state_dict("unicom ViT-B/32", np_sd)
    converted["params"]["patch_embed"]["bias"] = (
        converted["params"]["patch_embed"]["bias"] + 1.0)
    with pytest.warns(UserWarning, match="no torch-side tensor"):
        back, _ = reverse_torch_state_dict("unicom ViT-B/32", converted)
    assert "patch_embed.proj.bias" not in back
