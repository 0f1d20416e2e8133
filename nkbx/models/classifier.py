"""Single/multi-task classifiers + model factory.

TPU-native analog of reference model.py:17-177:

- ``SingletaskClassifier``: backbone -> Dropout -> Dense(n_classes);
- ``MultitaskClassifier``: shared backbone -> one Dropout+Dense per target,
  forward returns ``{target: logits}``;
- classifier init strategies kaiming/xavier normal/uniform, bias zeros
  (model.py:45-57 semantics, see nkbx/models/common.py);
- backbone dropout override (model.py:66-72) via the backbone's ``drop_rate``;
- freeze/unfreeze (model.py:59-64) is an optimizer-side mask in nkbx.train —
  the param tree is partitioned into ``backbone`` vs head leaves by name, so
  the jit signature never changes when the policy flips.

The head computes in fp32 (embeddings are small; softmax stability is worth it);
the backbone computes in bf16 with fp32 params.
"""

from __future__ import annotations

from typing import Any, Dict, List, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from nkbx.models.common import INIT_STRATEGIES
from nkbx.models.registry import create_backbone


class SingletaskClassifier(nn.Module):
    backbone: nn.Module
    n_classes: int
    classifier_dropout: float = 0.0
    classifier_initialization: str = "kaiming_normal_"

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        emb = self.backbone(x, train=train, mask=mask)
        emb = nn.Dropout(self.classifier_dropout)(emb, deterministic=not train)
        logits = nn.Dense(
            self.n_classes,
            kernel_init=INIT_STRATEGIES[self.classifier_initialization](),
            bias_init=nn.initializers.zeros,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="head",
        )(emb)
        return logits


class MultitaskClassifier(nn.Module):
    backbone: nn.Module
    classes: Dict[str, List]  # {target_name: [class, ...]}
    classifier_dropout: float = 0.0
    classifier_initialization: str = "kaiming_normal_"

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        emb = self.backbone(x, train=train, mask=mask)
        emb = nn.Dropout(self.classifier_dropout)(emb, deterministic=not train)
        out = {}
        for target_name in sorted(self.classes):
            out[target_name] = nn.Dense(
                len(self.classes[target_name]),
                kernel_init=INIT_STRATEGIES[self.classifier_initialization](),
                bias_init=nn.initializers.zeros,
                dtype=jnp.float32,
                param_dtype=jnp.float32,
                name=f"head_{target_name}",
            )(emb)
        return out


def is_backbone_param(path) -> bool:
    """True if a param tree path belongs to the backbone (vs a classifier head)."""
    for p in path:
        key = getattr(p, "key", None)
        if key == "backbone":
            return True
        if isinstance(key, str) and key.startswith("head"):
            return False
    return False


def param_labels(params):
    """Label pytree ('backbone' | 'classifier') for optax.multi_transform —
    the nkbx analog of the reference's two optimizer param groups (utils.py:10-28).
    """
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "backbone" if is_backbone_param(path) else "classifier", params
    )


class ClassificationModel:
    """Module + variables + metadata bundle (what ``get_model`` returns).

    Attributes:
        module: the Flax classifier module
        variables: {'params': ..., 'batch_stats': ...}
        classes: list (single) or {target: list} (multi)
        task: 'single' | 'multi'
        emb_size: backbone feature dim (reference ``emb_size``)
    """

    def __init__(self, module, variables, classes, task, emb_size):
        self.module = module
        self.variables = variables
        self.classes = classes
        self.task = task
        self.emb_size = emb_size
        self._jit_eval = jax.jit(lambda v, x: self.module.apply(v, x, train=False))
        self._jit_train = jax.jit(
            lambda v, x, rngs: self.module.apply(
                v, x, train=True, rngs=rngs, mutable=["batch_stats"]
            )
        )

    @property
    def params(self):
        return self.variables["params"]

    @property
    def batch_stats(self):
        return self.variables.get("batch_stats", {})

    def apply(self, variables, x, train: bool = False, rngs=None):
        """Forward (jitted). In train mode returns (preds, new_batch_stats)."""
        if train:
            preds, mutated = self._jit_train(variables, x, rngs)
            return preds, mutated.get("batch_stats", {})
        return self._jit_eval(variables, x)

    def __call__(self, x, train: bool = False, rngs=None):
        return self.apply(self.variables, x, train=train, rngs=rngs)


def get_model(
    cfg_model: dict,
    classes: Union[list, dict],
    input_size=(224, 224),
    seed: int = 0,
    dtype: Any = jnp.bfloat16,
) -> ClassificationModel:
    """Build (and optionally checkpoint-load) a classifier from a config dict.

    Config keys (same surface as reference model.py:162-177 + configs):
        task: 'single' | 'multi'
        model: backbone name ('resnet50', 'unicom ViT-B/32', ...)
        pretrained: bool — load converted pretrained backbone weights if found
        checkpoint: optional path to an nkbx checkpoint (orbax dir or .msgpack)
        backbone_dropout / classifier_dropout / classifier_initialization
        scripted: True -> checkpoint is an exported .nkbx serving bundle
            (reference model.py:163-164 TorchScript-load analog)
    """
    if cfg_model.get("scripted", False):
        from nkbx.export import ExportedModel

        return ExportedModel(cfg_model["checkpoint"])

    backbone = create_backbone(
        cfg_model["model"],
        pretrained=cfg_model.get("pretrained", False),
        drop_rate=cfg_model.get("backbone_dropout", 0.0) or 0.0,
        dtype=dtype,
        # family-specific module fields (ghost_bn, fused_bottleneck,
        # remat_stages, fused_attention, ... — see create_backbone)
        **(cfg_model.get("backbone_opts") or {}),
    )
    task = cfg_model.get("task", "single")
    common = dict(
        backbone=backbone,
        classifier_dropout=cfg_model.get("classifier_dropout", 0.0) or 0.0,
        classifier_initialization=cfg_model.get("classifier_initialization", "kaiming_normal_"),
    )
    if task == "single":
        module = SingletaskClassifier(n_classes=len(classes), **common)
    elif task == "multi":
        module = MultitaskClassifier(classes=classes, **common)
    else:
        raise ValueError(f"Unknown task {task!r}")

    h, w = input_size
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    # jit the init: eager init dispatches hundreds of ops one-by-one (painfully
    # slow through a remote-TPU tunnel); compiled it is one program
    init_fn = jax.jit(lambda rng: module.init({"params": rng}, dummy, train=False))
    variables = dict(init_fn(jax.random.PRNGKey(seed)))

    # pretrained backbone weights (converted from torch; see nkbx/models/convert.py)
    if cfg_model.get("pretrained", False):
        from nkbx.models.registry import pretrained_params_path
        from nkbx.models.convert import load_pretrained_into

        path = pretrained_params_path(cfg_model["model"])
        if path:
            variables = load_pretrained_into(variables, path)

    ckpt = cfg_model.get("checkpoint")
    if ckpt:
        from nkbx.train.checkpoint import load_model_variables

        variables = load_model_variables(ckpt, variables)

    return ClassificationModel(module, variables, classes, task, backbone.num_features)
