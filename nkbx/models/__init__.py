from nkbx.models.registry import create_backbone, list_backbones
from nkbx.models.classifier import (
    SingletaskClassifier,
    MultitaskClassifier,
    ClassificationModel,
    get_model,
    param_labels,
    is_backbone_param,
)

__all__ = [
    "create_backbone",
    "list_backbones",
    "SingletaskClassifier",
    "MultitaskClassifier",
    "ClassificationModel",
    "get_model",
    "param_labels",
    "is_backbone_param",
]
