"""nkbx YOLO-crops training config — BASELINE config #5 shape.

Trains a classifier on bbox crops cut out of an ultralytics-style YOLO
detection dataset (reference configs/yolo_dataset_config.yaml +
singletask-on-yolo-crops flow, dataset.py:237-479): the YAML lists
``path``/``train``/``val``/``names`` (and optionally a ``download`` URL), the
loader scans the ``images/`` <-> ``labels/`` convention, converts xywhn boxes
to clipped xyxy crops, filters tiny boxes, and can synthesize background-class
crops with IoU-overlap rejection.
"""

import nkbx.transforms as T

enable_mixed_precision = True

experiment_name = "train_yolo_crops_run_1"

experiment = {
    "comet": None,
    "local": {"path": f"data/runs/{experiment_name}"},
}

log_gradients = False
show_all_classes_in_confusion_matrix = True

task = "single"
mesh = None  # or {"data": 8} for an 8-chip data-parallel slice

# ultralytics dataset YAML (see reference configs/yolo_dataset_config.yaml):
#   path: .          # dataset root
#   train: [data1/train/images/, data2/]   # dirs / txt lists / globs
#   val:   [data_val/val/images/]
#   names: {0: cat, 1: dog}                # must form range(n) without skips
#   download: https://...zip               # optional auto-download
yolo_yaml = "data/yolo_dataset.yaml"

img_size = 128
batch_size = 64
n_epochs = 30

train_data = {
    "type": "AnnotatedYOLODataset",
    "annotations_file": yolo_yaml,
    "fold": "train",
    "min_box_size": 5,              # drop boxes smaller than this (pixels)
    "generate_backgrounds": True,   # add a "<GENERATED>_background" class
    "background_generating_prob": None,  # default: 1 / n_classes
    "background_crop_sizes": (0.1, 0.3),  # relative crop size range
    "weighted_sampling": True,
    "shuffle": True,
    "batch_size": batch_size,
    "num_workers": 8,
    "size": (img_size, img_size),
    "drop_last": True,
}

val_data = {
    "type": "AnnotatedYOLODataset",
    "annotations_file": yolo_yaml,
    "fold": "val",
    "min_box_size": 5,
    "generate_backgrounds": True,
    "shuffle": False,
    "batch_size": batch_size,
    "num_workers": 8,
    "size": (img_size, img_size),
    "drop_last": False,
}

train_pipeline = T.Compose([
    T.LongestMaxSize(max_size=img_size),
    T.PadIfNeeded(img_size, img_size, border_mode=0, value=0),
    T.HorizontalFlip(p=0.5),
    T.RandomBrightnessContrast(p=0.3),
    T.HueSaturationValue(p=0.3),
    T.Normalize(),
])

val_pipeline = T.Compose([
    T.LongestMaxSize(max_size=img_size),
    T.PadIfNeeded(img_size, img_size, border_mode=0, value=0),
    T.Normalize(),
])

model = {
    "task": task,
    "model": "mobilenetv3_large_100",
    "pretrained": True,  # converted weights under $NKBX_PRETRAINED_DIR
    "backbone_dropout": 0.0,
    "classifier_dropout": 0.2,
    "classifier_initialization": "kaiming_normal_",
}

optimizer = {
    "type": "nadam",
    "lr": 1e-4,
    "weight_decay": 0.2,
    "backbone_lr": 1e-5,
    "backbone_weight_decay": 0.01,
    "classifier_lr": 3e-4,
    "classifier_weight_decay": 0.2,
}

lr_policy = {"type": "multistep", "steps": [10, 20], "gamma": 0.1}

criterion = {"task": task, "type": "FocalLoss", "gamma": 2.0}

backbone_state_policy = {0: "freeze", 5: "unfreeze"}

# export a .nkbx serving bundle for best/last at the end of training
export_serving = True
