"""nkbx offline-eval config (reference configs/eval_config.py surface).

Evaluates an exported serving bundle (``scripted: True``) or a rebuildable
checkpointed model on a labeled dataset and writes metrics.json.
"""

import nkbx.transforms as T

enable_mixed_precision = True
compile = True

train_run_path = "data/runs/train_singletask_run_1"
save_path = "data/runs/val_singletask_run_1"

task = "single"
target_column = "label"

annotations_path = "data/annotations.csv"
image_base_dir = "data/images"

val_data = {
    "type": "AnnotatedSingletaskDataset",
    "annotations_file": annotations_path,
    "image_base_dir": image_base_dir,
    "target_column": target_column,
    "classes": f"{train_run_path}/classes.json",
    "fold": "val",
    "weighted_sampling": False,
    "shuffle": False,
    "batch_size": 64,
    "num_workers": 8,
    "drop_last": False,
}

img_size = 128

val_pipeline = T.Compose([
    T.LongestMaxSize(img_size),
    T.PadIfNeeded(img_size, img_size, border_mode=0, value=0),
    T.Normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
    T.ToTensorV2(),
])

# either an exported serving bundle:
model = {
    "scripted": True,
    "checkpoint": f"{train_run_path}/weights/best.nkbx",
}
# ...or rebuild from config + checkpoint:
# model = {
#     "task": task,
#     "model": "resnet14t",
#     "pretrained": False,
#     "checkpoint": f"{train_run_path}/weights/best",
#     "backbone_dropout": 0.0,
#     "classifier_dropout": 0.0,
#     "classifier_initialization": "kaiming_normal_",
# }

criterion = {"task": task, "type": "CrossEntropyLoss"}
