"""nkbx multi-task training config (reference configs/multitask_config.py surface)."""

import nkbx.transforms as T

enable_mixed_precision = True
compile = True

experiment_name = "train_multitask_run_1"

experiment = {
    "comet": None,
    "local": {"path": f"data/runs/{experiment_name}"},
}

show_full_current_loss_in_terminal = False  # per-task losses in the progress bar
log_gradients = False
show_all_classes_in_confusion_matrix = True

task = "multi"
mesh = None

annotations_path = "data/annotations.csv"
image_base_dir = "data/images"

target_names = ["dog_size", "dog_color"]
classes = {  # optional (may be not specified; inferred from annotations)
    "dog_size": ["bolshoj", "malenkij"],
    "dog_color": ["chernyj", "belyj"],
}

train_data = {
    "type": "AnnotatedMultitaskDataset",
    "annotations_file": annotations_path,
    "image_base_dir": image_base_dir,
    "target_names": target_names,
    "classes": classes,
    "fold": "train",
    "weighted_sampling": False,
    "shuffle": True,
    "batch_size": 64,
    "num_workers": 8,
    "drop_last": True,
}

val_data = {
    "type": "AnnotatedMultitaskDataset",
    "annotations_file": annotations_path,
    "image_base_dir": image_base_dir,
    "target_names": target_names,
    "classes": classes,
    "fold": "val",
    "weighted_sampling": False,
    "shuffle": False,
    "batch_size": 64,
    "num_workers": 8,
    "drop_last": False,
}

img_size = 224

train_pipeline = T.Compose([
    T.LongestMaxSize(img_size),
    T.PadIfNeeded(img_size, img_size, border_mode=0, value=0),
    T.HorizontalFlip(p=0.5),
    T.RandomBrightnessContrast(brightness_limit=(-0.2, 0.2), contrast_limit=(-0.2, 0.2), p=0.5),
    T.Normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
    T.ToTensorV2(),
])

val_pipeline = T.Compose([
    T.LongestMaxSize(img_size),
    T.PadIfNeeded(img_size, img_size, border_mode=0, value=0),
    T.Normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
    T.ToTensorV2(),
])

model = {
    "task": task,
    "model": "efficientnet_b0",
    "pretrained": True,
    "backbone_dropout": 0.1,
    "classifier_dropout": 0.1,
    "classifier_initialization": "kaiming_normal_",
}

optimizer = {
    "type": "nadam",
    "lr": 1e-4,
    "backbone_lr": 1e-5,
    "classifier_lr": 1e-4,
    "weight_decay": 0.01,
}

n_epochs = 10

lr_policy = {"type": "cosine", "n_epochs": n_epochs}

backbone_state_policy = {0: "freeze", 3: "unfreeze"}

criterion = {"task": task, "type": "CrossEntropyLoss"}
