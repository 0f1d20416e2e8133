"""Heavy-augmentation multi-task config (reference configs/trtconfig.py surface):
motion blur, shadows, fog, rain — all as fused on-device kernels."""

import nkbx.transforms as T

enable_mixed_precision = True
compile = True
show_full_current_loss_in_terminal = False
log_gradients = True
n_epochs = 2

experiment_name = "heavy_augs_run"
experiment = {
    "comet": None,
    "local": {"path": f"data/runs/{experiment_name}"},
}

task = "multi"
target_names = [
    "dog_size",
    "dog_fur",
    "dog_color",
    "dog_ear_type",
    "dog_muzzle_len",
    "dog_leg_len",
]

annotations_path = "data/annotations.csv"
image_base_dir = "data/images"

train_data = {
    "type": "AnnotatedMultitaskDataset",
    "annotations_file": annotations_path,
    "image_base_dir": image_base_dir,
    "target_names": target_names,
    "fold": "train",
    "shuffle": True,
    "batch_size": 64,
    "num_workers": 8,
    "drop_last": True,
}
val_data = {**train_data, "fold": "val", "shuffle": False, "drop_last": False}

img_size = 224

train_pipeline = T.Compose([
    T.LongestMaxSize(img_size),
    T.PadIfNeeded(img_size, img_size, border_mode=0, value=0),
    T.MotionBlur(blur_limit=3, p=0.5),
    T.RandomBrightnessContrast(brightness_limit=(-0.2, 0.2), contrast_limit=(0.1, -0.5), p=0.5),
    T.HueSaturationValue(hue_shift_limit=0, sat_shift_limit=10, val_shift_limit=50, p=0.5),
    T.RandomShadow(p=0.5),
    T.RandomFog(fog_coef_lower=0.3, fog_coef_upper=0.5, alpha_coef=0.28, p=0.5),
    T.RandomRain(p=0.5),
    T.CoarseDropout(max_holes=4, min_holes=1, max_height=0.2, min_height=0.05,
                    max_width=0.2, min_width=0.05, fill_value=[0, 0.5, 1], p=0.5),
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
    "model": "mobilenetv3_large_100",
    "pretrained": True,
    "backbone_dropout": 0.1,
    "classifier_dropout": 0.1,
    "classifier_initialization": "kaiming_normal_",
}

optimizer = {"type": "nadam", "lr": 1e-4, "weight_decay": 0.01}
lr_policy = {"type": "multistep", "steps": [5, 10], "gamma": 0.1}
backbone_state_policy = {0: "freeze", 2: "unfreeze"}
criterion = {"task": task, "type": "FocalLoss", "gamma": 2.0}
