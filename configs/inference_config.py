"""nkbx folder-inference config (reference configs/inference_config.py surface)."""

import nkbx.transforms as T

enable_mixed_precision = True
compile = True

save_path = "data/runs/infer_singletask_run_1"
train_run_path = "data/runs/train_singletask_run_1"

task = "single"
target_column = "label"
classes = f"{train_run_path}/classes.json"

inference_data = {
    "folder_path": "data/unknown_images",
    "batch_size": 64,
    "num_workers": 8,
}

img_size = 128

inference_pipeline = T.Compose([
    T.LongestMaxSize(img_size),
    T.PadIfNeeded(img_size, img_size, border_mode=0, value=0),
    T.Normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
    T.ToTensorV2(),
])

model = {
    "scripted": True,
    "checkpoint": f"{train_run_path}/weights/best.nkbx",
}
