"""nkbx "modern recipe" config — RandAugment + Mixup/CutMix + label smoothing
+ model EMA + cosine schedule, the timm-style training recipe, all on-device.

The reference has no analog (its configs stop at albumentations photometric
ops); every piece here runs inside the ONE jitted train step. Measured cost
of the full recipe's augmentation at bs=128 @224: RandAugment num_ops=2 is
23.2 ms/batch (PERF.md round 3) against a 47 ms ResNet-50 step.
"""

import nkbx.transforms as T

enable_mixed_precision = True
compile = True

experiment_name = "modern_recipe_run_1"
experiment = {
    "comet": None,
    "local": {"path": f"data/runs/{experiment_name}"},
}

task = "single"
n_epochs = 90

train_data = {
    "type": "ImageFolder",
    "root": "data/train",
    "shuffle": True,
    "batch_size": 128,  # per chip; 128 aligns the batch-minor lane tiling (PERF.md)
    "num_workers": 16,
    "drop_last": True,
}
val_data = {
    "type": "ImageFolder",
    "root": "data/val",
    "shuffle": False,
    "batch_size": 128,
    "num_workers": 16,
    "drop_last": False,
}

img_size = 224

train_pipeline = T.Compose([
    # host stage: deterministic geometry only (static shapes for the loader)
    T.LongestMaxSize(img_size),
    T.PadIfNeeded(img_size, img_size, border_mode=0, value=0),
    # device stage: the full 14-op torchvision policy, fused on-chip.
    #   num_ops / magnitude / num_magnitude_bins: torchvision semantics.
    #   num_affine_grids (nkbx knob, default 4): affine sub-ops sample through
    #   K batch-shared warp grids — per-sample (op, sign, magnitude) marginals
    #   are exactly torchvision's; within one batch at most K distinct affine
    #   combinations appear (pointwise ops are exactly per-sample). Higher K =
    #   more within-batch diversity at ~5.6 ms/grid.
    # T.TrivialAugmentWide() is the zero-tuning alternative (one op/image at a
    # per-image random magnitude).
    T.RandAugment(num_ops=2, magnitude=9, num_affine_grids=4),
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
    "model": "resnet50",
    "pretrained": True,
    "classifier_dropout": 0.0,
    "classifier_initialization": "kaiming_normal_",
}

optimizer = {"type": "sgd", "lr": 0.5, "momentum": 0.9, "weight_decay": 2e-5}
lr_policy = {"type": "cosine", "n_epochs": n_epochs}
criterion = {"task": task, "type": "CrossEntropyLoss", "label_smoothing": 0.1}

# on-device Mixup/CutMix (timm batch-mode semantics: one lam per batch,
# partner = reversed batch; padded rows stay unmixed)
mixup = {"mixup_alpha": 0.2, "cutmix_alpha": 1.0, "prob": 0.5}

# timm ModelEmaV2 over params AND BN buffers; eval/checkpoint-best use the EMA
model_ema_decay = 0.9998

# K train steps per device dispatch (lax.scan): amortizes per-dispatch host
# round trips on remote-hosted TPUs; per-step semantics identical
steps_per_dispatch = 20

# epoch-level metrics accumulation for ImageNet-scale runs
metrics_accumulation = "bounded"
