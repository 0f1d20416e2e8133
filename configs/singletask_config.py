"""nkbx single-task training config — documents every knob.

Same public surface as the reference's configs/singletask_config.py, with
pipelines declared via nkbx.transforms instead of albumentations (same names
and parameters) and no CUDA device strings (the TPU mesh is configured via
``mesh``).
"""

import nkbx.transforms as T

enable_mixed_precision = True  # bf16 compute on TPU (no GradScaler needed)
compile = True  # everything is jitted; kept for reference-config compat

experiment_name = "train_singletask_run_1"

experiment = {
    "comet": None,  # or {"comet_api_cfg_path": "configs/comet_api_cfg.yml",
    #                     "auto_metric_logging": False, "name": experiment_name}
    "local": {  # model weights, metrics and class names are saved here
        "path": f"data/runs/{experiment_name}",
    },
}

log_gradients = False  # include per-parameter gradient norms in logs
show_all_classes_in_confusion_matrix = True

# "exact" (default): per-sample epoch metrics, bit-compatible with the
# reference's sklearn path. "bounded": O(C^2) device-side accumulation
# (confusion counts + score histograms) for ImageNet-scale epochs — balanced
# accuracy stays exact, ROC-AUC within ~1/8192.
metrics_accumulation = "exact"

# lax.scan K train steps per device dispatch (1 = off). Amortizes the
# per-dispatch host round trip on remote-hosted TPUs; per-step semantics are
# unchanged. The loader feeds K batches per dispatch, so host prefetch must
# keep up with K-step bursts.
steps_per_dispatch = 1

# gradient accumulation: split each batch into A sequential microbatches and
# apply ONE optimizer update equal to the full-batch gradient (weighted by
# each microbatch's criterion mass, so class-weighted CE and focal stay
# exact single-task; multi-task with class weights raises — per-target
# masses cannot share one scalar). Activation memory scales with batch/A —
# use when the target batch does not fit in HBM. BatchNorm batch statistics
# are per-microbatch (ghost-BN, as in torch accumulation). Mutually
# exclusive with steps_per_dispatch.
grad_accum_steps = 1

# model EMA (0 = off): keep an exponential-moving-average shadow of the
# params, updated in the train step (e <- d*e + (1-d)*p, the torch-timm
# ModelEmaV2 recipe). When on, validation, the best-checkpoint decision and
# the portable best/last msgpacks use the EMA weights.
model_ema_decay = 0.0

# Mixup/CutMix (None = off; timm.data.Mixup batch-mode semantics, run
# on-device inside the jitted step): one Beta(alpha) lam per step, rows mixed
# with the reversed batch; CutMix pastes a random box with lam corrected to
# its area. Loss becomes lam*loss(labels) + (1-lam)*loss(labels[partner]).
# Padded rows pair with themselves (exactly unmixed), so drop_last=False and
# multi-host sentinel padding are safe.
# mixup = {"alpha": 0.2, "cutmix_alpha": 1.0, "prob": 1.0, "switch_prob": 0.5}
mixup = None

task = "single"

# optimizer moments while the backbone is frozen (backbone_state_policy):
# "decay" (default) feeds zero gradients, so Adam moments decay toward zero
# during a freeze; "torch" reproduces torch exactly — frozen params are
# skipped, moments and the bias-correction step count stay stale until
# unfreeze (lockstep-tested vs torch across a freeze->unfreeze boundary).
freeze_semantics = "decay"

# SIGTERM (preemptible/spot VM) handling: the engine breaks at a step
# boundary, saves the FULL train state + a batch cursor, and --resume
# continues the interrupted epoch at that exact batch. Multi-host runs
# OR-reduce the per-host flags every preempt_sync_every batches so all
# hosts break at the same step (0 = epoch-boundary-only agreement).
preempt_checkpoint = True
preempt_sync_every = 8

# optional multi-chip mesh: {"data": 8} => 8-way data parallel
mesh = None

# FSDP (ZeRO-3-style): scatter large parameters AND their optimizer moments
# over the mesh's data axis instead of replicating them — XLA inserts the
# all-gather before each use and a reduce-scatter for the gradients.
# Numerically equal to replicated data parallelism; turn on when the model +
# adam moments do not fit replicated in HBM. Requires `mesh`.
fsdp = False

"""
Datasets. type: AnnotatedSingletaskDataset, AnnotatedMultitaskDataset,
GroupsDataset, AnnotatedYOLODataset, default - ImageFolder.

AnnotatedSingletaskDataset keys:
  annotations_file: CSV with 'path', 'fold' and the target column
  image_base_dir: base dir for relative paths (optional)
  target_column: column with class labels
  classes: optional explicit class list (else inferred sorted-unique)
  fold: train / val / test
  weighted_sampling: inverse-class-frequency sampling with replacement
  + batch_size / shuffle / num_workers / drop_last
"""

annotations_path = "data/annotations.csv"
image_base_dir = "data/images"

target_column = "label"
classes = ["first_class", "second_class"]

train_data = {
    "type": "AnnotatedSingletaskDataset",
    "annotations_file": annotations_path,
    "image_base_dir": image_base_dir,
    "target_column": target_column,
    "classes": classes,
    "fold": "train",
    "weighted_sampling": True,
    "shuffle": True,
    "batch_size": 64,
    "num_workers": 8,
    "drop_last": True,
}

val_data = {
    "type": "AnnotatedSingletaskDataset",
    "annotations_file": annotations_path,
    "image_base_dir": image_base_dir,
    "target_column": target_column,
    "classes": classes,
    "fold": "val",
    "weighted_sampling": False,
    "shuffle": False,
    "batch_size": 64,
    "num_workers": 8,
    "drop_last": False,
}

"""
Transforms: geometry first (host stage), then random photometric ops
(fused batched device stage). Same op names/params as albumentations.
"""

img_size = 128

train_pipeline = T.Compose(
    [
        T.LongestMaxSize(img_size),
        T.PadIfNeeded(img_size, img_size, border_mode=0, value=0),
        T.HorizontalFlip(p=0.5),
        T.VerticalFlip(p=0.5),
        T.RandomBrightnessContrast(
            brightness_limit=(-0.2, 0.2),
            contrast_limit=(0.1, -0.5),
            p=0.5,
        ),
        T.HueSaturationValue(
            hue_shift_limit=0,
            sat_shift_limit=10,
            val_shift_limit=50,
            p=0.5,
        ),
        T.CoarseDropout(
            max_holes=4,
            min_holes=1,
            max_height=0.2,
            min_height=0.05,
            max_width=0.2,
            min_width=0.05,
            fill_value=[0, 0.5, 1],
            p=0.5,
        ),
        T.Normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
        T.ToTensorV2(),
    ]
)

val_pipeline = T.Compose(
    [
        T.LongestMaxSize(img_size),
        T.PadIfNeeded(img_size, img_size, border_mode=0, value=0),
        T.Normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
        T.ToTensorV2(),
    ]
)

"""
Model and optimization. Backbone names are timm/unicom-compatible:
resnet14t/18/34/50, mobilenetv3_large_100, efficientnet_b0/b2, convnext_tiny/
base, vit_base_patch16/32_224, "unicom ViT-B/32".
"""

model = {
    "task": task,
    "model": "resnet14t",
    "pretrained": True,  # converted pretrained weights from $NKBX_PRETRAINED_DIR
    # "checkpoint": "data/runs/previous/weights/last",  # warm start (optional)
    "backbone_dropout": 0.1,
    "classifier_dropout": 0.1,
    "classifier_initialization": "kaiming_normal_",
}

optimizer = {
    "type": "nadam",  # adam / radam / nadam (decoupled wd) / sparse_adam / sgd
    "lr": 1e-5,
    "backbone_lr": 1e-5,
    "classifier_lr": 1e-4,
    "weight_decay": 0.2,
    "backbone_weight_decay": 0.01,
    "classifier_weight_decay": 0.2,
}

n_epochs = 5

# export best/last .nkbx serving bundles at the end of training (the
# reference's per-epoch TorchScript analog; orbax checkpoints cover resume)
export_serving = False

lr_policy = {
    "type": "cosine",  # step / multistep / cosine (stepped once per epoch)
    "n_epochs": n_epochs,
}

# epoch -> freeze/unfreeze the backbone (optimizer-side mask; no recompiles)
backbone_state_policy = {0: "freeze", 5: "unfreeze", 10: "freeze"}

criterion = {"task": task, "type": "CrossEntropyLoss"}
