"""nkbx training CLI — same surface as the reference: ``python train.py -cfg config.py``.

Config files are Python modules with the reference's public keys (task,
train_data/val_data, train_pipeline/val_pipeline, model, optimizer, lr_policy,
backbone_state_policy, criterion, experiment, n_epochs) — see
configs/singletask_config.py. Adds ``--resume <ckpt_dir>`` for full train-state
resume (the reference has weights-only warm start).
"""

import argparse


def main():
    parser = argparse.ArgumentParser(description="Train arguments")
    parser.add_argument("-cfg", "--config", help="Config file path", type=str, required=True)
    parser.add_argument("--resume", help="Path to an Orbax checkpoint dir (weights/last) to resume from",
                        type=str, default=None)
    args = parser.parse_args()

    from nkbx.data import get_dataset
    from nkbx.logging import get_comet_experiment, get_local_experiment
    from nkbx.models import get_model
    from nkbx.parallel import mesh_from_cfg
    from nkbx.train import get_loss, train
    from nkbx.utils import load_config

    cfg = load_config(args.config)

    # persistent XLA compilation cache: default ON (config key
    # compilation_cache = False disables, a str overrides the directory)
    from nkbx.core import enable_compilation_cache_from_cfg

    enable_compilation_cache_from_cfg(cfg)

    if cfg.get("distributed", False):
        # multi-host TPU slice: one process per host; the loaders shard the
        # global permutation by process_index and the mesh spans all hosts
        from nkbx.core import initialize

        info = initialize(distributed=True)
        print(f"distributed: process {info['process_index']}/{info['process_count']}, "
              f"{info['devices']} devices")

    if cfg.get("debug_nans", False):  # opt-in NaN checking (SURVEY.md §5.2)
        from nkbx.core import enable_nan_debugging

        enable_nan_debugging()

    if cfg.get("preempt_checkpoint", True):
        # SIGTERM (preemptible/spot TPU VMs) -> save full train state and
        # exit cleanly; --resume restarts the interrupted epoch
        # (nkbx/train/preempt.py)
        from nkbx.train import preempt

        preempt.install()

    train_loader = get_dataset(cfg.train_data, cfg.train_pipeline)
    classes = train_loader.dataset.classes
    if "classes" not in cfg.val_data:
        cfg.val_data = {**cfg.val_data, "classes": classes}
    val_loader = get_dataset(cfg.val_data, cfg.val_pipeline)

    mesh = mesh_from_cfg(cfg, default_all_devices=True)  # DP spans all chips

    import jax.numpy as jnp

    dtype = jnp.bfloat16 if cfg.enable_mixed_precision else jnp.float32
    input_size = cfg.train_pipeline.output_size() or (224, 224)
    model = get_model(cfg.model, classes, input_size=input_size,
                      seed=getattr(cfg, "seed", 0), dtype=dtype)
    criterion = get_loss(cfg.criterion)
    comet_experiment = get_comet_experiment(cfg.experiment.get("comet"))
    if comet_experiment is not None:
        comet_experiment.log_code(args.config)
        # model source alongside the config (reference train.py:104-107 logs
        # nkb_classification/model.py; nkbx logs the classifier + the backbone)
        import nkbx.models.classifier as _classifier_mod

        comet_experiment.log_code(_classifier_mod.__file__)
        backbone_mod = type(model.module.backbone).__module__
        import importlib

        comet_experiment.log_code(importlib.import_module(backbone_mod).__file__)
    local_experiment = get_local_experiment(cfg.experiment["local"])
    print(f"Run dir: {local_experiment.path}")

    train(
        model,
        train_loader,
        val_loader,
        criterion,
        comet_experiment,
        local_experiment,
        cfg,
        mesh=mesh,
        resume_from=args.resume,
    )


if __name__ == "__main__":
    main()
