"""nkbx offline evaluation CLI: ``python eval.py -cfg eval_config.py``.

Reference eval.py:16-48 surface: evaluate a (checkpointed) model on
``cfg.val_data`` / ``cfg.val_pipeline`` and write ``metrics.json``.
"""

import argparse
import json
from pathlib import Path


def evaluate(model, val_loader, criterion, cfg, mesh=None):
    from nkbx.metrics import compute_metrics
    from nkbx.train import EpochCollector, TrainState, build_eval_step, val_epoch

    state = TrainState(params=model.params, batch_stats=model.batch_stats,
                       opt_state=(), step=0)
    augment = val_loader.pipeline.device_apply if val_loader.pipeline else None
    eval_step = build_eval_step(model, criterion, augment_fn=augment)
    mode = getattr(cfg, "metrics_accumulation", "exact")
    results = val_epoch(state, val_loader, eval_step,
                        epoch_logger=EpochCollector(cfg.task, mode), mesh=mesh)
    return compute_metrics(cfg, results)


def main():
    parser = argparse.ArgumentParser(description="Eval arguments")
    parser.add_argument("-cfg", "--config", help="Config file path", type=str, required=True)
    args = parser.parse_args()

    import jax.numpy as jnp

    from nkbx.data import get_dataset
    from nkbx.models import get_model
    from nkbx.train import get_loss
    from nkbx.utils import convert_dict_types_recursive, load_config

    cfg = load_config(args.config)

    # persistent XLA compilation cache: default ON (config key
    # compilation_cache = False disables, a str overrides the directory)
    from nkbx.core import enable_compilation_cache_from_cfg

    enable_compilation_cache_from_cfg(cfg)
    assert "classes" in cfg.val_data or cfg.val_data.get("type", "ImageFolder") == "ImageFolder"
    val_loader = get_dataset(cfg.val_data, cfg.val_pipeline)
    classes = val_loader.dataset.classes

    dtype = jnp.bfloat16 if cfg.enable_mixed_precision else jnp.float32
    input_size = cfg.val_pipeline.output_size() or (224, 224)
    model = get_model(cfg.model, classes, input_size=input_size, dtype=dtype)
    criterion = get_loss(cfg.criterion)

    # same `mesh` config key as train.py, but OPT-IN (see mesh_from_cfg):
    # with the key set, the val set spreads over the data axis — params stay
    # replicated, metrics are gathered exactly
    from nkbx.parallel import mesh_from_cfg

    metrics = evaluate(model, val_loader, criterion, cfg,
                       mesh=mesh_from_cfg(cfg))

    save_path = Path(cfg.save_path)
    save_path.mkdir(exist_ok=True, parents=True)
    with open(save_path / "metrics.json", "w") as f:
        json.dump(convert_dict_types_recursive(metrics), f)
    print(f"Wrote {save_path / 'metrics.json'}")


if __name__ == "__main__":
    main()
