"""nkbx folder-inference CLI: ``python inference.py -cfg inference_config.py``.

Reference inference.py:15-105 surface: run a model over a flat image folder and
write ``inference_annotations.csv`` with per-target class-name columns + path.
"""

import argparse
from pathlib import Path


def inference(model, loader, classes, save_path, cfg, mesh=None):
    import jax.numpy as jnp
    import numpy as np
    import pandas as pd
    from tqdm import tqdm

    from nkbx.utils import get_classes_configs

    _, idx_to_class = get_classes_configs(classes)
    task = cfg.task
    assert task in ("single", "multi")
    if task == "single":
        columns = [cfg.target_column]
    else:
        target_names = list(cfg.target_names)
        assert set(target_names) == set(classes.keys())
        columns = target_names.copy()
    columns.append("path")

    from nkbx.train.engine import build_predict_fn

    augment = loader.pipeline.device_apply if loader.pipeline else None
    rows = []
    forward = build_predict_fn(model, augment_fn=augment)

    if mesh is not None and mesh.shape["data"] > 1:
        # shard the (padded, static-size) batch over the data axis — same
        # `mesh` config key as train.py/eval.py; params replicate under jit.
        # shard_batch handles the multi-host case (each process contributes
        # its local rows), exactly like the engine's _put_batch.
        from nkbx.parallel import shard_batch

        put = lambda x: shard_batch(mesh, np.asarray(x))
    else:
        put = jnp.asarray

    from nkbx.ops.attention import attention_mesh

    with attention_mesh(mesh):
        for batch in tqdm(loader.epoch(0), leave=False, desc="Inference",
                          total=len(loader)):
            preds = forward(model.variables, put(batch["image"]))
            valid = batch["mask"]
            batch_cols = []
            if task == "single":
                pred = np.asarray(jnp.argmax(preds, axis=-1))[valid]
                batch_cols.append([idx_to_class[int(i)] for i in pred])
            else:
                for t in columns[:-1]:
                    pred = np.asarray(jnp.argmax(preds[t], axis=-1))[valid]
                    batch_cols.append([idx_to_class[t][int(i)] for i in pred])
            batch_cols.append([p for p, v in zip(batch["path"], valid) if v])
            rows.append(pd.DataFrame(np.vstack(batch_cols).T, columns=columns))

    out = pd.concat(rows) if rows else pd.DataFrame(columns=columns)
    out.to_csv(Path(save_path, "inference_annotations.csv"), index=False)


def main():
    parser = argparse.ArgumentParser(description="Inference arguments")
    parser.add_argument("-cfg", "--config", help="Config file path", type=str, required=True)
    args = parser.parse_args()

    import jax.numpy as jnp

    from nkbx.data import get_inference_dataset
    from nkbx.models import get_model
    from nkbx.utils import load_classes, load_config

    cfg = load_config(args.config)

    # persistent XLA compilation cache: default ON (config key
    # compilation_cache = False disables, a str overrides the directory)
    from nkbx.core import enable_compilation_cache_from_cfg

    enable_compilation_cache_from_cfg(cfg)
    loader = get_inference_dataset(cfg.inference_data, cfg.inference_pipeline)
    classes = load_classes(cfg.classes)
    dtype = jnp.bfloat16 if cfg.enable_mixed_precision else jnp.float32
    input_size = cfg.inference_pipeline.output_size() or (224, 224)
    model = get_model(cfg.model, classes, input_size=input_size, dtype=dtype)

    from nkbx.parallel import mesh_from_cfg

    mesh = mesh_from_cfg(cfg)  # opt-in (see mesh_from_cfg)

    save_path = Path(cfg.save_path)
    save_path.mkdir(exist_ok=True, parents=True)
    inference(model, loader, classes, save_path, cfg, mesh=mesh)
    print(f"Wrote {save_path / 'inference_annotations.csv'}")


if __name__ == "__main__":
    main()
