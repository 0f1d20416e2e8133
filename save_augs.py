"""Dump augmented training samples for visual inspection.

Reference save_augs.py:30-44 equivalent (without its dead import — SURVEY.md §7
known bugs): runs the train pipeline (host + device stages) and writes N samples
as PNGs, un-normalizing with the pipeline's own Normalize parameters.
"""

import argparse
from pathlib import Path


def main():
    parser = argparse.ArgumentParser(description="Save augmented samples")
    parser.add_argument("-cfg", "--config", help="Config file path", type=str, required=True)
    parser.add_argument("-n", "--n-samples", type=int, default=50)
    parser.add_argument("-o", "--out", type=str, default="augs_preview")
    args = parser.parse_args()

    import jax
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from nkbx.data import get_dataset
    from nkbx.transforms.spec import Normalize
    from nkbx.utils import load_config

    cfg = load_config(args.config)
    loader = get_dataset(cfg.train_data, cfg.train_pipeline)
    pipe = loader.pipeline

    mean = np.array([0.0, 0.0, 0.0])
    std = np.array([1.0, 1.0, 1.0])
    maxv = 1.0  # without Normalize the device stage already emits 0..255
    for t in pipe.device_transforms:
        if isinstance(t, Normalize):
            mean, std = np.asarray(t.mean), np.asarray(t.std)
            maxv = t.max_pixel_value

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    saved = 0
    key = jax.random.PRNGKey(0)
    for epoch in range(1000):
        for batch in loader.epoch(epoch):
            key, sub = jax.random.split(key)
            aug = np.asarray(pipe.device_apply(batch["image"], sub))
            imgs = np.clip((aug * std + mean) * maxv, 0, 255).astype(np.uint8)
            for img, valid in zip(imgs, batch["mask"]):
                if not valid or saved >= args.n_samples:
                    break
                plt.imsave(out_dir / f"aug_{saved}.png", img)
                saved += 1
            if saved >= args.n_samples:
                break
        if saved >= args.n_samples:
            break
    print(f"Saved {saved} augmented samples to {out_dir}")


if __name__ == "__main__":
    main()
