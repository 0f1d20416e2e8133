"""Reference-compat ``Transforms`` adapter (reference dataset.py:89-102).

The reference wraps an albumentations Compose so it can be called torchvision-style
as ``transform(img)``. Here the same adapter exposes the *host stage* of an
nkbx Compose to loader workers; the device stage runs batched later.
"""

from __future__ import annotations

import numpy as np

from nkbx.transforms.spec import Compose


class Transforms:
    def __init__(self, transforms: Compose) -> None:
        if not isinstance(transforms, Compose):
            raise TypeError(
                "nkbx pipelines must be nkbx.transforms.Compose "
                f"(got {type(transforms).__name__}); see nkbx.transforms docs"
            )
        self.transforms = transforms

    def __call__(self, img, *args, rng=None, **kwargs) -> np.ndarray:
        """Host-stage only: uint8 HWC in, fixed-shape uint8 HWC out."""
        return self.transforms.host_apply(np.asarray(img), rng=rng)
