"""nkbx — TPU-native (JAX/XLA/Pallas) image-classification framework.

A brand-new framework with the capability surface of ``nkb-tech/nkb-classification``
(reference: /root/reference), redesigned TPU-first:

- host-side decode + deterministic geometry, batched on-device uint8 augmentation
  (replacing per-sample albumentations CPU transforms, reference dataset.py:89-102),
- Flax backbones + single/multi-task linear heads (reference model.py:17-159),
- one jitted bf16 train step sharded over a ``jax.sharding.Mesh`` (replacing the
  per-batch CUDA AMP loop, reference engine.py:20-117),
- bit-compatible balanced-accuracy / ROC-AUC metrics (reference metrics.py:7-70),
- Orbax best/last checkpoints + classes.json (reference train.py:66-73),
- StableHLO export + compiled TPU serving module (replacing ONNX/TorchScript/
  TensorRT, reference export.py / trtmodule.py).
"""

__version__ = "0.1.0"
