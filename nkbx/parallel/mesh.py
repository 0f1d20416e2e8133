"""Device mesh + sharding layer.

This is the TPU-native replacement for the reference's single-``cfg.device``
model (reference train.py:98, engine.py:40 — single GPU, no distributed code,
SURVEY.md §2.2). Design:

- a 2-D ``Mesh(('data', 'model'))`` over all local devices; classification
  workloads are data-parallel (``model`` axis size 1 by default), but the mesh
  carries a ``model`` axis so large Dense layers / ViT heads can be tensor-sharded
  without restructuring the train step;
- the global batch is sharded along ``data``; parameters are replicated over
  ``data`` and (optionally, per-leaf) sharded over ``model``;
- gradient all-reduce over ICI is emitted by XLA automatically when a jitted step
  consumes a ``data``-sharded batch and produces replicated parameter updates —
  no explicit collectives (no NCCL analog) are required.

Multi-host: call ``jax.distributed.initialize()`` before :func:`make_mesh`; the
mesh then spans all processes and per-host data loading shards by
``jax.process_index()`` (see nkbx/data/loader.py).
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a ``('data', 'model')`` mesh.

    Args:
        n_data: size of the data axis. Defaults to ``len(devices) // n_model``.
        n_model: size of the tensor-parallel axis (1 = pure data parallel).
        devices: devices to use; defaults to all of ``jax.devices()``.
    """
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    n_needed = n_data * n_model
    if n_needed > len(devices):
        raise ValueError(f"mesh {n_data}x{n_model} needs {n_needed} devices, have {len(devices)}")
    dev_array = np.array(devices[:n_needed]).reshape(n_data, n_model)
    return Mesh(dev_array, ("data", "model"))


def mesh_from_cfg(cfg, default_all_devices: bool = False) -> Mesh | None:
    """Build the mesh a config asks for (the shared `mesh` config key).

    ``mesh = {"data": 8, "model": 1}`` in a config maps to
    ``make_mesh(n_data=8, n_model=1)``. Without the key: train.py spans all
    devices by default (``default_all_devices=True`` — DP is the training
    default and its loaders use divisible batches), while eval.py/inference.py
    return None (opt-in — their batch sizes need not divide the device count).
    """
    mesh_cfg = getattr(cfg, "mesh", None)
    if not mesh_cfg:
        return make_mesh() if default_all_devices else None
    return make_mesh(n_data=mesh_cfg.get("data"),
                     n_model=mesh_cfg.get("model", 1))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: leading dim split over ``data``, rest replicated."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree of arrays) onto the mesh, split along ``data``.

    Single-host: a plain sharded device_put. Multi-host: each process's local
    batch is its SHARD of the global batch (the loaders read disjoint strided
    slices of one permutation), so the global array must be assembled with
    ``jax.make_array_from_process_local_data`` — device_put with a global
    sharding would wrongly treat every host's (different) local batch as the
    same global array.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
            batch,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def _dense_kernel_spec(path: tuple, leaf) -> P:
    """Tensor-parallel spec for a parameter leaf.

    Shards the output dim of large Dense/conv kernels over the ``model`` axis when
    it divides evenly; everything else is replicated. Activations stay replicated
    over ``model``, so XLA inserts an all-gather only where profitable.
    """
    if leaf.ndim >= 2 and leaf.shape[-1] % 128 == 0:
        return P(*([None] * (leaf.ndim - 1)), "model")
    return P()


def _fsdp_dim(shape, n_data: int, taken: int | None = None):
    """Largest dim divisible by the data-axis size (excluding ``taken``)."""
    best = None
    for i, d in enumerate(shape):
        if i == taken or d % n_data:
            continue
        if best is None or d > shape[best]:
            best = i
    return best


def param_shardings(mesh: Mesh, params, tensor_parallel: bool = False,
                    fsdp: bool = False, fsdp_min_size: int = 2**14):
    """NamedShardings for a parameter pytree.

    With the defaults (the right call for CNN/ViT classifiers at this scale —
    SURVEY.md §2.2) everything is replicated. ``tensor_parallel=True`` shards
    eligible kernels' output features over the ``model`` axis.

    ``fsdp=True`` additionally shards each large leaf over the ``data`` axis
    (ZeRO-3 style): parameters and optimizer moments live scattered across
    data-parallel devices; under ``jit`` XLA inserts the all-gather before
    each use and a reduce-scatter for the gradients — the scaling-book FSDP
    recipe, no hand-written collectives. Leaves smaller than
    ``fsdp_min_size`` elements stay replicated (the all-gather latency
    outweighs the memory win). Overkill for classifier-sized models; provided
    so large ViT backbones fit on small-HBM meshes without code changes.
    """
    # .get: accept meshes without a 'model' (or custom 'data') axis, e.g. the
    # 1-D Mesh(('data',)) multi-host tests build
    n_model = mesh.shape.get("model", 1)
    n_data = mesh.shape.get("data", 1)
    if not (tensor_parallel and n_model > 1) and not fsdp:
        rep = replicated_sharding(mesh)
        return jax.tree_util.tree_map(lambda _: rep, params)

    def spec_for(path, leaf):
        dims = [None] * leaf.ndim
        if (tensor_parallel and n_model > 1
                and _dense_kernel_spec(path, leaf) != P()
                and leaf.shape[-1] % n_model == 0):
            dims[-1] = "model"
        if fsdp and n_data > 1 and getattr(leaf, "size", 0) >= fsdp_min_size:
            taken = leaf.ndim - 1 if dims and dims[-1] == "model" else None
            i = _fsdp_dim(leaf.shape, n_data, taken)
            if i is not None:
                dims[i] = "data"
        if all(d is None for d in dims):
            return NamedSharding(mesh, P())  # canonical replicated spec
        return NamedSharding(mesh, P(*dims))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def state_shardings(mesh: Mesh, state, fsdp: bool = True,
                    fsdp_min_size: int = 2**14):
    """Shardings for a FULL train state (params + optimizer moments +
    batch_stats + counters), applying :func:`param_shardings`'s FSDP rule to
    every leaf: adam moments share their parameter's shape and scatter the
    same way; batch_stats vectors and scalars fall under ``fsdp_min_size``
    and stay replicated. Use with ``jax.device_put(state, ...)``."""
    return param_shardings(mesh, state, fsdp=fsdp, fsdp_min_size=fsdp_min_size)
