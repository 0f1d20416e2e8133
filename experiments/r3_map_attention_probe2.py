"""Probe 2: alternative Mosaic lowerings for the window gather/scatter
(probe 1's stack+reshape form fails to compile — MosaicError).

Candidates, each as a minimal pallas_call on the chip:
  A reshape-only:       (1,7,7,C3) block -> (1,49,C3): ref[0].reshape(49, C3)
  B row-concat:         concat 7 (7,C3) row slices on the sublane axis
  C scratch stores:     write 7-row pieces into a (56,C3) VMEM scratch at
                        unaligned sublane offsets, read back (49,C3)
  D split-reshape:      (1,49,C3) -> (1,7,7,C3) (the scatter-side inverse)
  E pad8 scatter:       write rows at 8-ALIGNED offsets of a (1,56,C3) output
                        (row r at sublane 8r) — a padded-token formulation
                        that needs no unaligned op; ghost rows masked later.

Usage: PYTHONPATH=/root/.axon_site python experiments/r3_map_attention_probe2.py
"""

import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C3 = 288
DTYPE = jnp.bfloat16


def k_reshape(x_ref, o_ref):
    o_ref[0] = x_ref[0].reshape(49, C3)


def k_rowconcat(x_ref, o_ref):
    rows = [x_ref[0, r] for r in range(7)]          # each (7, C3)
    o_ref[0] = jnp.concatenate(rows, axis=0)        # (49, C3)


def k_scratch(x_ref, o_ref, scratch):
    for r in range(7):
        scratch[pl.ds(7 * r, 7), :] = x_ref[0, r]   # unaligned sublane store
    o_ref[0] = scratch[pl.ds(0, 49), :]


def k_split(x_ref, o_ref):
    o_ref[0] = x_ref[0].reshape(7, 7, C3)


def k_pad8(x_ref, o_ref):
    o_ref[0] = jnp.zeros((56, C3), DTYPE)
    for r in range(7):
        o_ref[0, pl.ds(8 * r, 7), :] = x_ref[0, r]  # 8-aligned stores


def run(name, kern, in_block, out_block, scratch=None, iters=50, grid_n=512):
    x = jnp.asarray(
        np.random.randn(grid_n, *in_block[1:]).astype(np.float32), DTYPE)
    kw = {}
    if scratch is not None:
        kw["scratch_shapes"] = [pltpu.VMEM(scratch, DTYPE)]
    imap_in = lambda i: (i,) + (0,) * (len(in_block) - 1)
    imap_out = lambda i: (i,) + (0,) * (len(out_block) - 1)
    try:
        fn = jax.jit(pl.pallas_call(
            kern, grid=(grid_n,),
            in_specs=[pl.BlockSpec(in_block, imap_in,
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(out_block, imap_out,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid_n,) + out_block[1:], DTYPE),
            **kw))
        y = fn(x)
        s = float(jnp.sum(y.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(x)
        s = float(jnp.sum(y.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: OK  {dt*1e3:.3f} ms/call ({grid_n} blocks; checksum {s:.1f})")
        return dt
    except Exception as e:  # noqa: BLE001
        first = str(e).splitlines()
        print(f"{name}: FAILED — {type(e).__name__}: "
              f"{first[0][:160] if first else ''}")
        tb = traceback.format_exc()
        for line in tb.splitlines():
            if "Mosaic" in line or "not implemented" in line.lower() \
                    or "unsupported" in line.lower():
                print("   ", line.strip()[:200])
        return None


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    run("copy (1,7,7,C3)",
        lambda x_ref, o_ref: o_ref.__setitem__(0, x_ref[0]),
        (1, 7, 7, C3), (1, 7, 7, C3))
    run("A reshape-merge (7,7,C3)->(49,C3)", k_reshape,
        (1, 7, 7, C3), (1, 49, C3))
    run("B row-concat    7x(7,C3)->(49,C3)", k_rowconcat,
        (1, 7, 7, C3), (1, 49, C3))
    run("C scratch-store unaligned -> (49,C3)", k_scratch,
        (1, 7, 7, C3), (1, 49, C3), scratch=(56, C3))
    run("D reshape-split (49,C3)->(7,7,C3)", k_split,
        (1, 49, C3), (1, 7, 7, C3))
    run("E pad8 aligned scatter -> (56,C3)", k_pad8,
        (1, 7, 7, C3), (1, 56, C3))
