"""Round-4: swin_base_patch4_window12_384 SERVING on chip (fused vs XLA bundle).

Completes the 384 story (train numbers: experiments/r4_384_geometries.py)
with the L8 path: export a `.nkbx` bundle at 384 with and without
`--fused-attention` and report TPUServingModule's compute p50/p99 (the
tunnel-free numbers .benchmark reports — serving H2D through this dev
tunnel measures the link, PERF.md serving section).

Usage: python experiments/r4_384_serving.py <fused|xla>
"""

import json
import os
import sys
import tempfile

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main(variant):
    from nkbx.core import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from nkbx.export import TPUServingModule
    from nkbx.export.stablehlo import export_model
    from nkbx.models import get_model

    fused = variant == "fused"
    model = get_model(
        {"task": "single", "model": "swin_base_patch4_window12_384",
         "pretrained": False},
        classes=[f"c{i}" for i in range(1000)],
        input_size=(384, 384), dtype=jnp.bfloat16)
    out = os.path.join(tempfile.mkdtemp(prefix="nkbx_384srv_"),
                       f"swin384_{variant}.nkbx")
    export_model(model, (8, 384, 384, 3), out, dynamic_batch=False,
                 fused_attention=fused)
    mod = TPUServingModule(out)
    stats = mod.benchmark(batch_size=8, iters=30)
    stats = {k: (round(v, 3) if isinstance(v, float) else v)
             for k, v in stats.items()}
    print(json.dumps({"variant": variant, "bs": 8, **stats}))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "fused")
