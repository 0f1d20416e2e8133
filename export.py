"""nkbx export CLI — deployment lowering (reference export.py surface, TPU-native).

    python export.py -cfg config.py --to serving -w runs/x/weights/best [--half]
    python export.py -cfg config.py --to stablehlo -w ... --input-shape 1 224 224 3

Formats:
    serving     .nkbx bundle (JSON metadata + StableHLO, dynamic-batch) for
                nkbx.export.TPUServingModule — replaces ONNX+TensorRT engines
    stablehlo   human-readable StableHLO MLIR text — replaces raw ONNX export
    savedmodel  TF SavedModel via jax2tf — the portable-artifact analog of the
                reference's ONNX export (TF Serving / TFLite / tf2onnx)
    tflite      .tflite flatbuffer (static shapes) + JSON metadata sidecar —
                the edge-deployment analog of the reference's ONNX path
"""

import argparse
from pathlib import Path


def str2bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("-cfg", "--config", type=str, required=True, help="Config file path")
    parser.add_argument("--to", type=str, required=True,
                        help="serving | stablehlo | savedmodel (TF, via jax2tf) "
                             "| tflite (edge flatbuffer, static shapes) "
                             "| onnx (tf2onnx when installed, else the torch "
                             "replica exporter) "
                             "| torchscript (the reference's .pt artifact — "
                             "torch.jit.trace of the weight-equivalent torch "
                             "replica; loads in the reference repo)")
    parser.add_argument("-w", "--weights", type=str, required=True,
                        help="nkbx checkpoint (orbax dir or .msgpack)")
    parser.add_argument("--dynamic", type=str, default="batch",
                        help="none | batch | all (all = symbolic H/W too, CNN "
                             "backbones only — reference export.py --dynamic)")
    parser.add_argument("--input-shape", nargs="+", type=int, default=[32, 224, 224, 3],
                        help="B H W C (NHWC; B = max batch for dynamic export)")
    parser.add_argument("--save_path", type=str, default=".", help="Save dir")
    parser.add_argument("--half", type=str2bool, nargs="?", const=True, default=False,
                        help="bf16 inference I/O (TPU-native half precision)")
    parser.add_argument("--quantize", type=str, default=None, choices=["dynamic"],
                        help="tflite only: dynamic-range int8 weight quantization")
    parser.add_argument("--opset", type=int, default=17,
                        help="onnx only: ONNX opset version (reference "
                             "export.py --opset)")
    parser.add_argument("--fused-attention", type=str2bool, nargs="?", const=True,
                        default=False,
                        help="serving only: keep the fused Pallas kernels "
                             "(window attention + fused MLP) in the bundle "
                             "(+44%% Swin serving on TPU; TPU-only artifact, "
                             "requires --dynamic none)")
    parser.add_argument("--sim", action="store_true",
                        help="onnx only: run onnxsim on the exported model if "
                             "installed (reference export.py --sim; the other "
                             "formats are already XLA-simplified)")
    parser.add_argument("--device", type=str, default=None,
                        help="accepted for reference-CLI compatibility and "
                             "ignored — the JAX backend picks the device")
    parser.add_argument("-v", "--verbose", type=str2bool, nargs="?", const=True,
                        default=False,
                        help="print export metadata and artifact sizes")
    args = parser.parse_args()
    assert args.to in ("serving", "stablehlo", "savedmodel", "tflite", "onnx",
                       "torchscript")
    assert args.dynamic in ("batch", "none", "all")
    assert len(args.input_shape) == 4
    if args.fused_attention:
        assert args.to == "serving", "--fused-attention applies to --to serving only"
        assert args.dynamic == "none", "--fused-attention requires --dynamic none"
    return args


def main(args):
    print(f"Export to {args.to}")
    if args.device:
        print(f"NOTE: --device {args.device!r} is ignored on nkbx "
              "(the JAX backend picks the device)")
    if args.sim and args.to != "onnx":
        print("NOTE: --sim applies to --to onnx only (StableHLO/SavedModel/"
              "TFLite artifacts are already XLA-simplified)")
    import jax.numpy as jnp

    from nkbx.data import get_dataset
    from nkbx.export import export_model, make_metadata, save_stablehlo_text
    from nkbx.models import get_model
    from nkbx.utils import load_config

    cfg = load_config(args.config)

    # persistent XLA compilation cache: default ON (config key
    # compilation_cache = False disables, a str overrides the directory)
    from nkbx.core import enable_compilation_cache_from_cfg

    enable_compilation_cache_from_cfg(cfg)

    # classes come from the train dataset, as in the reference (export.py:106-109)
    data_loader = get_dataset(cfg.train_data, cfg.train_pipeline)
    classes = data_loader.dataset.classes

    model_cfg = dict(cfg.model)
    model_cfg["pretrained"] = False
    model_cfg["checkpoint"] = args.weights
    b, h, w, c = args.input_shape
    dtype = jnp.bfloat16 if args.half else jnp.float32
    model_compute = jnp.bfloat16 if cfg.enable_mixed_precision else jnp.float32
    if args.to == "tflite":
        # TFLite flatbuffers have no bf16 kernels (a bf16 module fails to
        # legalize, e.g. the s2d stem transpose); edge inference is f32/int8
        model_compute = jnp.float32
        if args.half or cfg.enable_mixed_precision:
            print("NOTE: --to tflite builds the module in float32 "
                  "(TFLite has no bf16)")
        dtype = jnp.float32
    model = get_model(model_cfg, classes, input_size=(h, w), dtype=model_compute)

    stem = Path(args.weights).stem or "model"
    save_dir = Path(args.save_path)
    save_dir.mkdir(parents=True, exist_ok=True)

    exp_name = cfg.experiment["local"]["path"] if hasattr(cfg, "experiment") else "nkbx"
    metadata = make_metadata(classes, args.input_shape, cfg.task,
                             description=f"nkbx classification model ({exp_name})")

    if args.to == "tflite":
        from nkbx.export import export_tflite

        if args.dynamic != "none":
            print("WARNING: --to tflite exports static shapes; --dynamic ignored")
        out = save_dir / f"{stem}.tflite"
        path, _ = export_tflite(model, args.input_shape, out, metadata=metadata,
                                dtype=dtype, quantize=args.quantize)
        print(f"tflite export success, saved as {path}")
    elif args.to == "onnx":
        from nkbx.export import export_onnx

        if args.dynamic == "all":
            print("WARNING: --to onnx supports dynamic BATCH only; "
                  "H/W stay static (use --to serving for --dynamic all)")
        out = save_dir / f"{stem}.onnx"
        try:
            path, _ = export_onnx(model, args.input_shape, out, metadata=metadata,
                                  dynamic_batch=(args.dynamic != "none"), dtype=dtype,
                                  opset=args.opset, simplify=args.sim)
        except (RuntimeError, ImportError) as e:
            # Fall back to the torch replica exporter ONLY when the tf2onnx
            # recipe is genuinely unavailable (tensorflow or tf2onnx absent);
            # if both import fine, the failure is a real export error and must
            # surface — not be masked as "not installed".
            try:
                import tensorflow  # noqa: F401
                import tf2onnx  # noqa: F401
            except Exception:
                pass  # recipe unavailable: take the replica fallback below
            else:
                raise
            # torch replica exporter: reverse-converted weights + runnable
            # torch_ref replica — forward-parity-verified before writing;
            # NCHW graph, the reference's own ONNX contract. Needs torch only.
            try:
                from nkbx.export.torch_onnx import export_onnx_via_torch

                path, _ = export_onnx_via_torch(
                    model, model_cfg["model"], out, args.input_shape,
                    metadata=metadata, dynamic_batch=(args.dynamic != "none"),
                    opset=args.opset)
                print(f"NOTE: tf2onnx path unavailable ({e}) — exported "
                      "through the torch replica path (NCHW inputs) instead")
            except ImportError:
                raise e from None
        print(f"onnx export success, saved as {path}")
    elif args.to == "torchscript":
        # the reference's own per-epoch artifact (train.py:66-73 /
        # export.py:208-227): a torch.jit .pt the reference repo loads with
        # scripted=True — emitted from the runnable torch replica carrying
        # the reverse-converted (bit-exact) weights, parity-verified first
        from nkbx.export.torch_onnx import export_torchscript_via_torch

        if args.dynamic == "all":
            print("NOTE: torchscript traces are batch-generic for every "
                  "family; H/W stay static for transformer backbones")
        out = save_dir / f"{stem}.pt"
        path, _ = export_torchscript_via_torch(
            model, model_cfg["model"], out, args.input_shape, metadata=metadata)
        print(f"torchscript export success, saved as {path}")
    elif args.to == "savedmodel":
        from nkbx.export import export_savedmodel

        if args.dynamic == "all":
            print("WARNING: --to savedmodel supports dynamic BATCH only; "
                  "H/W stay static (use --to serving for --dynamic all)")
        out = save_dir / f"{stem}_savedmodel"
        export_savedmodel(model, args.input_shape, out, metadata=metadata,
                          dynamic_batch=(args.dynamic != "none"), dtype=dtype)
        print(f"savedmodel export success, saved as {out}")
    elif args.to == "serving":
        out = save_dir / f"{stem}.nkbx"
        path, meta = export_model(
            model, args.input_shape, out, metadata=metadata,
            dynamic=args.dynamic, dtype=dtype,
            fused_attention=args.fused_attention,
        )
        print(f"serving export success, saved as {path}")
    else:
        out = save_dir / f"{stem}.stablehlo"
        save_stablehlo_text(model, args.input_shape, out, dtype=dtype)
        print(f"stablehlo export success, saved as {out}")

    if args.verbose:
        import json

        print(json.dumps(metadata, indent=2, default=str))
        for p in sorted(save_dir.glob(f"{stem}*")):
            size = (sum(f.stat().st_size for f in p.rglob("*") if f.is_file())
                    if p.is_dir() else p.stat().st_size)
            print(f"  {p}  {size / 1e6:.2f} MB")


if __name__ == "__main__":
    main(parse_args())
