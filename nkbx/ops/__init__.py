"""nkbx.ops — custom Pallas/XLA kernels for the TPU hot paths."""
