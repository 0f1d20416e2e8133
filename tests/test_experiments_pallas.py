"""experiments/ Pallas kernels (documented negative results) — interpret mode on CPU."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "experiments"))

import jax
import jax.numpy as jnp
import numpy as np

from pallas_fused_matmul_bn import (
    fused_matmul_bn_relu_stats,
    reference_matmul_bn_relu_stats,
)
import pytest

pytestmark = pytest.mark.slow  # integration tier: excluded by -m 'not slow'



class TestFusedMatmulBN:
    def test_matches_reference(self):
        r = np.random.default_rng(0)
        n, cin, cout = 2048, 128, 256
        x = jnp.asarray(r.normal(size=(n, cin)).astype(np.float32))
        w = jnp.asarray(r.normal(size=(cin, cout)).astype(np.float32) * 0.05)
        scale = jnp.asarray(r.uniform(0.5, 2, cout).astype(np.float32))
        bias = jnp.asarray(r.normal(size=cout).astype(np.float32))
        y_ref, s_ref, q_ref = jax.jit(reference_matmul_bn_relu_stats)(x, w, scale, bias)
        y, s, q = fused_matmul_bn_relu_stats(x, w, scale, bias, tile_rows=512, interpret=True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-3)
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(q), np.asarray(q_ref), rtol=1e-5)

    def test_relu_applied(self):
        x = jnp.full((512, 128), -1.0, jnp.float32)
        w = jnp.eye(128, dtype=jnp.float32)
        scale = jnp.ones(128)
        bias = jnp.zeros(128)
        y, s, q = fused_matmul_bn_relu_stats(x, w, scale, bias, tile_rows=512, interpret=True)
        assert float(jnp.max(y)) == 0.0 and float(jnp.max(s)) == 0.0


class TestLayoutTaxHarness:
    """experiments/r3_layout_tax.py --check: the G-minor-read + in-VMEM
    transpose microkernel is bit-exact in interpret mode (the measurement
    itself needs the chip; the variant is a resolved VMEM negative, PERF.md)."""

    def test_check(self):
        import r3_layout_tax

        r3_layout_tax.check()
