"""nkbx.core runtime helpers."""

import time

import jax.numpy as jnp

from nkbx.core import Throughput, initialize, precision_policy


class TestPrecision:
    def test_mixed(self):
        p, c = precision_policy(True)
        assert p == jnp.float32 and c == jnp.bfloat16

    def test_full(self):
        p, c = precision_policy(False)
        assert p == c == jnp.float32


class TestThroughput:
    def test_counts(self):
        tp = Throughput(n_chips=2)
        tp.step(10)
        tp.step(10)
        time.sleep(0.01)
        snap = tp.snapshot()
        assert snap["images_per_sec"] > 0
        assert snap["images_per_sec_per_chip"] * 2 == snap["images_per_sec"]
        tp.reset()
        assert tp.snapshot()["images_per_sec"] == 0.0


class TestInitialize:
    def test_single_host_info(self, tmp_path):
        info = initialize(compilation_cache=str(tmp_path / "cache"))
        assert info["process_count"] == 1
        assert info["devices"] >= 1
        assert (tmp_path / "cache").is_dir()


class TestCompilationCache:
    def test_default_dir_and_env_override(self, tmp_path, monkeypatch):
        import jax

        from nkbx.core import enable_compilation_cache

        prev = jax.config.jax_compilation_cache_dir
        try:
            # env var present -> no-op (jax already consumed it)
            monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "envdir"))
            enable_compilation_cache(str(tmp_path / "ignored"))
            assert jax.config.jax_compilation_cache_dir == prev
            # env absent -> explicit path wins and is created
            monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR")
            target = tmp_path / "cc"
            enable_compilation_cache(str(target))
            assert jax.config.jax_compilation_cache_dir == str(target)
            assert target.is_dir()
        finally:
            jax.config.update("jax_compilation_cache_dir", prev)
