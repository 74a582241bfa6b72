"""Guard: the suite must run on the CPU backend with 8 virtual devices
(unless MESO_TEST_TPU=1) — shard_map tests depend on it."""

import os


def test_platform_is_cpu_mesh():
    import jax
    if os.environ.get("MESO_TEST_TPU"):
        assert jax.devices()[0].platform == "tpu"
    else:
        assert jax.devices()[0].platform == "cpu", jax.devices()
        assert len(jax.devices()) == 8
