"""Test environment: CPU backend with 8 virtual devices (SURVEY.md §4 item 3).

The axon TPU plugin registers itself (importing jax) from sitecustomize at
interpreter start, so JAX_PLATFORMS set here via os.environ is too late —
jax.config already latched "axon". Override the live config instead: force
the CPU platform and 8 host devices (required for shard_map/halo tests, and
orders of magnitude faster than tunneling every op to the remote chip).

Set MESO_TEST_TPU=1 to run the suite on the real chip instead.
"""

import os
import resource
import sys

# XLA:CPU compiles the huge interpret-mode v3 kernel graphs ON the calling
# thread; its recursive passes overflow the default 8 MB main-thread stack
# nondeterministically deep into a long pytest process (observed segfaults
# in backend_compile_and_load at test_pallas_v3 after ~100 prior compiles).
# The Linux main stack grows up to RLIMIT_STACK — raise the soft limit.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
_want = 512 * 2 ** 20
if _soft != resource.RLIM_INFINITY and (_hard == resource.RLIM_INFINITY
                                        or _hard >= _want):
    resource.setrlimit(resource.RLIMIT_STACK, (_want, _hard))
elif _soft != resource.RLIM_INFINITY and _hard > _soft:
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))

if not os.environ.get("MESO_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    import jax
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
