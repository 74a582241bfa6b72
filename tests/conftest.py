"""Test environment: CPU backend with 8 virtual devices (SURVEY.md §4 item 3).

Must run before jax is imported anywhere: forces the CPU platform (the axon
TPU plugin registers itself via sitecustomize) and creates 8 host devices so
shard_map/halo tests exercise real collective lowering without TPU hardware.
Set MESO_TEST_TPU=1 to run the suite on the real chip instead.
"""

import os
import sys

if not os.environ.get("MESO_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
