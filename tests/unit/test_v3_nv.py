"""need_virial=False (the thermo-off production path) must be force-
bitwise against the default path — it drops the virial math and output
channel, nothing else (r5 kernel rework)."""

import os

import jax
import jax.numpy as jnp

from meso_tpu.kernels.pair_dpd_v3 import bucket_forces_pallas_v3
from meso_tpu.models.classic import classic_fluid


def test_need_virial_false_is_force_bitwise():
    os.environ["MESO_PALLAS_INTERPRET"] = "1"   # setup() compiles pallas
    system, params, state = classic_fluid(
        l=8.0, force_path="pallas", rng_mode="fast", skin=0.4)
    cfg = system.cells
    step = jnp.int32(5)
    args = (state.x, state.v, state.typ, state.tag, state.mask, state.box,
            step, params.pair, system.dt, cfg)
    f1, v1 = bucket_forces_pallas_v3(*args, rng_mode="fast", interpret=True)
    f0, v0 = bucket_forces_pallas_v3(*args, rng_mode="fast", interpret=True,
                                     need_virial=False)
    assert bool(jnp.all(f0 == f1))
    assert float(v0) == 0.0 and float(v1) != 0.0
