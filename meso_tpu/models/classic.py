"""Config 1 — the classic Groot-Warren DPD fluid (BASELINE.json configs[0]).

Canonical parameters (SURVEY.md A.1): rho=3, a=25, gamma=4.5 (sigma=3 at
kT=1), rc=1, cubic box, modified velocity-Verlet. The 32^3 box holds 98,304
particles; the 1M benchmark uses a 70^3 box (1,029,000 particles).
"""

from __future__ import annotations

import jax

from meso_tpu.core.box import Box
from meso_tpu.core.state import State, create_random
from meso_tpu.core.system import System, SystemParams, setup
from meso_tpu.ops.dpd import DPDParams


def classic_fluid(l: float = 32.0, density: float = 3.0, kt: float = 1.0,
                  a: float = 25.0, gamma: float = 4.5, rc: float = 1.0,
                  dt: float = 0.01, seed: int = 928459, init_seed: int = 0,
                  skin: float = 0.3, rebuild_every: int = 10,
                  rng_mode: str = "tea", force_path: str = "nlist",
                  spill: bool | None = None, pair_kernel: str = "v3",
                  rebuild: str = "gather", capacity: int | None = None,
                  wrap_mode: str = "step", z_chunks: int = 0,
                  ) -> tuple[System, SystemParams, State]:
    """Build (system, params, state) for the classic fluid, forces initialized.

    spill: right-spill bucket packing (K ~ 1.6x mean occupancy; fused
    kernel only). Default: on for force_path="pallas". capacity: explicit
    bucket K (None = sized from density; the autotuner/bench sweep K
    because candidate count scales as K^2/occupancy, SURVEY row 29)."""
    box = Box.cubic(l)
    n = int(round(density * l ** 3))
    state = create_random(jax.random.PRNGKey(init_seed), n, box, kt=kt)
    params = SystemParams.build(
        DPDParams.build(a=a, gamma=gamma, rc=rc, kt=kt, seed=seed))
    if spill is None:
        # spill packing is the production layout for every fused-kernel
        # tier since the r3 value-carried port closed the r2 miscompile
        # registry (tools/v2_gate.py ALL PASS on device, incl. spill+tea)
        spill = force_path == "pallas"
    system = System.for_fluid([l] * 3, rc=rc, density=density, dt=dt,
                              skin=skin, rebuild_every=rebuild_every,
                              rng_mode=rng_mode, spill=spill,
                              rebuild=rebuild, capacity=capacity,
                              wrap_mode=wrap_mode, z_chunks=z_chunks)
    if force_path != "nlist":
        system = system.replace(force_path=force_path)
    system = system.replace(pair_kernel=pair_kernel)
    return system, params, setup(system, params, state)
