"""utils: checked invariants, phase timer, builder-deck construction."""

import os

import jax.numpy as jnp
import pytest

from meso_tpu.utils.checks import check_diag
from meso_tpu.utils.timer import PhaseTimer


def test_check_diag_passes_clean():
    check_diag({"bucket_overflow": jnp.zeros((), jnp.int32),
                "worst_skin_ratio": jnp.asarray(0.8)})


def test_check_diag_raises_with_hint():
    with pytest.raises(RuntimeError, match="increase CellConfig.capacity"):
        check_diag({"cell_overflow": jnp.asarray(3)})
    with pytest.raises(RuntimeError, match="half-skin"):
        check_diag({"worst_skin_ratio": jnp.asarray(1.7)})


def test_phase_timer_summary():
    t = PhaseTimer()
    t.begin("pair")
    t.begin("neigh")
    t.end()
    s = t.summary()
    assert "pair" in s and "neigh" in s and "total" in s


def test_builder_deck_builds():
    from meso_tpu.io.deck import build_from_deck, load_deck
    deck = load_deck(os.path.join(os.path.dirname(__file__), "..",
                                  "golden_decks", "tdpd_diffusion.toml"))
    deck["model"]["args"]["l"] = 4.0  # shrink for a fast build
    system, params, state, run_cfg = build_from_deck(deck)
    assert system.model == "tdpd"
    assert state.C is not None and state.C.shape[1] == 1
    assert run_cfg.steps == 600


def test_pressure_trace_in_chunks():
    """Device-side running thermo (SURVEY 5.5): per-step kT/virial/pressure
    traces from run_bucket_chunked match the direct observable."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from meso_tpu.core.system import run_bucket_chunked
    from meso_tpu.models.classic import classic_fluid
    from meso_tpu.obs import pressure

    system, params, state = classic_fluid(l=6.0, force_path="bucket")
    state, diag = run_bucket_chunked(system, params, state, 3, 5)
    assert diag["kt_trace"].shape == (15,)
    p_direct = float(pressure(state.v, params.mass[state.typ], state.mask,
                              diag["virial_trace"][-1],
                              jnp.prod(state.box.lengths)))
    assert abs(float(diag["pressure_trace"][-1]) - p_direct) \
        / p_direct < 5e-3
    assert np.isfinite(np.asarray(diag["pressure_trace"])).all()


def test_fix_setforce_and_source_c():
    """fix setforce (row 15) zeroes chosen components; FixSourceC (row 23)
    applies S - k*C inside its slab only."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from meso_tpu.core.box import Box
    from meso_tpu.core.state import create_random
    from meso_tpu.core.system import System, SystemParams, make_step, setup
    from meso_tpu.ops.dpd import DPDParams
    from meso_tpu.ops.fixes import FixSetForce, FixSourceC

    box = Box.cubic(5.0)
    st = create_random(jax.random.PRNGKey(0), 300, box, kt=1.0, n_species=1)
    st = st.replace(C=jnp.ones((300, 1)))
    params = SystemParams.build_raw(
        __import__("meso_tpu.ops.tdpd", fromlist=["TDPDParams"]).TDPDParams
        .build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, kappa_c=[0.0],
               eps_c=[0.0], rcc=1.0, seed=3))
    system = System(dt=0.01, force_path="dense", model="tdpd",
                    rng_mode="fast",
                    fixes=(FixSetForce(fz=0.0),
                           FixSourceC(source=(2.0,), rate=(0.0,),
                                      axis=0, lo=0.0, hi=2.5)))
    st = setup(system, params, st)
    s1 = make_step(system)(params, st)
    assert float(jnp.abs(s1.f[:, 2]).max()) == 0.0
    # region membership is evaluated on the post-drift positions
    inside = np.asarray((s1.x[:, 0] >= 0.0) & (s1.x[:, 0] < 2.5))
    c1 = np.asarray(s1.C[:, 0])
    # source adds dt*S inside the slab (on top of zero pair flux)
    assert np.allclose(c1[inside], 1.0 + 0.01 * 2.0, atol=1e-6)
    assert np.allclose(c1[~inside], 1.0, atol=1e-6)


def test_regions_set_delete_count():
    """region/group/set/delete_atoms analogs (row 10)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from meso_tpu.core.box import Box
    from meso_tpu.core.region import (Block, Complement, Cylinder, Sphere,
                                      Union, count_in_region,
                                      delete_in_region, set_type_in_region)
    from meso_tpu.core.state import create_random

    box = Box.cubic(10.0)
    st = create_random(jax.random.PRNGKey(1), 2000, box, kt=1.0)
    slab = Block(lo=(0, 0, 0), hi=(10, 10, 2.0))
    ball = Sphere(center=(5, 5, 5), radius=2.0)
    tube = Cylinder(axis=2, c1=5.0, c2=5.0, radius=1.5)

    st2 = set_type_in_region(st, slab, 1)
    inside = np.asarray(slab.inside(st.x))
    assert (np.asarray(st2.typ)[inside] == 1).all()
    assert (np.asarray(st2.typ)[~inside] == 0).all()

    n_ball = int(count_in_region(st, ball))
    frac = n_ball / 2000
    vol_frac = (4 / 3 * np.pi * 8) / 1000
    assert abs(frac - vol_frac) < 0.02

    st3 = delete_in_region(st, Union((ball, tube)))
    assert int(st3.n_valid()) == 2000 - int(count_in_region(
        st, Union((ball, tube))))
    assert int(count_in_region(st3, ball)) == 0

    assert int(count_in_region(st, Complement(slab))) == 2000 - int(
        count_in_region(st, slab))


def test_distributed_bonded_build_contract():
    """All three decomposition builders accept bonded systems (tag-space
    ghost rows; parity tests in tests/dist/test_bonded_dist.py)."""
    from meso_tpu.models.polymer import polymer_melt
    from meso_tpu.parallel import build_domain
    from meso_tpu.parallel.domain2d import build_domain2d
    from meso_tpu.parallel.domain3d import build_domain3d

    system, params, state = polymer_melt(l=10.4, force_path="bucket")
    assert build_domain(system, 2, lx_global=10.4).n_dev == 2
    assert build_domain2d(system, 2, 2, 10.4, 10.4).nx_dev == 2
    assert build_domain3d(system, 2, 2, 2, 10.4, 10.4,
                          10.4).nz_dev == 2


def test_msd_unwrapped_across_boundary():
    """MSD must count box crossings via image flags, not fold them."""
    import jax.numpy as jnp

    from meso_tpu.core.box import Box
    from meso_tpu.obs import msd, unwrapped

    box = Box.cubic(10.0)
    x0 = jnp.asarray([[9.5, 5.0, 5.0], [1.0, 1.0, 1.0]])
    img0 = jnp.zeros((2, 3), jnp.int32)
    # particle 0 moved +1.0 in x, wrapping the boundary
    x1 = jnp.asarray([[0.5, 5.0, 5.0], [1.0, 1.0, 1.0]])
    img1 = jnp.asarray([[1, 0, 0], [0, 0, 0]], jnp.int32)
    mask = jnp.ones(2, bool)
    x0u = unwrapped(x0, img0, box)
    m = float(msd(x1, img1, x0u, mask, box))
    assert abs(m - 0.5) < 1e-6   # mean of (1.0^2, 0) = 0.5


def test_msd_diffusion_on_short_run():
    """Free DPD fluid: MSD grows, D = MSD/(6t) is positive and finite."""
    import jax
    import jax.numpy as jnp

    from meso_tpu.core.system import run_chunk
    from meso_tpu.models.classic import classic_fluid
    from meso_tpu.obs import diffusion_coefficient, msd, unwrapped

    system, params, state = classic_fluid(l=5.0, force_path="dense",
                                          rng_mode="fast")
    x0u = unwrapped(state.x, state.image, state.box)
    state = run_chunk(system, params, state, 150)
    m = float(msd(state.x, state.image, x0u, state.mask, state.box))
    d = float(diffusion_coefficient(m, 150 * system.dt))
    assert m > 0.05
    assert 0.0 < d < 10.0


def test_autotune_sweeps_dynroll_winner(monkeypatch):
    """The r5 production winner (v3_dynroll + zc=2 + wrap=rebuild + sort,
    PERF_NOTES round-5 ladder) must be in the tune_kernel sweep and
    runnable end-to-end (SURVEY 2b row 29: launch-config autotuning)."""
    monkeypatch.setenv("MESO_PALLAS_INTERPRET", "1")
    from meso_tpu.models.classic import classic_fluid
    from meso_tpu.utils.autotune import autotune_fluid

    # l=9 -> ncz=6 at skin 0.4: z_chunks=2 must divide ncz (the sweep
    # silently skips the candidate on boxes where it doesn't)
    _, params, state0 = classic_fluid(l=9.0, force_path="bucket",
                                      rng_mode="fast")

    def make_system(skin, every, **kw):
        # run only the cheap bucket base and the dynroll winner — the
        # full sweep is a device tool, too slow for CPU interpret mode
        if kw and kw.get("pair_kernel") != "v3_dynroll":
            raise ValueError("skip on CPU")
        system, _, _ = classic_fluid(
            l=9.0, skin=skin, rebuild_every=every, rng_mode="fast",
            force_path="pallas" if kw else "bucket", **kw)
        return system

    best, results = autotune_fluid(make_system, params, state0,
                                   candidates=[dict(skin=0.4, every=3)],
                                   steps=3, verbose=False, tune_kernel=True)
    dyn = [r for r in results if r.pair_kernel == "v3_dynroll"]
    assert len(dyn) == 1, "dynroll winner missing from the sweep"
    assert dyn[0].z_chunks == 2
    assert dyn[0].wrap_mode == "rebuild"
    assert dyn[0].rebuild == "sort"
    assert best.ms_per_step > 0
