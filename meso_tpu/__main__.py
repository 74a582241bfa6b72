"""CLI: ``python -m meso_tpu deck.toml`` — the ``lmp -in deck`` analog
(SURVEY.md §2d launch row)."""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="meso_tpu", description="TPU-native DPD engine")
    ap.add_argument("deck", help="TOML input deck")
    ap.add_argument("--steps", type=int, default=None,
                    help="override run.steps")
    ap.add_argument("--log", default=None, help="JSONL thermo log path")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of one thermo "
                         "interval into DIR (view with xprof/tensorboard)")
    ap.add_argument("--autotune", action="store_true",
                    help="measure (skin, rebuild_every) candidates on this "
                         "deck before the run and use the fastest safe "
                         "config (SURVEY 2b row 29)")
    ap.add_argument("--var", action="append", default=[], metavar="K=V",
                    help="override a [variables] entry (repeatable); "
                         "numeric values are auto-coerced")
    ap.add_argument("--dd", type=int, default=0, metavar="N",
                    help="run under 1-D spatial domain decomposition over "
                         "the first N devices (the mpirun -np analog; "
                         "supports bonded systems incl. config 5)")
    ap.add_argument("--validate", action="store_true",
                    help="before running, validate the configured force "
                         "path against the dense O(N^2) oracle at the "
                         "initial state (all models; SURVEY 5.2) — "
                         "validation-scale decks only")
    args = ap.parse_args(argv)

    from meso_tpu.core.system import run_adaptive, run_bucket_chunked
    from meso_tpu.io.deck import build_from_deck, load_deck
    from meso_tpu.io.dump import write_lammpstrj
    from meso_tpu.io.restart import save_restart
    from meso_tpu.io.thermo import ThermoLogger
    from meso_tpu.utils.timer import PhaseTimer

    overrides = {}
    for kv in args.var:
        k, _, v = kv.partition("=")
        try:
            overrides[k] = int(v)
        except ValueError:
            try:
                overrides[k] = float(v)
            except ValueError:
                overrides[k] = v
    deck = load_deck(args.deck, overrides=overrides or None)
    system, params, state, run_cfg = build_from_deck(deck)
    steps = args.steps if args.steps is not None else run_cfg.steps
    if args.validate:
        from meso_tpu.utils.debug import validate_forces
        report = validate_forces(system, params, state)
        print("validate:", " ".join(f"{k}={v:.3e}" if isinstance(v, float)
                                    else f"{k}={v}"
                                    for k, v in sorted(report.items())))
        if report["max_rel"] > 1e-3:
            print("validate: FORCE PATH DEVIATES from the dense oracle",
                  file=sys.stderr)
            return 2
    if args.autotune:
        if system.force_path not in ("bucket", "pallas"):
            print("--autotune requires a bucketed force path", file=sys.stderr)
            return 1
        from meso_tpu.utils.autotune import autotune_fluid

        def make_system(skin, every, spill=None, z_chunks=None,
                        pair_kernel=None, rebuild=None, capacity=None,
                        wrap_mode=None):
            import dataclasses as _dc
            d = dict(deck)
            neigh = dict(d.get("neighbor", {}))
            neigh["skin"] = skin
            neigh["rebuild_every"] = every
            d["neighbor"] = neigh
            eng = dict(d.get("engine", {}))
            if spill is not None:
                eng["spill"] = spill
            d["engine"] = eng
            if "model" in d:  # builder decks take skin via model args
                d["model"] = dict(d["model"])
                d["model"]["args"] = dict(d["model"].get("args", {}))
                d["model"]["args"]["skin"] = skin
            sy, _, _, _ = build_from_deck(d)
            cell_kw = {"rebuild_every": every}
            if rebuild is not None:
                cell_kw["rebuild"] = rebuild
            if capacity is not None:
                cell_kw["capacity"] = capacity
            if wrap_mode is not None:
                cell_kw["wrap_at_rebuild"] = wrap_mode == "rebuild"
            sy = sy.replace(cells=_dc.replace(sy.cells, **cell_kw))
            if z_chunks is not None:
                sy = sy.replace(z_chunks=z_chunks)
            if pair_kernel is not None:
                sy = sy.replace(pair_kernel=pair_kernel)
            if wrap_mode is not None:
                sy = sy.replace(wrap_mode=wrap_mode)
            return sy

        print("autotuning (skin, cadence, spill, z_chunks, kernel, "
              "rebuild, K):", flush=True)
        best, _ = autotune_fluid(make_system, params, state,
                                 tune_kernel=system.force_path == "pallas")
        system = make_system(best.skin, best.rebuild_every,
                             spill=best.spill, z_chunks=best.z_chunks,
                             pair_kernel=best.pair_kernel,
                             rebuild=best.rebuild, capacity=best.capacity,
                             wrap_mode=best.wrap_mode or None)
        from meso_tpu.core.system import setup as _setup
        state = _setup(system, params, state)
    logger = ThermoLogger(every=run_cfg.thermo_every, jsonl_path=args.log)

    timer = PhaseTimer()
    logger.log(system, params, state)
    bucketed = system.force_path in ("bucket", "pallas")
    every = system.cells.rebuild_every if system.cells else 1

    if args.dd > 1:
        # 1-D spatial decomposition from the deck surface (SURVEY row 5):
        # the spill layout is single-chip only; the distributed sweep /
        # fused kernel use strict local bricks
        import dataclasses as _dc

        import jax

        from meso_tpu.parallel.domain import (build_domain, collect_state,
                                              distribute_state, make_mesh_1d,
                                              run_distributed)
        if len(jax.devices()) < args.dd:
            print(f"--dd {args.dd}: only {len(jax.devices())} devices",
                  file=sys.stderr)
            return 1
        import jax.numpy as _jnp

        if system.cells.spill:
            # distribute_state is layout-agnostic (masked rows); the
            # distributed engine re-buckets per brick with strict slots
            system = system.replace(
                cells=_dc.replace(system.cells, spill=False))
        lx = float(state.box.lengths[0])
        dcfg = build_domain(system, args.dd, lx_global=lx)
        mesh = make_mesh_1d(args.dd)
        dstate = distribute_state(state, dcfg)

        def runner(sy, pa, st, n):
            nonlocal dstate
            dstate, diag = run_distributed(sy, pa, dstate,
                                           max(n // every, 1), mesh, dcfg)
            return collect_state(dstate), {
                "bucket_overflow": _jnp.max(diag["overflow"]),
                "bonded_missing": _jnp.max(diag["bonded_missing"])}
    else:
        def runner(sy, pa, st, n):
            if bucketed:
                return run_bucket_chunked(sy, pa, st, max(n // every, 1),
                                          every)
            return run_adaptive(sy, pa, st, n)
    done = 0
    profiled = False
    while done < steps:
        n = min(run_cfg.thermo_every, steps - done)
        if args.profile and not profiled and done > 0:
            import jax
            with jax.profiler.trace(args.profile):
                state, diag = runner(system, params, state, n)
                jax.block_until_ready(state.x)
            profiled = True
        else:
            timer.begin("run")
            state, diag = runner(system, params, state, n)
        done += n
        timer.begin("output")
        extra = {}
        if "n_rebuilds" in diag:
            extra["rebuilds"] = int(diag["n_rebuilds"])
        if "worst_skin_ratio" in diag:
            extra["skin_ratio"] = round(float(diag["worst_skin_ratio"]), 2)
        logger.log(system, params, state, extra=extra)
        overflow = sum(int(diag[k]) for k in
                       ("cell_overflow", "nlist_overflow", "bucket_overflow")
                       if k in diag)
        if overflow:
            print("ERROR: neighbor capacity overflow — increase capacity "
                  "(cells/nlist_m)", file=sys.stderr)
            return 1
        if run_cfg.dump_every and done % run_cfg.dump_every == 0:
            write_lammpstrj(run_cfg.dump_path, state)
        if run_cfg.restart_every and done % run_cfg.restart_every == 0:
            save_restart(run_cfg.restart_path, state)
    # LAMMPS-style timing footer (SURVEY.md §5.1)
    print(timer.summary())
    return 0


if __name__ == "__main__":
    sys.exit(main())
