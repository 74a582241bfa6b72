"""Ensemble (replica) parallelism — the LAMMPS multi-universe analog.

The reference's only data-parallel mode is `-partition` (independent
simulations / replica exchange; SURVEY.md §2c row DP, ``universe.cpp``).
TPU-native: replicas as a leading axis sharded over a ("dp",) mesh with
shard_map; each device advances its replica(s) with the same jitted step,
observables psum-reduce. Composes with the spatial axis (mesh ("dp","x"))
when both are needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from meso_tpu.core.state import State
from meso_tpu.core.system import System, SystemParams, make_step


def replicate_state(state: State, n_replicas: int, reseed: bool = True):
    """Stack n_replicas copies on a leading axis. With ``reseed``, each
    replica gets distinct velocities by re-signing tags into disjoint
    ranges (the counter-based RNG then decorrelates all trajectories)."""
    def stack(a):
        return jnp.broadcast_to(a[None], (n_replicas,) + a.shape) \
            if a is not None else None

    dstate = jax.tree.map(stack, state)
    if reseed:
        n_tags = int(jnp.max(state.tag))
        offsets = (jnp.arange(n_replicas, dtype=jnp.int32) * n_tags)[:, None]
        tags = jnp.where(dstate.mask, dstate.tag + offsets, 0)
        dstate = dstate.replace(tag=tags)
    return dstate


def make_ensemble_mesh(n_replicas: int) -> Mesh:
    return Mesh(np.array(jax.devices()[:n_replicas]), ("dp",))


@partial(jax.jit, static_argnames=("system", "nsteps", "mesh"))
def run_ensemble(system: System, params: SystemParams, dstate: State,
                 nsteps: int, mesh: Mesh):
    """Advance every replica nsteps; returns (dstate, mean kinetic energy
    per replica psum-averaged). Replicas must use a bucket-resident state
    and fixed cadence (rebuild each chunk)."""
    from meso_tpu.neighbor.bucket_layout import rebuild_buckets

    step_fn = make_step(system)
    every = system.cells.rebuild_every

    def shard_body(params, dstate):
        state = jax.tree.map(lambda a: a[0], dstate)

        def chunk(s, _):
            s, of = rebuild_buckets(s, system.cells)

            def body(c, _):
                return step_fn(params, c), None

            s, _ = jax.lax.scan(body, s, None, length=every)
            return s, of

        state, ofs = jax.lax.scan(chunk, state, None,
                                  length=max(nsteps // every, 1))
        ke = 0.5 * jnp.sum(jnp.where(state.mask,
                                     jnp.sum(state.v ** 2, -1), 0.0))
        ke_mean = jax.lax.pmean(ke, "dp")
        return (jax.tree.map(lambda a: a[None], state), ke_mean[None],
                jnp.max(ofs)[None])

    return jax.shard_map(
        shard_body, mesh=mesh, in_specs=(P(), P("dp")),
        out_specs=(P("dp"), P("dp"), P("dp")))(params, dstate)


# ---------------------------------------------------------------------------
# composed DP x SP: replicas on a "dp" mesh axis, each spatially decomposed
# over the "x" axis (the multi-universe `-partition` analog composed with
# the brick decomposition; SURVEY.md §2c DP row x spatial row)
# ---------------------------------------------------------------------------

def make_ensemble_spatial_mesh(n_replicas: int, n_dev: int) -> Mesh:
    devs = np.array(jax.devices()[:n_replicas * n_dev]).reshape(
        n_replicas, n_dev)
    return Mesh(devs, ("dp", "x"))


def distribute_ensemble_spatial(state: State, n_replicas: int, dcfg,
                                reseed: bool = True) -> State:
    """Replicate, reseed tags into disjoint ranges, then slab-distribute
    each replica: leading axes (n_replicas, n_dev)."""
    from meso_tpu.parallel.domain import distribute_state

    reps = replicate_state(state, n_replicas, reseed=reseed)
    per = [distribute_state(jax.tree.map(lambda a: a[r], reps), dcfg)
           for r in range(n_replicas)]
    return jax.tree.map(lambda *ls: jnp.stack(ls), *per)


@partial(jax.jit, static_argnames=("system", "dcfg", "nchunks", "mesh"))
def run_distributed_ensemble(system: System, params, dstate: State,
                             nchunks: int, mesh: Mesh, dcfg):
    """Advance every replica with the full 1-D spatial machinery (migrate +
    rebuild + halo-sweep steps). Replicas never communicate; the spatial
    collectives address only the "x" axis, so the domain body is reused
    verbatim."""
    from meso_tpu.parallel.domain import (_migrate, _rebuild_slab,
                                          _step_local)

    def shard_body(params, dstate):
        state = jax.tree.map(lambda a: a[0, 0], dstate)
        me = jax.lax.axis_index("x")
        slab_lo = me.astype(jnp.float32) * dcfg.slab_w
        slab_hi = slab_lo + dcfg.slab_w
        side_x = dcfg.slab_w / dcfg.ncx_local

        def chunk(state, _):
            merged, of_mig = _migrate(state, dcfg, slab_lo, slab_hi)
            state, of_cell = _rebuild_slab(merged, dcfg.cells, slab_lo,
                                           side_x)

            def body(s, _):
                s, _miss = _step_local(system, params, dcfg, s)
                return s, None

            state, _ = jax.lax.scan(body, state, None,
                                    length=dcfg.rebuild_every)
            of = jax.lax.psum(jax.lax.psum(of_mig + of_cell, "x"), "dp")
            return state, {"overflow": of}

        state, diag = jax.lax.scan(chunk, state, None, length=nchunks)
        diag = {"overflow": jnp.max(diag["overflow"])[None, None]}
        return jax.tree.map(lambda a: a[None, None], state), diag

    return jax.shard_map(
        shard_body, mesh=mesh, in_specs=(P(), P("dp", "x")),
        out_specs=(P("dp", "x"), P("dp", "x")))(params, dstate)


def collect_ensemble_spatial(dstate: State) -> State:
    """Merge replica r's slabs into one global state per replica; returns a
    state stacked on a leading replica axis (host-side)."""
    from meso_tpu.parallel.domain import collect_state

    n_rep = dstate.x.shape[0]
    per = [collect_state(jax.tree.map(lambda a: a[r], dstate))
           for r in range(n_rep)]
    return jax.tree.map(lambda *ls: jnp.stack(ls), *per)
