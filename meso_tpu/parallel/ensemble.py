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
