"""Checkpoint / restart — binary snapshots of the full State pytree.

Analog of the reference's ``write_restart``/``read_restart`` (LAMMPS
``src/write_restart.cpp``; SURVEY.md §3.5, §5.4). Because State is one
pytree of fixed-shape arrays and the pair RNG is a pure function of
(tags, step, seed), a snapshot needs NO RNG state and resume is bitwise
exact — strictly stronger than the reference's guarantee.

Format: one ``.npz`` with every non-None array field plus a JSON header
(version, field presence, box). Host-side only — never in the hot loop.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from meso_tpu.core.box import Box
from meso_tpu.core.state import State

_FIELDS = ["x", "v", "f", "typ", "tag", "image", "mask", "mol",
           "T", "dTdt", "C", "dCdt"]
_VERSION = 1


def save_restart(path: str, state: State) -> None:
    arrays = {}
    present = []
    for name in _FIELDS:
        val = getattr(state, name)
        if val is not None:
            arrays[name] = np.asarray(val)
            present.append(name)
    arrays["step"] = np.asarray(state.step)
    arrays["box_lo"] = np.asarray(state.box.lo)
    arrays["box_hi"] = np.asarray(state.box.hi)
    header = {"version": _VERSION, "fields": present}
    arrays["_header"] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_restart(path: str) -> State:
    with np.load(path) as z:
        header = json.loads(bytes(z["_header"].tobytes()).decode())
        if header["version"] != _VERSION:
            raise ValueError(f"restart version {header['version']} unsupported")
        kw = {name: jnp.asarray(z[name]) for name in header["fields"]}
        for name in _FIELDS:
            kw.setdefault(name, None)
        box = Box(lo=jnp.asarray(z["box_lo"]), hi=jnp.asarray(z["box_hi"]))
        return State(box=box, step=jnp.asarray(z["step"]), **kw)


# ---------------------------------------------------------------------------
# Orbax backend (SURVEY.md §5.4 alternative): async-capable, sharding-aware
# checkpointing for multi-chip runs. Optional — the npz codec above stays
# the dependency-free default.
# ---------------------------------------------------------------------------

def save_restart_orbax(path: str, state: State) -> None:
    """Checkpoint the State pytree with Orbax (StandardCheckpointer).

    `path` must be a directory path (created if missing). Sharded arrays
    are saved with their shardings, so distributed states (leading device
    axes from distribute_state*) round-trip without gathering to host.
    """
    import os

    import orbax.checkpoint as ocp

    payload = {"step": state.step, "box_lo": state.box.lo,
               "box_hi": state.box.hi}
    for name in _FIELDS:
        val = getattr(state, name)
        if val is not None:
            payload[name] = val
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), payload, force=True)
    ckpt.wait_until_finished()


def load_restart_orbax(path: str) -> State:
    import os

    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    payload = ckpt.restore(os.path.abspath(path))
    kw = {name: jnp.asarray(payload[name]) if name in payload else None
          for name in _FIELDS}
    box = Box(lo=jnp.asarray(payload["box_lo"]),
              hi=jnp.asarray(payload["box_hi"]))
    return State(box=box, step=jnp.asarray(payload["step"]), **kw)
