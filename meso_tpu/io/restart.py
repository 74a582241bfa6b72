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
