"""Trajectory output — `dump atom/xyz/custom` analogs (SURVEY.md §2a row 12).

Text formats compatible with common MD tooling (VMD/OVITO): classic ``.xyz``
and the LAMMPS ``.lammpstrj`` custom dump. Output is tag-sorted so frames
are comparable across neighbor-rebuild reorderings. Host-side only.
"""

from __future__ import annotations

import numpy as np

from meso_tpu.core.state import State

_ELEMENTS = ["A", "B", "C", "D", "E", "F", "G", "H"]


def _gather(state: State):
    mask = np.asarray(state.mask)
    tag = np.asarray(state.tag)[mask]
    order = np.argsort(tag)
    x = np.asarray(state.x)[mask][order]
    v = np.asarray(state.v)[mask][order]
    typ = np.asarray(state.typ)[mask][order]
    return tag[order], typ, x, v


def write_xyz(path: str, state: State, append: bool = True) -> None:
    tag, typ, x, _ = _gather(state)
    with open(path, "a" if append else "w") as fh:
        fh.write(f"{len(tag)}\nstep {int(state.step)}\n")
        for t, p in zip(typ, x):
            el = _ELEMENTS[int(t) % len(_ELEMENTS)]
            fh.write(f"{el} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")


def write_lammpstrj(path: str, state: State, append: bool = True) -> None:
    tag, typ, x, v = _gather(state)
    lo = np.asarray(state.box.lo)
    hi = np.asarray(state.box.hi)
    with open(path, "a" if append else "w") as fh:
        fh.write("ITEM: TIMESTEP\n%d\n" % int(state.step))
        fh.write("ITEM: NUMBER OF ATOMS\n%d\n" % len(tag))
        fh.write("ITEM: BOX BOUNDS pp pp pp\n")
        for d in range(3):
            fh.write(f"{lo[d]:.6f} {hi[d]:.6f}\n")
        fh.write("ITEM: ATOMS id type x y z vx vy vz\n")
        for i in range(len(tag)):
            fh.write(f"{tag[i]} {typ[i] + 1} "
                     f"{x[i,0]:.6f} {x[i,1]:.6f} {x[i,2]:.6f} "
                     f"{v[i,0]:.6f} {v[i,1]:.6f} {v[i,2]:.6f}\n")
