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


_NATIVE = None
_NATIVE_TRIED = False


def _native():
    """Lazily build/load the C++ IO extension (meso_tpu/native)."""
    global _NATIVE, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE_TRIED = True
        from meso_tpu import native as native_pkg
        _NATIVE = native_pkg.load()
    return _NATIVE


def _frame_args(path, state, append):
    lo = tuple(float(v) for v in np.asarray(state.box.lo))
    hi = tuple(float(v) for v in np.asarray(state.box.hi))
    return (path, bool(append), int(state.step), lo, hi,
            np.ascontiguousarray(np.asarray(state.tag, np.int32)),
            np.ascontiguousarray(np.asarray(state.typ, np.int32)),
            np.ascontiguousarray(np.asarray(state.x, np.float32)),
            np.ascontiguousarray(np.asarray(state.v, np.float32)),
            np.ascontiguousarray(np.asarray(state.mask, np.uint8)))


def write_frame_bin(path: str, state: State, append: bool = True) -> int:
    """Compact binary trajectory frame (native codec; SURVEY.md row 12)."""
    mod = _native()
    if mod is None:
        raise RuntimeError("native IO module unavailable")
    return mod.write_frame_bin(*_frame_args(path, state, append))


def read_frames_bin(path: str) -> list[dict]:
    """Read all binary frames -> list of dicts of numpy arrays."""
    mod = _native()
    if mod is None:
        raise RuntimeError("native IO module unavailable")
    out = []
    for rec in mod.read_frames_bin(path):
        n = rec["n"]
        out.append({
            "step": rec["step"],
            "box_lo": np.asarray(rec["box_lo"]),
            "box_hi": np.asarray(rec["box_hi"]),
            "tag": np.frombuffer(rec["tag"], np.int32),
            "typ": np.frombuffer(rec["typ"], np.int32),
            "x": np.frombuffer(rec["x"], np.float32).reshape(n, 3),
            "v": np.frombuffer(rec["v"], np.float32).reshape(n, 3),
        })
    return out


def write_lammpstrj(path: str, state: State, append: bool = True) -> None:
    mod = _native()
    if mod is not None:
        mod.write_lammpstrj(*_frame_args(path, state, append))
        return
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
