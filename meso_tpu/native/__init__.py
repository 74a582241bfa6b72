"""Native (C++) runtime components, built on demand with the system g++.

The compute path is JAX/XLA/Pallas; host-side runtime pieces where the
reference uses C++ (dump/restart formatting, frame codecs; SURVEY.md §2a
rows 12-13) are implemented as a CPython extension compiled at first use
(no pybind11 in the image; plain C API + buffer protocol).
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, f"_mesoio{sysconfig.get_config_var('EXT_SUFFIX')}")
_SRC = os.path.join(_DIR, "mesoio.cpp")


def _build() -> None:
    include = sysconfig.get_paths()["include"]
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
           f"-I{include}", _SRC, "-o", _SO + ".tmp"]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    os.replace(_SO + ".tmp", _SO)


def load():
    """Import the native module, building it if needed. Returns the module
    or None if the toolchain is unavailable (callers fall back to Python)."""
    if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        try:
            _build()
        except (OSError, subprocess.CalledProcessError) as e:
            detail = getattr(e, "stderr", "") or str(e)
            sys.stderr.write(f"[meso_tpu.native] build failed: {detail}\n")
            return None
    sys.path.insert(0, _DIR)
    try:
        import _mesoio
        return _mesoio
    except ImportError as e:
        sys.stderr.write(f"[meso_tpu.native] import failed: {e}\n")
        return None
    finally:
        sys.path.remove(_DIR)
