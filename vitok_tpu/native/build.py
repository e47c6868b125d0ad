"""Build the native preprocessing extension in place.

Usage: ``python -m vitok_tpu.native.build``

Compiles ``pp_native.cpp`` with g++ (-O3 -fopenmp) into
``vitok_tpu/native/_pp_native*.so`` using the CPython C API directly — no
pybind11/setuptools dependency chain.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig


def build(verbose: bool = True) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "pp_native.cpp")
    ext_suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(here, "_pp_native" + ext_suffix)
    include = sysconfig.get_path("include")
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-fopenmp",
        "-march=native",
        f"-I{include}",
        src, "-o", out,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    # smoke-test the load
    from vitok_tpu.native import native_available

    sys.exit(0 if native_available() else 1)
