"""On-demand build of the native BDD extension (no pybind11 in this
environment; plain CPython C API + g++)."""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sysconfig

_DIR = os.path.dirname(os.path.abspath(__file__))


def build_extension():
    src = os.path.join(_DIR, "bdd_native.cpp")
    ext_suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(_DIR, "bdd_native" + ext_suffix)
    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
        include = sysconfig.get_paths()["include"]
        cmd = [
            "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
            f"-I{include}", src, "-o", out,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
    spec = importlib.util.spec_from_file_location("spf_tpu.native.bdd_native", out)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
