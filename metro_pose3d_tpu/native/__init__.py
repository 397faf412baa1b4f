"""Loader for the `_metro_native` C extension (build-on-first-import).

The extension (native/jpegdec.c) is the host-side native runtime: threaded
libjpeg decode + tile extraction, the TPU rebuild's equivalent of the
reference's jpeg4py/libjpeg-turbo + OpenCV host path (SURVEY.md §3). It is
compiled once into this directory with the system compiler; all callers go
through `utils.improc`, which falls back to cv2 when the toolchain or
libjpeg is unavailable, so the framework never hard-depends on the build.
"""
from __future__ import annotations

import importlib
import importlib.util
import os
import subprocess
import sysconfig

_DIR = os.path.dirname(os.path.abspath(__file__))


def _ext_path() -> str:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_DIR, f"_metro_native{suffix}")


_SOURCES = ("jpegdec.c", "croprep.c")


def _build() -> bool:
    srcs = [os.path.join(_DIR, s) for s in _SOURCES]
    out = _ext_path()
    include = sysconfig.get_paths()["include"]
    base = [
        os.environ.get("CC", "cc"), "-O3", "-shared", "-fPIC", "-pthread",
        f"-I{include}", *srcs, "-ljpeg", "-lm", "-o", out,
    ]
    # the extension is built on (and for) this host: prefer the native ISA
    # (vectorizes the tile-decimation inner loops), fall back to generic
    for extra in (["-march=native"], []):
        cmd = base[:1] + extra + base[1:]
        try:
            res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        except (OSError, subprocess.TimeoutExpired):
            return False
        if res.returncode == 0 and os.path.exists(out):
            return True
    return False


def load():
    """Import the extension, building it first if needed. None on failure."""
    path = _ext_path()
    src_mtime = max(os.path.getmtime(os.path.join(_DIR, s)) for s in _SOURCES)
    if not os.path.exists(path) or os.path.getmtime(path) < src_mtime:
        if not _build():
            return None
    try:
        spec = importlib.util.spec_from_file_location("_metro_native", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except ImportError:
        return None
