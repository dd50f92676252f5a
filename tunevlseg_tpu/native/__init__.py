"""Native (C++) host-pipeline components.

`get_imgcodec()` returns the compiled `_imgcodec` extension (libjpeg/libpng
decode with the GIL released), building it on first use with the system
toolchain. Returns None when a compiler or the codec headers are missing —
callers fall back to cv2.
"""
from __future__ import annotations

import logging
import os
import subprocess
import sys
import sysconfig
from pathlib import Path

_DIR = Path(__file__).resolve().parent
_mod = None
_tried = False


def _so_path() -> Path:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return _DIR / f"_imgcodec{suffix}"


def build(verbose: bool = False) -> bool:
    """Compile imgcodec.cpp into this package directory. Idempotent."""
    src = _DIR / "imgcodec.cpp"
    out = _so_path()
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return True
    import numpy as np
    py_inc = sysconfig.get_paths()["include"]
    np_inc = np.get_include()
    cmd = [
        os.environ.get("CXX", "g++"), "-O2", "-fPIC", "-shared", "-std=c++17",
        f"-I{py_inc}", f"-I{np_inc}", str(src), "-o", str(out),
        "-ljpeg", "-lpng",
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        logging.getLogger("tunevlseg").info("native build unavailable: %s", e)
        return False
    if res.returncode != 0:
        if verbose:
            sys.stderr.write(res.stderr)
        logging.getLogger("tunevlseg").info(
            "native imgcodec build failed:\n%s", res.stderr[-2000:])
        return False
    return True


def get_imgcodec():
    """The compiled module, or None (build failure / disabled via
    TUNEVLSEG_NATIVE=0)."""
    global _mod, _tried
    if _mod is not None or _tried:
        return _mod
    _tried = True
    if os.environ.get("TUNEVLSEG_NATIVE", "1") == "0":
        return None
    if not build():
        return None
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "tunevlseg_tpu.native._imgcodec", _so_path())
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except ImportError as e:
        logging.getLogger("tunevlseg").info("native imgcodec load failed: %s",
                                            e)
        return None
    _mod = mod
    return _mod
