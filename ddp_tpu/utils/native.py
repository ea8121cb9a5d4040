"""ctypes bindings for the native C++ runtime (cpp/ddp_runtime.cpp).

Builds the shared library on first use (g++, cached) and degrades to pure
Python when no toolchain is available.  Native pieces: chronometer/logging
(≙ src/lib.cpp) and the URDF scanner (≙ urdfdom ingestion).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CPPDIR = os.path.join(_REPO, "cpp")
_SO = os.path.join(_CPPDIR, "libddp_runtime.so")

_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_CPPDIR, "ddp_runtime.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["make", "-C", _CPPDIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def load():
    """Return the loaded native library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # always invoke make: a no-op when the .so is current, a rebuild when
    # ddp_runtime.cpp is newer (keeps a stale .so from shipping an older ABI)
    if not _build() and not os.path.exists(_SO):
        return None
    try:
        lib = ctypes.CDLL(_SO)
        _bind(lib)
    except (OSError, AttributeError):
        # unloadable or ABI-stale library (missing symbol) → no native path
        return None
    _lib = lib
    return _lib


def _bind(lib):
    lib.ddp_log.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.ddp_chrono_start.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.ddp_chrono_start.restype = ctypes.c_int64
    lib.ddp_chrono_stop.argtypes = [ctypes.c_int64]
    lib.ddp_chrono_stop.restype = ctypes.c_double
    lib.ddp_report_failure.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p,
    ]  # fmt: skip
    lib.ddp_urdf_parse.argtypes = [ctypes.c_char_p]
    lib.ddp_urdf_parse.restype = ctypes.c_int64
    for f in ("ddp_urdf_n_joints", "ddp_urdf_n_links"):
        getattr(lib, f).argtypes = [ctypes.c_int64]
        getattr(lib, f).restype = ctypes.c_int64
    lib.ddp_urdf_joint_numeric.argtypes = [
        ctypes.c_int64, ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]  # fmt: skip
    lib.ddp_urdf_joint_limit_mimic.argtypes = [
        ctypes.c_int64, ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]  # fmt: skip
    lib.ddp_urdf_link_inertial.argtypes = [ctypes.c_int64, ctypes.POINTER(ctypes.c_double)]
    lib.ddp_urdf_string.argtypes = [ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64]
    lib.ddp_urdf_string.restype = ctypes.c_char_p
    lib.ddp_urdf_free.argtypes = [ctypes.c_int64]


class NativeChrono:
    """Context manager over the C++ chronometer (≙ chronometer_t)."""

    def __init__(self, message: str, path: str = "/tmp/chrono.log"):
        self.message = message
        self.path = path
        self.handle = None
        self.elapsed = None

    def __enter__(self):
        lib = load()
        if lib is not None:
            self.handle = lib.ddp_chrono_start(self.message.encode(), self.path.encode())
        return self

    def __exit__(self, *exc):
        lib = load()
        if lib is not None and self.handle is not None:
            self.elapsed = lib.ddp_chrono_stop(self.handle)
        return False


def native_log(path: str, msg: str) -> bool:
    lib = load()
    if lib is None:
        return False
    lib.ddp_log(path.encode(), msg.encode())
    return True


def parse_urdf_native(xml: str):
    """Parse URDF with the C++ scanner.  Returns a dict of raw records
    (same information content as the Python xml.etree pass) or None if the
    native library is unavailable."""
    import numpy as np

    lib = load()
    if lib is None:
        return None
    h = lib.ddp_urdf_parse(xml.encode())
    if h == 0:
        raise ValueError("native URDF parse failed")
    try:
        nj = lib.ddp_urdf_n_joints(h)
        nl = lib.ddp_urdf_n_links(h)
        origin = np.zeros(nj * 6, dtype=np.float64)
        axis = np.zeros(nj * 3, dtype=np.float64)
        lib.ddp_urdf_joint_numeric(
            h,
            origin.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            axis.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        inertial = np.zeros(nl * 13, dtype=np.float64)
        lib.ddp_urdf_link_inertial(
            h, inertial.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        )
        lim = np.zeros(nj * 9, dtype=np.float64)
        mim = np.zeros(nj * 3, dtype=np.float64)
        lib.ddp_urdf_joint_limit_mimic(
            h,
            lim.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            mim.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        lim = lim.reshape(nj, 9)
        mim = mim.reshape(nj, 3)

        def strings(table, n):
            return [lib.ddp_urdf_string(h, table.encode(), i).decode() for i in range(n)]

        mimic_joint = strings("joint_mimic_joint", nj)
        # same record format as _records_from_etree: None when the element
        # is absent, dict of *present* attributes otherwise
        joint_limits = [
            None
            if lim[i, 0] == 0.0
            else {
                k: lim[i, 2 + 2 * j]
                for j, k in enumerate(("lower", "upper", "velocity", "effort"))
                if lim[i, 1 + 2 * j] != 0.0
            }
            for i in range(nj)
        ]
        joint_mimic = [
            None
            if mim[i, 0] == 0.0
            else {
                "joint": mimic_joint[i],
                "multiplier": mim[i, 1],
                "offset": mim[i, 2],
            }
            for i in range(nj)
        ]

        return dict(
            robot_name=lib.ddp_urdf_string(h, b"robot_name", 0).decode(),
            joint_names=strings("joint_name", nj),
            joint_types=strings("joint_type", nj),
            joint_parents=strings("joint_parent", nj),
            joint_children=strings("joint_child", nj),
            joint_origin=origin.reshape(nj, 6),
            joint_axis=axis.reshape(nj, 3),
            joint_limits=joint_limits,
            joint_mimic=joint_mimic,
            link_names=strings("link_name", nl),
            link_inertial=inertial.reshape(nl, 13),
        )
    finally:
        lib.ddp_urdf_free(h)
