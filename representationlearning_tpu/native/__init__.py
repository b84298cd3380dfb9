"""Native (C++/OpenMP) host-side kernels with ctypes bindings — the role the
reference's C++/SWIG extension plays (`SCD-AAAI2023/wrapper/bilateralfilter/`), built
on demand with g++ (no pybind11 in the image).

`bilateral_filter_batch_native(images, inputs, sigma_rgb, sigma_xy)` computes the same
unnormalized 5-D Gaussian transform as `ops.bilateral` on the CPU via the permutohedral
lattice, OpenMP-parallel over the batch. Used as the exact-parity host backend for the
DenseEnergy loss (`method="native"`) and as an independent oracle for the TPU bilateral
grid in tests.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "permutohedral.cc")
_LIB = os.path.join(os.path.dirname(__file__), "libpermutohedral.so")
_lib = None


def _build() -> str:
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        cmd = ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", _SRC, "-o", _LIB]
        subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build())
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.bilateral_filter.argtypes = [
            f32p, f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float,
        ]
        lib.bilateral_filter_batch.argtypes = [
            f32p, f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def bilateral_filter_native(image: np.ndarray, inputs: np.ndarray,
                            sigma_rgb: float, sigma_xy: float) -> np.ndarray:
    """image (H, W, 3) in [0, 255]; inputs (H, W, K) -> (H, W, K)."""
    lib = load()
    image = np.ascontiguousarray(image, np.float32)
    inputs = np.ascontiguousarray(inputs, np.float32)
    H, W, K = inputs.shape
    out = np.empty_like(inputs)
    lib.bilateral_filter(image, inputs, out, H, W, K,
                         float(sigma_rgb), float(sigma_xy))
    return out


def bilateral_filter_batch_native(images: np.ndarray, inputs: np.ndarray,
                                  sigma_rgb: float, sigma_xy: float) -> np.ndarray:
    """images (N, H, W, 3); inputs (N, H, W, K) -> (N, H, W, K), OpenMP over N."""
    lib = load()
    images = np.ascontiguousarray(images, np.float32)
    inputs = np.ascontiguousarray(inputs, np.float32)
    N, H, W, K = inputs.shape
    out = np.empty_like(inputs)
    lib.bilateral_filter_batch(images, inputs, out, N, K, H, W,
                               float(sigma_rgb), float(sigma_xy))
    return out
