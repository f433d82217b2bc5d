"""ctypes loader for the native CPU reference library.

Builds on demand with `make -C hoigen_tpu/native` (g++)."""
import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB = os.path.join(_HERE, "libhoigen_native.so")
_lib = None


def _load():
    global _lib
    if _lib is None:
        if not os.path.exists(_LIB):
            subprocess.check_call(["make", "-C", _HERE, "-s"])
        _lib = ctypes.CDLL(_LIB)
        _lib.generate_masks.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        _lib.generate_masks.restype = None
    return _lib


def generate_masks_native(boxes: np.ndarray, h: int, w: int) -> np.ndarray:
    """C++ reference for ops.masks.generate_masks (numpy in/out)."""
    lib = _load()
    boxes = np.ascontiguousarray(boxes, dtype=np.float32)
    n = boxes.shape[0]
    out = np.zeros((n, h, w), dtype=np.float32)
    lib.generate_masks(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
