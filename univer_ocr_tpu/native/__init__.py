"""ctypes bindings for the native host-CV kernels, with scipy fallbacks.

`available()` is False when the shared library hasn't been built (run
`make -C univer_ocr_tpu/native`); callers then use scipy.ndimage.  The
ctypes route (rather than pybind11, absent from this image) keeps the
binding dependency-free.
"""

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / 'libunivocr_native.so'
_lib = None


def build():
    """Compile the shared library in place."""
    subprocess.run(['make', '-C', str(_DIR)], check=True,
                   capture_output=True)
    return _load()


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.ccl_4conn.restype = ctypes.c_int
    lib.ccl_4conn.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32)]
    lib.label_bboxes.restype = None
    lib.label_bboxes.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
    lib.rotated_size.restype = None
    lib.rotated_size.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.rotate_image.restype = None
    lib.rotate_image.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_double, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
    lib.zoom_nearest.restype = None
    lib.zoom_nearest.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int]
    _lib = lib
    return lib


def available():
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def label(mask):
    """4-connectivity CCL over a 2-D boolean/uint8 mask.

    Returns (labels int32 HxW, count) with scipy.ndimage.label-compatible
    raster-order numbering.
    """
    lib = _load()
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    H, W = mask.shape
    labels = np.empty((H, W), dtype=np.int32)
    n = lib.ccl_4conn(_ptr(mask, ctypes.c_uint8), H, W,
                      _ptr(labels, ctypes.c_int32))
    return labels, n


def find_objects(labels, n):
    """Bounding-box slices per label (scipy.ndimage.find_objects shape)."""
    lib = _load()
    labels = np.ascontiguousarray(labels, dtype=np.int32)
    H, W = labels.shape
    boxes = np.empty((n, 4), dtype=np.int32)
    lib.label_bboxes(_ptr(labels, ctypes.c_int32), H, W, n,
                     _ptr(boxes, ctypes.c_int32))
    return [(slice(int(b[0]), int(b[1])), slice(int(b[2]), int(b[3])))
            for b in boxes]


def rotate(arr, angle, order=1):
    """Rotate a (H, W, C) float32 array with expansion, matching the
    interpreter's rotate_array convention (scipy axes=(2,1))."""
    lib = _load()
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    H, W, C = arr.shape
    outH = ctypes.c_int()
    outW = ctypes.c_int()
    lib.rotated_size(H, W, float(angle), ctypes.byref(outH),
                     ctypes.byref(outW))
    out = np.empty((outH.value, outW.value, C), dtype=np.float32)
    lib.rotate_image(_ptr(arr, ctypes.c_float), H, W, C, float(angle),
                     int(order), _ptr(out, ctypes.c_float),
                     outH.value, outW.value)
    return out


def zoom(arr, out_h, out_w):
    """Nearest-neighbor zoom of (H, W, C) float32 to (out_h, out_w, C)."""
    lib = _load()
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    H, W, C = arr.shape
    out = np.empty((out_h, out_w, C), dtype=np.float32)
    lib.zoom_nearest(_ptr(arr, ctypes.c_float), H, W, C,
                     _ptr(out, ctypes.c_float), out_h, out_w)
    return out
