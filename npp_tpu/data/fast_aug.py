"""ctypes bindings for the native fused augmentation kernel.

The native library (native/npp_native.cpp) composes the reference's
scale -> rotate -> crop -> flip chain (dataset/data_augmentation.py, three
full-image cv2 resamples) into ONE inverse warp with fused normalization —
a host-side throughput kernel for feeding the TPU. Falls back cleanly when
the library isn't built (``is_available()``).

Build: ``make -C native`` (auto-attempted on first import).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from npp_tpu.data.lip import IMAGENET_MEAN, IMAGENET_STD

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_ROOT, "native", "libnpp_native.so")
_lib: Optional[ctypes.CDLL] = None


def _try_build() -> None:
    makefile = os.path.join(_ROOT, "native", "Makefile")
    if not os.path.isfile(makefile):
        return
    try:
        subprocess.run(["make", "-C", os.path.join(_ROOT, "native")],
                       capture_output=True, timeout=120, check=False)
    except Exception:
        pass


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB_PATH):
        _try_build()
    if not os.path.isfile(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.npp_fused_augment.restype = None
    lib.npp_fused_augment.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    if hasattr(lib, "npp_fused_augment_u8"):
        lib.npp_fused_augment_u8.restype = None
        lib.npp_fused_augment_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
    lib.npp_transform_joints.restype = None
    lib.npp_transform_joints.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.npp_native_version.restype = ctypes.c_int
    _lib = lib
    return lib


def is_available() -> bool:
    return _load() is not None


_MEAN = np.ascontiguousarray(IMAGENET_MEAN, np.float32)
_STD = np.ascontiguousarray(IMAGENET_STD, np.float32)


def make_swap_lut(flip_pairs) -> np.ndarray:
    lut = np.arange(256, dtype=np.uint8)
    for a, b in flip_pairs:
        lut[a], lut[b] = b, a
    return lut


def fused_augment(image: np.ndarray, label: Optional[np.ndarray],
                  joints: Optional[np.ndarray], *, scale: float,
                  rot_deg: float, crop_dx: float, crop_dy: float,
                  flip: bool, out_hw: tuple[int, int],
                  swap_lut: Optional[np.ndarray] = None,
                  as_uint8: bool = False):
    """One-pass augmented sample.

    Returns (out_img (H,W,3) — f32 ImageNet-normalized, or raw uint8 when
    ``as_uint8`` (device-normalize pipelines) — out_label uint8 (H,W) or
    None, joints transformed (copy) or None).
    """
    lib = _load()
    assert lib is not None, "native library not built (make -C native)"
    oh, ow = out_hw
    image = np.ascontiguousarray(image, np.uint8)
    out_label = None
    label_ptr = None
    out_label_ptr = None
    if label is not None:
        label = np.ascontiguousarray(label, np.uint8)
        out_label = np.empty((oh, ow), np.uint8)
        label_ptr = label.ctypes.data_as(ctypes.c_void_p)
        out_label_ptr = out_label.ctypes.data_as(ctypes.c_void_p)
    lut = (np.ascontiguousarray(swap_lut, np.uint8)
           if swap_lut is not None else make_swap_lut(()))
    if as_uint8:
        assert hasattr(lib, "npp_fused_augment_u8"), \
            "stale native library — rebuild with make -C native"
        out_img = np.empty((oh, ow, 3), np.uint8)
        lib.npp_fused_augment_u8(
            image.ctypes.data_as(ctypes.c_void_p), label_ptr,
            image.shape[0], image.shape[1],
            ctypes.c_float(scale), ctypes.c_float(rot_deg),
            ctypes.c_float(crop_dx), ctypes.c_float(crop_dy),
            int(flip), oh, ow,
            lut.ctypes.data_as(ctypes.c_void_p),
            out_img.ctypes.data_as(ctypes.c_void_p), out_label_ptr)
    else:
        out_img = np.empty((oh, ow, 3), np.float32)
        lib.npp_fused_augment(
            image.ctypes.data_as(ctypes.c_void_p), label_ptr,
            image.shape[0], image.shape[1],
            ctypes.c_float(scale), ctypes.c_float(rot_deg),
            ctypes.c_float(crop_dx), ctypes.c_float(crop_dy),
            int(flip), oh, ow,
            _MEAN.ctypes.data_as(ctypes.c_void_p),
            _STD.ctypes.data_as(ctypes.c_void_p),
            lut.ctypes.data_as(ctypes.c_void_p),
            out_img.ctypes.data_as(ctypes.c_void_p), out_label_ptr)
    out_joints = None
    if joints is not None:
        out_joints = np.ascontiguousarray(joints, np.float32).copy()
        lib.npp_transform_joints(
            out_joints.ctypes.data_as(ctypes.c_void_p), out_joints.shape[0],
            image.shape[0], image.shape[1], ctypes.c_float(scale),
            ctypes.c_float(rot_deg), ctypes.c_float(crop_dx),
            ctypes.c_float(crop_dy), int(flip), ow)
    return out_img, out_label, out_joints
