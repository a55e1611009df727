"""ctypes bindings for the C++ image-preprocessing library (native/image_prep.cpp).

Builds the shared library on first use (g++, cached beside the source) and
falls back to the PIL/numpy path transparently when a toolchain isn't
available. `preprocess_vit_patches_native` is a drop-in for
data.image_processing.preprocess_vit_patches."""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from gpt_image_edit_tpu.data.constants import OPENAI_CLIP_MEAN, OPENAI_CLIP_STD
from gpt_image_edit_tpu.data.image_processing import smart_resize

log = logging.getLogger("gie_tpu.native")

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "image_prep.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libimage_prep.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.abspath(_SRC)
    so = os.path.abspath(_SO)
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", so, src, "-lpthread"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.vit_preprocess.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, f32p, f32p,
        ]
        lib.vae_preprocess.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p,
        ]
        lib.resize_bicubic_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p,
            ctypes.c_int, ctypes.c_int,
        ]
        _LIB = lib
    except Exception as e:  # pragma: no cover
        log.warning("native image_prep unavailable (%s); using PIL fallback", e)
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _u8(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def preprocess_vit_patches_native(
    image,
    *,
    patch_size: int = 14,
    merge_size: int = 2,
    temporal_patch_size: int = 2,
    min_pixels: int = 200704,
    max_pixels: int = 200704,
) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    lib = _load()
    if lib is None:
        from gpt_image_edit_tpu.data.image_processing import preprocess_vit_patches

        return preprocess_vit_patches(
            image, patch_size=patch_size, merge_size=merge_size,
            temporal_patch_size=temporal_patch_size,
            min_pixels=min_pixels, max_pixels=max_pixels,
        )
    arr = np.ascontiguousarray(np.asarray(image.convert("RGB"), dtype=np.uint8))
    sh, sw = arr.shape[:2]
    rh, rw = smart_resize(sh, sw, patch_size * merge_size, min_pixels, max_pixels)
    gh, gw = rh // patch_size, rw // patch_size
    feat = 3 * temporal_patch_size * patch_size * patch_size
    out = np.empty((gh * gw, feat), np.float32)
    mean = np.asarray(OPENAI_CLIP_MEAN, np.float32)
    std = np.asarray(OPENAI_CLIP_STD, np.float32)
    lib.vit_preprocess(
        _u8(arr), sh, sw, rh, rw, patch_size, merge_size, temporal_patch_size,
        _f32(mean), _f32(std), _f32(out),
    )
    return out, (1, gh, gw)


def preprocess_vae_image_native(image, height: int, width: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        from gpt_image_edit_tpu.data.image_processing import preprocess_vae_image

        return preprocess_vae_image(image, height, width)
    arr = np.ascontiguousarray(np.asarray(image.convert("RGB"), dtype=np.uint8))
    out = np.empty((height, width, 3), np.float32)
    lib.vae_preprocess(_u8(arr), arr.shape[0], arr.shape[1], height, width, _f32(out))
    return out
