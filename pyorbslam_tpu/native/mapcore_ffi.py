"""ctypes bindings for the native map core (with auto-build)."""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libmapcore.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            from pyorbslam_tpu.native.build import build

            build(verbose=False)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.mapcore_new.restype = ctypes.c_void_p
    for fn in ("mapcore_add_keyframe", "mapcore_add_observation",
               "mapcore_erase_observation", "mapcore_free"):
        getattr(lib, fn).restype = None
    for fn in ("mapcore_n_observations", "mapcore_observers",
               "mapcore_update_connections", "mapcore_neighbors",
               "mapcore_assemble_obs"):
        getattr(lib, fn).restype = ctypes.c_int32
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class MapCore:
    """Native observation index + covisibility graph."""

    def __init__(self, n_features: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native mapcore unavailable")
        self._lib = lib
        self._h = ctypes.c_void_p(lib.mapcore_new(n_features))
        self.n_features = n_features

    def __del__(self):
        if getattr(self, "_h", None) and self._lib:
            self._lib.mapcore_free(self._h)

    def add_keyframe(self, kf: int, obs_lm: np.ndarray):
        obs = np.ascontiguousarray(obs_lm, np.int32)
        self._lib.mapcore_add_keyframe(self._h, kf, _i32p(obs))

    def add_observation(self, lm: int, kf: int, feat: int):
        self._lib.mapcore_add_observation(self._h, lm, kf, feat)

    def erase_observation(self, lm: int, kf: int):
        self._lib.mapcore_erase_observation(self._h, lm, kf)

    def n_observations(self, lm: int) -> int:
        return self._lib.mapcore_n_observations(self._h, lm)

    def observers(self, lm: int, cap: int = 256) -> Tuple[np.ndarray, np.ndarray]:
        kfs = np.empty(cap, np.int32)
        feats = np.empty(cap, np.int32)
        n = self._lib.mapcore_observers(self._h, lm, _i32p(kfs), _i32p(feats), cap)
        return kfs[:n], feats[:n]

    def update_connections(self, kf: int, th: int = 15, cap: int = 1024
                           ) -> Tuple[np.ndarray, np.ndarray]:
        ids = np.empty(cap, np.int32)
        w = np.empty(cap, np.int32)
        n = self._lib.mapcore_update_connections(
            self._h, kf, th, _i32p(ids), _i32p(w), cap)
        return ids[:n], w[:n]

    def neighbors(self, kf: int, cap: int = 1024) -> Tuple[np.ndarray, np.ndarray]:
        ids = np.empty(cap, np.int32)
        w = np.empty(cap, np.int32)
        n = self._lib.mapcore_neighbors(self._h, kf, _i32p(ids), _i32p(w), cap)
        return ids[:n], w[:n]

    def assemble_obs(self, cam_ids: np.ndarray, pnt_ids: np.ndarray,
                     u_right: np.ndarray, cap: int):
        """Stereo-only BA observation lists; u_right must be the dense
        (kf_capacity, n_features) float32 array."""
        cam_ids = np.ascontiguousarray(cam_ids, np.int32)
        pnt_ids = np.ascontiguousarray(pnt_ids, np.int32)
        ur = np.ascontiguousarray(u_right, np.float32)
        oc = np.empty(cap, np.int32)
        op = np.empty(cap, np.int32)
        okf = np.empty(cap, np.int32)
        oft = np.empty(cap, np.int32)
        n = self._lib.mapcore_assemble_obs(
            self._h, _i32p(cam_ids), len(cam_ids), _i32p(pnt_ids),
            len(pnt_ids), _f32p(ur), ur.shape[1],
            _i32p(oc), _i32p(op), _i32p(okf), _i32p(oft), cap)
        return oc[:n], op[:n], okf[:n], oft[:n]
