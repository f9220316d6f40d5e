"""Build + load the native geometry shared library."""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import tempfile

_DIR = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_DIR, "geometry.cpp")
_LIB = osp.join(_DIR, "_geometry.so")

_lib = None


def _needs_build() -> bool:
    return (not osp.exists(_LIB)
            or os.stat(_SRC).st_mtime > os.stat(_LIB).st_mtime)


def build_library() -> str:
    if _needs_build():
        # Build to a temp name then atomically replace, so concurrent test
        # workers never load a half-written .so.
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
        os.close(fd)
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
               "-o", tmp, _SRC]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except subprocess.CalledProcessError as e:
            os.unlink(tmp)
            raise RuntimeError(
                f"native build failed:\n{e.stderr}") from e
        os.replace(tmp, _LIB)
    return _LIB


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(build_library())

    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)

    lib.esn_marching_tetrahedra.restype = ctypes.c_void_p
    lib.esn_marching_tetrahedra.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float]
    lib.esn_clean_mesh.restype = ctypes.c_void_p
    lib.esn_clean_mesh.argtypes = [
        f32p, ctypes.c_int, i32p, ctypes.c_int, ctypes.c_float]
    lib.esn_result_n_verts.restype = ctypes.c_int
    lib.esn_result_n_verts.argtypes = [ctypes.c_void_p]
    lib.esn_result_n_tris.restype = ctypes.c_int
    lib.esn_result_n_tris.argtypes = [ctypes.c_void_p]
    lib.esn_result_copy.argtypes = [ctypes.c_void_p, f32p, i32p]
    lib.esn_result_free.argtypes = [ctypes.c_void_p]
    lib.esn_laplacian_smooth.argtypes = [
        f32p, ctypes.c_int, i32p, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, f32p]
    lib.esn_vertex_normals.argtypes = [
        f32p, ctypes.c_int, i32p, ctypes.c_int, f32p]
    lib.esn_point_cloud_distance.argtypes = [
        f32p, ctypes.c_int, f32p, ctypes.c_int, f32p]
    lib.esn_radius_outlier_mask.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float, u8p]
    lib.esn_nn_distance_excl_self.argtypes = [f32p, ctypes.c_int, f32p]
    lib.esn_rasterize_mesh.argtypes = [
        f32p, ctypes.c_int, f32p, i32p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, f32p, f32p]
    lib.esn_alias_table.argtypes = [f32p, ctypes.c_int, f32p, i32p]

    _lib = lib
    return lib
