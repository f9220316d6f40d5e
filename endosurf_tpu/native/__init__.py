"""ctypes bindings for the first-party C++ geometry kernels.

The shared library builds on first import (g++ -O3, cached next to the
source; rebuilt when geometry.cpp is newer than the cached .so).
"""

from endosurf_tpu.native.build import load_library  # noqa: F401
from endosurf_tpu.native.meshops import (  # noqa: F401
    alias_table,
    clean_mesh,
    laplacian_smooth,
    marching_tetrahedra,
    nn_distance_excl_self,
    point_cloud_distance,
    radius_outlier_mask,
    rasterize_mesh,
    vertex_normals,
)
