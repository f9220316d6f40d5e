from endosurf_tpu.ops.encoding import freq_encode, freq_encode_dim  # noqa: F401
from endosurf_tpu.ops.geometry import (  # noqa: F401
    ray_sphere_intersection,
    rays_from_pixels,
)
from endosurf_tpu.ops.pdf import inverse_cdf_sample, sample_pdf  # noqa: F401
from endosurf_tpu.ops.neus import (  # noqa: F401
    exclusive_cumprod_weights,
    neus_alpha,
    upsample_weights_from_sdf,
)
