"""Pure-jnp geometry core (layer L0)."""

from diffmvs_tpu.geometry.transforms import (  # noqa: F401
    disp_to_depth,
    depth_to_disp,
    depth_range_samples,
    compose_projection,
    invert_rigid_4x4,
    invert_rigid,
    invert_intrinsics,
    relative_projection,
)
from diffmvs_tpu.geometry.sampling import bilinear_sample  # noqa: F401
from diffmvs_tpu.geometry.warp import (  # noqa: F401
    plane_sweep_coords,
    plane_sweep_warp,
)
from diffmvs_tpu.geometry.upsample import upsample_with_mask  # noqa: F401
