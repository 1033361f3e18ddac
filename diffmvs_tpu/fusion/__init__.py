"""Point-cloud fusion (layer L6): on-device consistency filtering + PLY."""

from diffmvs_tpu.fusion.ply import write_ply  # noqa: F401
from diffmvs_tpu.fusion.fuse import (  # noqa: F401
    reproject_with_depth,
    check_geometric_consistency,
    filter_depth,
    filter_depth_dynamic,
)
from diffmvs_tpu.fusion.metrics import (  # noqa: F401
    accuracy_completeness,
    nn_distances,
)
