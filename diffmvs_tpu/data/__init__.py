"""Datasets + codecs (layer L4)."""

from diffmvs_tpu.data.io import (  # noqa: F401
    read_pfm,
    save_pfm,
    read_cam_file,
    write_cam,
    read_camera_parameters,
    read_pair_file,
    save_mask,
    read_img,
)
from diffmvs_tpu.data.registry import find_dataset_def  # noqa: F401
