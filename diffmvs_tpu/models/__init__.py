"""Model orchestration (layer L3)."""

from diffmvs_tpu.models.schedule import DiffusionSchedule, cosine_beta_schedule  # noqa: F401
from diffmvs_tpu.models.casdiffmvs import CasDiffMVS  # noqa: F401
from diffmvs_tpu.models.loss import compute_inverse_loss  # noqa: F401
