"""medmamba_tpu: TPU-native (JAX/XLA/Pallas/pjit) MedMamba framework."""

__version__ = "0.1.0"

from medmamba_tpu.models.registry import (  # noqa: F401
    MODEL_CONFIGS, create_model, medmamba_b, medmamba_s, medmamba_t,
    medmamba_te)
from medmamba_tpu.models.vssm import VSSM  # noqa: F401
from medmamba_tpu.ops.selective_scan import selective_scan  # noqa: F401
