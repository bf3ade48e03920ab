"""poseidon_tpu — a TPU-native JAX/Flax/Pallas rebuild of Poseidon (scOT),
the SwinV2-style hierarchical vision-transformer neural operator for PDEs.

Reference capability target: camlab-ethz/poseidon (mounted read-only at
/root/reference). This is a from-scratch TPU-first design, not a port.
"""

from .config import MODEL_MAP, ScOTConfig, make_config
from .models.scot import (ScOT, apply_pixel_mask,
                          forward_with_intermediates, scot_loss)

__version__ = "0.1.0"

__all__ = [
    "MODEL_MAP",
    "ScOTConfig",
    "make_config",
    "ScOT",
    "apply_pixel_mask",
    "forward_with_intermediates",
    "scot_loss",
]
