"""Downstream models (L4): hyperbolic losses, two-tower multimodal, encoders."""

from hyptokenizer_tpu.models.losses import (  # noqa: F401
    HyperbolicInfoNCE,
    hyperbolic_contrastive_loss,
    hyperbolic_triplet_loss,
    recall_at_k,
)
from hyptokenizer_tpu.models.multimodal import (  # noqa: F401
    MultimodalHyperbolicModel,
    TransformerTower,
    ViTTower,
)
