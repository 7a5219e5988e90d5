"""Flax model zoo."""

from simplerecon_tpu.models.cost_volume import (DotProductCostVolume,
                                                MLPFeatureVolume,
                                                make_cost_volume)
from simplerecon_tpu.models.decoders import CVEncoder, DepthDecoderPP
from simplerecon_tpu.models.depth_model import DepthModel, build_depth_model
from simplerecon_tpu.models.efficientnet import EfficientNetV2Features
from simplerecon_tpu.models.matching_encoder import ResnetMatchingEncoder

__all__ = [
    "DepthModel", "build_depth_model", "DotProductCostVolume",
    "MLPFeatureVolume", "make_cost_volume", "CVEncoder", "DepthDecoderPP",
    "EfficientNetV2Features", "ResnetMatchingEncoder",
]
