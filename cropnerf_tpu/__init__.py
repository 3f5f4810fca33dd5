"""cropnerf_tpu: a TPU-native crop-counting NeRF framework.

From-scratch JAX/XLA/Pallas re-design of the capabilities of
robotic-vision-lab/CropNeRF (see README.md and SURVEY.md).
"""

__version__ = "0.1.0"

from .models.config import PRESETS, ModelConfig, TrainConfig  # noqa: F401
