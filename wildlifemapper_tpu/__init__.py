"""WildlifeMapper-TPU: a TPU-native (JAX/XLA/Pallas) aerial-wildlife
detection framework with the capabilities of lgemc/WildlifeMapper."""

__version__ = "0.1.0"

from .config import Config, ModelConfig, model_config  # noqa: F401
