from .config import LLPConfig, SGAEConfig, TrainConfig
from .logging import JsonlLogger

__all__ = ["TrainConfig", "LLPConfig", "SGAEConfig", "JsonlLogger"]
