from .config import EncoderConfig, MultimodalConfig
from .encoder import TextEncoder
from .heads import (
    ClassificationHead, PairwiseHead, HeatmapHead, PointerHead)
