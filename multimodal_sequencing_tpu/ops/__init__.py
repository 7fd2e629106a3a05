from .attention import multihead_attention, flash_attention
from .order_decode import (
    pairs_to_heatmap, topological_decode_batch, greedy_order_decode,
    exhaustive_order_decode)
