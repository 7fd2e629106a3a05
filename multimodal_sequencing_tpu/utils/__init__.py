from .metrics import METRICS, compute_metrics, multiref_metrics, make_same_len
from .topo import Graph, topological_sort
from .mst import mst, mst_one_out_root
from .heatmap import render_order_heatmap, heatmap2order
from .permutation import (
    permutation_rank,
    permutation_unrank,
    build_permutation_label_maps,
)
