from .pagerank import FailedToConvergeError, pagerank  # noqa: F401
from .wcc import weakly_connected_components  # noqa: F401
from .label_propagation import label_propagation  # noqa: F401
from .triangle_count import edge_triangle_count, triangle_count  # noqa: F401
from .centrality import (  # noqa: F401
    degree_centrality,
    eigenvector_centrality,
    hits,
    katz_centrality,
)
from .traversal import bfs, k_hop_neighbors, sssp  # noqa: F401
from .cores import core_number, k_core  # noqa: F401
from .similarity import jaccard, overlap, sorensen  # noqa: F401
