"""Join-strategy planner for the superstep gather-scatter.

The per-superstep SpMV join (O(E) edges ⋈ O(V) vertex state) is the
engine's hot path. Spark's default picks sort-merge once the state side
exceeds the broadcast threshold — which re-sorts the edge side every
superstep. Neither is right for an iterative engine:

- **small V** → broadcast the vertex state (the analog of cuGraph's
  ``update_edge_src_property`` NCCL broadcast along the 2D grid,
  SURVEY.md §2.4): zero edge movement, zero sort.
- **large V** → shuffle-hash join with the hash table built on the
  vertex side: the persisted hash-partitioned edge side is neither
  re-shuffled nor sorted; only the O(V) state moves.

Measured on RMAT scale-20 (16.7M edges, local[8]): sort-merge
0.72M edges/s/superstep, shuffle-hash 1.60M, broadcast 3.47M.

``BROADCAST_VERTEX_LIMIT`` (default 4M rows ≈ 64MB of (long,double))
is the cutover; on a real cluster tune to executor memory. Callers
pass the known vertex count — no extra count job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BROADCAST_VERTEX_LIMIT = 4_000_000


def vertex_join_side(state: DataFrame, n_vertices: int | None,
                     limit: int = BROADCAST_VERTEX_LIMIT) -> DataFrame:
    """Wrap the O(V) side of an edges⋈state join with the right
    strategy hint for its size."""
    if n_vertices is not None and n_vertices <= limit:
        return F.broadcast(state)
    return state.hint("shuffle_hash")
