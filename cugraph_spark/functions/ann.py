"""Similarity search over an embedding column (``array<float>``).

Brute-force cosine top-k as the exact baseline; LSH (random hyperplane)
bucketing and an IVF (inverted-file, coarse-quantizer) variant as the
scale paths. Dot products run through ``zip_with`` + ``aggregate``
higher-order SQL functions — JVM-side, no Python in the hot loop; the
IVF/LSH variants bound the candidate set so the join never goes
all-pairs at 100 TB.

Scale notes: brute force is O(|Q|·|C|) — correct but only for oracles
and small |Q|; IVF probes ``nprobe`` of ``n_centroids`` partitions
(candidate fraction ≈ nprobe/n_centroids); hyperplane LSH joins on
exact bucket key. Centroids/planes are deterministic functions of the
corpus (seeded) so results are reproducible across cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    max_queries: int = 65_536,
) -> DataFrame:
    """Exact top-k by cosine: [query_id, vec_id, cosine, rank].

    The query matrix (assumed small — it is collected and shipped to
    every task) scores against corpus batches as one BLAS matmul per
    Arrow batch inside ``mapInPandas`` (~100× the interpreted
    higher-order-function path), each batch emitting its local top-k
    per query; a final window merges the partials. Self-matches (same
    id) are excluded when query ids share the corpus id space.

    This is the exact/oracle path: the query side MUST be small —
    ``max_queries`` guards the driver collect. For large query sets
    use ``cosine_topk_ivf`` / ``cosine_topk_lsh``, and for corpus
    self-dedup use ``embedding_near_duplicates`` (LSH-blocked)."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    qid = query_id_col or id_col
    qrows = queries.select(qid, vec_col).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"cosine_topk_bruteforce collects the query side to the driver; "
            f"got > max_queries={max_queries} queries — use cosine_topk_ivf/"
            f"cosine_topk_lsh or embedding_near_duplicates instead"
        )
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)

    kk = k + 1  # +1 so a self-match can be dropped and k remain

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.array([list(v) for v in pdf["cv"]], dtype=np.float64)
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
            S = Cn @ Qn.T  # (batch, m)
            m = S.shape[1]
            take = min(kk, S.shape[0])
            # per query: local top-`take` corpus rows in this batch
            idx = np.argpartition(-S, take - 1, axis=0)[:take]  # (take, m)
            out_q = np.repeat(qids, take)
            flat = idx.T.reshape(-1)  # query-major
            out_v = ids[flat]
            out_s = S[flat, np.repeat(np.arange(m), take)]
            yield pd.DataFrame(
                {"query_id": out_q, "vec_id": out_v, "cosine": out_s}
            )

    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    partial = c.mapInPandas(
        score, schema="query_id long, vec_id long, cosine double"
    )
    if query_id_col is None:
        # only drop self-matches when query ids ARE corpus ids; a
        # separate query id space can legitimately collide numerically
        # with a corpus id whose vector is a true nearest neighbor
        partial = partial.filter(F.col("vec_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return partial.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _hyperplanes(dim: int, n_planes: int, seed: int):
    """Deterministic pseudo-random hyperplanes as literal arrays —
    component p[i][j] = signed hash of (seed, i, j), unit-free (sign
    test only needs direction)."""
    import numpy as np

    def sm64(x):
        x = (x + 0x9E3779B97F4A7C15) & (2**64 - 1)
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & (2**64 - 1)
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & (2**64 - 1)
        return x ^ (x >> 31)

    planes = np.empty((n_planes, dim))
    for i in range(n_planes):
        for j in range(dim):
            planes[i, j] = (sm64(seed + i * 100003 + j) / 2**64) * 2.0 - 1.0
    return planes


def lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "lsh_bucket",
    n_planes: int = 8,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane (sign) LSH bucket id per vector: bit i = sign
    of ⟨v, plane_i⟩. Planes are deterministic literals compiled into
    the expression (broadcast-free, JVM-side)."""
    if dim is None:
        head = df.select(vec_col).head(1)
        # empty input: every downstream result is empty, any dim works
        dim = len(head[0][0]) if head else 1
    planes = _hyperplanes(dim, n_planes, seed)
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = (_dot(v, plane) > 0).cast("long")
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return df.withColumn(out_col, bucket)


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket (collision probability rises with cosine similarity).
    Same output schema as brute force; recall < 1 by construction."""
    dim = len(corpus.select(vec_col).first()[0])
    cb = lsh_bucket(corpus, vec_col, "b", n_planes, dim, seed).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("cv"), "b"
    )
    qb = lsh_bucket(queries, vec_col, "b", n_planes, dim, seed).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv"), "b"
    )
    scored = (
        cb.join(F.broadcast(qb), "b")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            (_dot(F.col("qv"), F.col("cv"))
             / (_norm(F.col("qv")) * _norm(F.col("cv")))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_assign(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    stride_seed: int = 1,
    hash_fn: str = "xxhash64",
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantization: centroids = the ``n_centroids`` corpus
    vectors with the smallest seeded hash ``hash64(id, seed)`` — a
    deterministic uniform sample picked with ``orderBy(hash).limit(n)``,
    which Spark plans as TakeOrderedAndProject (per-partition top-n +
    driver merge, NO single-partition global sort — the round-1
    ``Window.orderBy`` version shuffled the whole corpus through one
    task). Cell ids come from a window over the n_centroids-row
    centroid set only. Every vector is assigned to its max-cosine
    centroid via a broadcast join. Returns (assigned_df with
    'ivf_cell', centroids_df). ``hash_fn="md5_60"`` switches the
    centroid pick to the ANSI-SQL-portable hash (dedup._hash64) so the
    DuckDB oracle gate can replay the full pipeline value-exactly."""
    from .dedup import _hash64

    vecs = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    picked = (
        vecs.orderBy(_hash64(F.col(id_col), stride_seed, hash_fn), F.col(id_col))
        .limit(n_centroids)
    )
    cents = picked.select(
        F.row_number().over(Window.orderBy(id_col)).alias("ivf_cell"),
        F.col("v").alias("cent"),
    )
    scored = (
        vecs.crossJoin(F.broadcast(cents))
        .select(
            id_col, "v", "ivf_cell",
            (_dot(F.col("v"), F.col("cent")) / (_norm(F.col("v")) * _norm(F.col("cent")))).alias("cs"),
        )
    )
    best = scored.groupBy(id_col).agg(
        F.max(F.struct(F.col("cs"), (-F.col("ivf_cell")).alias("nc"))).alias("m")
    ).select(F.col(id_col), (-F.col("m.nc")).alias("ivf_cell"))
    assigned = df.join(best, id_col)
    return assigned, cents


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """IVF search: score queries against centroids, probe the nprobe
    best cells, exact cosine within the probed cells only."""
    assigned, cents = ivf_assign(corpus, id_col, vec_col, n_centroids,
                                 hash_fn=hash_fn)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    qc = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "query_id", "qv", "ivf_cell",
            (_dot(F.col("qv"), F.col("cent")) / (_norm(F.col("qv")) * _norm(F.col("cent")))).alias("cs"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("ivf_cell"))
    probes = qc.withColumn("pr", F.row_number().over(wq)).filter(F.col("pr") <= nprobe).select(
        "query_id", "qv", "ivf_cell"
    )
    c = assigned.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("cv"), "ivf_cell"
    )
    scored = (
        c.join(F.broadcast(probes), "ivf_cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            (_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs by cosine ≥ threshold, LSH-blocked: pairs must
    collide in the sign-LSH bucket (high-cosine pairs almost always
    do), then exact cosine verifies. Returns [a, b, cosine]."""
    dim = len(df.select(vec_col).first()[0])
    b = lsh_bucket(df, vec_col, "b", n_planes, dim, seed).select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"), "b"
    )
    l = b.select(F.col("b"), F.col("id").alias("a"), F.col("v").alias("va"))
    r = b.select(F.col("b"), F.col("id").alias("bid"), F.col("v").alias("vb"))
    return (
        l.join(r, "b")
        .filter(F.col("a") < F.col("bid"))
        .select(
            "a", F.col("bid").alias("b"),
            (_dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
