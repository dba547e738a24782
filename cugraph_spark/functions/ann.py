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


def lsh_band_keys(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = 8,
    band_bits: int = 8,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Banded sign-LSH keys: ``n_bands`` independent tables of
    ``band_bits`` hyperplane sign bits each — [id, bk] with one row per
    (vector, band), ``bk = band * 2^band_bits + bucket``. A pair is a
    candidate iff it matches in AT LEAST ONE band (exactly the
    MinHash banding shape, ``dedup.minhash_lsh_candidates``): collision
    probability 1 − (1 − p^r)^B for per-bit agreement p — steep around
    the similarity threshold, unlike a single wide table where raising
    bits craters recall and lowering bits makes buckets O(N/2^bits)
    self-join bombs."""
    if dim is None:
        head = df.select(vec_col).head(1)
        dim = len(head[0][0]) if head else 1
    planes = _hyperplanes(dim, n_bands * band_bits, seed)
    v = F.col(vec_col).cast("array<double>")
    keys = []
    for band in range(n_bands):
        bucket = F.lit(0).cast("long")
        for j in range(band_bits):
            plane = F.array(
                *[F.lit(float(x)) for x in planes[band * band_bits + j]]
            )
            bit = (_dot(v, plane) > 0).cast("long")
            bucket = bucket.bitwiseOR(F.shiftleft(bit, j))
        keys.append(
            (F.lit(band).cast("long") * F.lit(1 << band_bits) + bucket).alias("k")
        )
    return df.select(
        F.col(id_col).alias("id"), F.explode(F.array(*keys)).alias("bk")
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = 8,
    band_bits: int = 8,
    seed: int = 42,
    max_bucket_size: int | None = 100_000,
) -> DataFrame:
    """Approximate top-k: candidates restricted to vectors sharing ≥ 1
    LSH band bucket with the query (banded multi-table — recall rises
    with n_bands at fixed selectivity, vs the single-table trade-off).
    Oversized corpus buckets (> ``max_bucket_size``) are excluded: a
    bucket holding that many vectors carries ~0 discriminative signal
    and its candidates surface through the other bands. Same output
    schema as brute force; recall < 1 by construction."""
    from ..plans.lineage import truncate_plan

    dim = len(corpus.select(vec_col).first()[0])
    # the corpus key projection (n_bands*band_bits hyperplane dot
    # products over every corpus vector) feeds BOTH the bucket-size agg
    # and the candidate join — persist it so the full-corpus scan runs
    # once, and materialize the (bounded, k-per-query) result eagerly
    # while the cache is live (the dedup.py shingle-cache pattern)
    kb = lsh_band_keys(corpus, id_col, vec_col, n_bands, band_bits, dim, seed).persist()
    cb = kb
    if max_bucket_size is not None:
        sizes = cb.groupBy("bk").agg(F.count("*").alias("n"))
        cb = cb.join(
            F.broadcast(sizes.filter(F.col("n") > max_bucket_size).select("bk")),
            "bk", "left_anti",
        )
    qb = lsh_band_keys(queries, id_col, vec_col, n_bands, band_bits, dim, seed)
    cands = (
        cb.select("bk", F.col("id").alias("vec_id"))
        .join(F.broadcast(qb.select("bk", F.col("id").alias("query_id"))), "bk")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    # candidate-scoped verify: vectors re-joined per pair (the
    # dedup.ngram_jaccard_pairs shape — no vector payload rides
    # through the bucket join / distinct)
    cv = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    scored = (
        cands.join(F.broadcast(qv), "query_id")
        .join(cv, "vec_id")
        .select(
            "query_id", "vec_id",
            (_dot(F.col("qv"), F.col("cv"))
             / (_norm(F.col("qv")) * _norm(F.col("cv")))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    out = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    out = truncate_plan(out, eager=True)
    kb.unpersist()
    return out


def _assign_cells_blas(
    df: DataFrame, id_col: str, vec_col: str, cent_mat, cell_ids
) -> DataFrame:
    """Max-cosine cell per vector, one BLAS matmul per Arrow batch
    (``mapInPandas``): the k×d centroid matrix ships to every task as a
    closure (k ≤ ~4096 ⇒ a few MB), so assignment is a single scan —
    no crossJoin row explosion at large k. Ties break to the smallest
    cell id (centroid rows are pre-sorted by cell id, argmax takes the
    first maximum)."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    Cn = cent_mat / np.maximum(
        np.linalg.norm(cent_mat, axis=1, keepdims=True), 1e-300
    )
    cells = np.asarray(cell_ids, dtype=np.int64)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array([list(x) for x in pdf["_v"]], dtype=np.float64)
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
            best = np.argmax(Vn @ Cn.T, axis=1)
            yield pd.DataFrame(
                {"_id": pdf["_id"].to_numpy(), "ivf_cell": cells[best]}
            )

    ids = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    out = ids.mapInPandas(assign, schema="_id long, ivf_cell long")
    return out.withColumnRenamed("_id", id_col)


def ivf_assign(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int | None = 16,
    stride_seed: int = 1,
    hash_fn: str = "xxhash64",
    train_iters: int = 0,
    corpus_count: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantization: centroids init = the ``n_centroids``
    corpus vectors with the smallest seeded hash ``hash64(id, seed)`` —
    a deterministic uniform sample picked with ``orderBy(hash).limit``,
    which Spark plans as TakeOrderedAndProject (per-partition top-n +
    driver merge, NO single-partition global sort). Cell ids come from
    a window over the n_centroids-row centroid set only.

    ``n_centroids=None`` scales the codebook with the corpus:
    ~√N clamped to [16, 4096] — the bound that makes
    nprobe/n_centroids a real candidate fraction at any N (16 fixed
    cells at 10⁹ vectors means N/16-row cells — useless).
    ``train_iters > 0`` runs that many distributed Lloyd rounds:
    assignment is one BLAS matmul per Arrow batch against the broadcast
    k×d codebook (never a crossJoin), the update is one per-component
    avg aggregate (map-side combinable — only k×d floats ever reach the
    driver, the ``host_scalar_allreduce`` analog). Empty cells keep
    their previous centroid. Deterministic given (seed, corpus): the
    centroid UPDATE is bit-identical across runs and parallelism
    levels because the Lloyd sums accumulate as scaled longs
    (order-independent), not doubles whose partial-merge order varies.
    Cell ASSIGNMENT goes through a per-Arrow-batch BLAS matmul whose
    float rounding is not contractually batch-shape/BLAS-build stable,
    so a vector near-equidistant between two centroids could still
    flip cells under a different parallelism — ties that close are the
    residual (and only) nondeterminism.

    ``train_iters=0`` keeps the crossJoin-scored sample quantizer whose
    float path the DuckDB oracle replays value-exactly
    (``oracle_builders.ivf_top1_sql``; ``hash_fn='md5_60'`` switches to
    the ANSI-portable hash). Returns (assigned_df with 'ivf_cell',
    centroids_df [ivf_cell, cent])."""
    from .dedup import _hash64

    vecs = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    if n_centroids is None:
        n = corpus_count if corpus_count is not None else df.count()
        n_centroids = max(16, min(4096, int(n ** 0.5)))
    picked = (
        vecs.orderBy(_hash64(F.col(id_col), stride_seed, hash_fn), F.col(id_col))
        .limit(n_centroids)
    )
    cents = picked.select(
        F.row_number().over(Window.orderBy(id_col)).alias("ivf_cell"),
        F.col("v").alias("cent"),
    )
    if train_iters > 0:
        import numpy as np

        rows = sorted(cents.collect(), key=lambda r: r["ivf_cell"])
    if train_iters > 0 and rows:
        cell_ids = [r["ivf_cell"] for r in rows]
        C = np.array([list(r["cent"]) for r in rows], dtype=np.float64)
        dim = C.shape[1]
        # Lloyd update in FIXED-POINT: per-component sums accumulate as
        # scaled longs (integer addition is order-independent), so the
        # trained centroids — hence assignments — are bit-identical
        # across runs AND parallelism levels. A double F.avg would
        # drift by ulps with the partial-aggregate merge order (the
        # same hazard the modularity() comment documents), flipping
        # near-equidistant vectors between cells run-to-run. 2^20
        # quantization (≈1e-6 per component) is far below any coarse
        # quantizer's resolution; headroom: |x|·2^20·members/cell must
        # stay under 2^63 — 10^9-row cells of |x|≤1e3 components fit.
        scale = float(1 << 20)
        for _ in range(train_iters):
            assigned_it = _assign_cells_blas(df, id_col, vec_col, C, cell_ids)
            member_means = (
                vecs.join(assigned_it, id_col)
                .groupBy("ivf_cell")
                .agg(
                    F.count("*").alias("n"),
                    *[
                        F.sum(F.round(F.col("v")[i] * scale).cast("long")).alias(f"c{i}")
                        for i in range(dim)
                    ],
                )
                .collect()
            )
            Cn = C.copy()  # empty cells keep their previous centroid
            for r in member_means:
                Cn[cell_ids.index(r["ivf_cell"])] = [
                    r[f"c{i}"] / scale / r["n"] for i in range(dim)
                ]
            C = Cn
        assigned = df.join(_assign_cells_blas(df, id_col, vec_col, C, cell_ids), id_col)
        spark = df.sparkSession
        cents = spark.createDataFrame(
            [(int(c), [float(x) for x in C[i]]) for i, c in enumerate(cell_ids)],
            "ivf_cell int, cent array<double>",
        )
        return assigned, cents

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
    n_centroids: int | None = 16,
    nprobe: int = 4,
    hash_fn: str = "xxhash64",
    train_iters: int = 0,
) -> DataFrame:
    """IVF search: score queries against centroids, probe the nprobe
    best cells, exact cosine within the probed cells only. Pass
    ``n_centroids=None, train_iters=3`` for the scale configuration
    (√N trained codebook); the defaults keep the oracle-replayable
    sample quantizer."""
    assigned, cents = ivf_assign(corpus, id_col, vec_col, n_centroids,
                                 hash_fn=hash_fn, train_iters=train_iters)
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
    n_bands: int = 8,
    band_bits: int = 8,
    seed: int = 42,
    max_bucket_size: int | None = 10_000,
    hub_threshold: int = 1_024,
) -> DataFrame:
    """Near-dup pairs by cosine ≥ threshold, banded-LSH-blocked:
    candidates collide in ≥ 1 of ``n_bands`` sign-LSH tables of
    ``band_bits`` bits (the MinHash-banding shape — steep collision
    curve around the threshold), then a candidate-scoped exact cosine
    verifies. Returns [a, b, cosine].

    100 TB safety rails, in order:
    - banding replaces the round-2 single wide table whose 2^6-2^8
      buckets made the self-join O(N²/buckets);
    - buckets over ``max_bucket_size`` are dropped from candidate
      generation (a bucket that large carries ~0 signal; its true
      near-dups still collide in the other bands) — this BOUNDS the
      per-bucket pair fan-out at max_bucket_size²/2;
    - surviving large buckets (> ``hub_threshold``) route through the
      salted self-join (``plans/skew.py:salted_common_neighbor_join``)
      so one hot bucket spreads across tasks instead of one;
    - the verify is candidate-scoped: vectors join onto the DISTINCT
      pair list (no vector payload through the bucket join)."""
    from ..plans.lineage import truncate_plan
    from ..plans.skew import salted_common_neighbor_join

    dim = len(df.select(vec_col).first()[0])
    # the key projection (n_bands*band_bits hyperplane dot products over
    # every vector) is scanned by the bucket-size agg, both self-join
    # legs, and the hub detection inside the salted join — persist it so
    # the full-corpus projection runs once, materialize the (threshold-
    # bounded) result eagerly while the cache is live, then release
    # (the dedup.py shingle-cache pattern)
    kb = lsh_band_keys(df, id_col, vec_col, n_bands, band_bits, dim, seed).persist()
    keys = kb
    if max_bucket_size is not None:
        sizes = keys.groupBy("bk").agg(F.count("*").alias("n"))
        keys = keys.join(
            F.broadcast(sizes.filter(F.col("n") > max_bucket_size).select("bk")),
            "bk", "left_anti",
        )
    l = keys.select("bk", F.col("id").alias("a"))
    r = keys.select("bk", F.col("id").alias("b"))
    cands = (
        salted_common_neighbor_join(l, r, "bk", hub_threshold=hub_threshold)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    v = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    out = (
        cands.join(v.select(F.col(id_col).alias("a"), F.col("v").alias("va")), "a")
        .join(v.select(F.col(id_col).alias("b"), F.col("v").alias("vb")), "b")
        .select(
            "a", "b",
            (_dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    out = truncate_plan(out, eager=True)
    kb.unpersist()
    return out
