"""Cluster entry point for ALL four north-rule algorithms:
``spark-submit --py-files dist/cugraph_spark.zip`` running PageRank,
WCC, label propagation, or triangle count over an edge table.

Same deployment shape as ``submit_pagerank.py`` (which remains the
PageRank-specific entry with its full knob surface); this one covers
the whole algorithm family with the shared knobs::

    spark-submit --master yarn --deploy-mode cluster \
        --num-executors 400 --executor-cores 8 \
        --py-files dist/cugraph_spark.zip \
        tools/submit_job.py --algo wcc \
        --edges s3://lake/link_graph/edges \
        --out   s3://lake/link_graph/components \
        --checkpoint s3://lake/link_graph/_ckpt/wcc_run7

Local smoke (same code path, no cluster)::

    python tools/submit_job.py --algo tc \
        --edges /root/testdata/sf0.001/lineitem.parquet --derive-cs \
        --out /tmp/tc_smoke

The undirected algorithms (wcc / lpa / tc) symmetrize the input unless
``--assume-symmetric`` declares it is already the symmetrized stored
layout (e.g. a bucketed table written from ``Graph.edges``; see the
contract note in ``graph.py`` — every vertex must appear as dst).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

try:  # local smoke run from a source checkout (no --py-files zip on sys.path)
    import cugraph_spark  # noqa: F401
except ModuleNotFoundError:
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--algo", required=True,
                    choices=["pagerank", "wcc", "lpa", "tc"])
    ap.add_argument("--edges", required=True,
                    help="parquet/Iceberg edge table (src,dst[,weight]) "
                         "or lineitem path with --derive-cs")
    ap.add_argument("--out", required=True, help="output parquet path")
    ap.add_argument("--derive-cs", action="store_true",
                    help="input is a TPC-H lineitem table; derive the "
                         "customer-supplier purchase graph")
    ap.add_argument("--assume-symmetric", action="store_true",
                    help="undirected algos: input is already the "
                         "symmetrized stored layout (skips the union-"
                         "reverse; every vertex must appear as dst)")
    ap.add_argument("--max-iter", type=int, default=100)
    ap.add_argument("--checkpoint", default=None,
                    help="superstep checkpoint dir (exact resume mid-run; "
                         "pagerank/wcc/lpa)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest committed superstep "
                         "under --checkpoint")
    args = ap.parse_args()
    if args.resume and args.checkpoint is None:
        ap.error("--resume requires --checkpoint")

    from cugraph_spark.session import get_spark
    from cugraph_spark.graph import Graph

    spark = get_spark(app_name=f"cugraph_spark.{args.algo}")
    if args.derive_cs:
        from cugraph_spark.queries import edges_cs

        edges = edges_cs(spark, args.edges.rsplit("/", 1)[0])
    else:
        edges = spark.read.parquet(args.edges)

    ckpt = None
    if args.checkpoint:
        from cugraph_spark.plans.checkpoint import CheckpointManager

        ckpt = CheckpointManager(args.checkpoint, args.algo)

    weighted = "weight" in edges.columns
    if args.algo == "pagerank":
        from cugraph_spark.operators.pagerank import pagerank

        g = Graph(edges, directed=True, weighted=weighted)
        out = pagerank(g, max_iter=args.max_iter,
                       checkpoint=ckpt, resume=args.resume)
    else:
        g = Graph(edges, directed=False, weighted=weighted,
                  assume_symmetric=args.assume_symmetric)
        if args.algo == "wcc":
            from cugraph_spark.operators.wcc import (
                weakly_connected_components,
            )

            out = weakly_connected_components(
                g, max_iter=args.max_iter,
                checkpoint=ckpt, resume=args.resume,
            )
        elif args.algo == "lpa":
            from cugraph_spark.operators.label_propagation import (
                label_propagation,
            )

            out = label_propagation(
                g, max_iter=args.max_iter,
                checkpoint=ckpt, resume=args.resume,
            )
        else:  # tc
            from cugraph_spark.operators.triangle_count import triangle_count

            out = triangle_count(g)

    out.write.mode("overwrite").parquet(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
