"""spark-submit --py-files packaging: the zip must be importable as
the sole source of ``cugraph_spark`` (what executors see) and
byte-deterministic (so deploy tooling can cache by digest)."""

import hashlib
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def _build(tmp_path, name):
    out = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "make_pyfiles.py"), str(tmp_path / name)],
        capture_output=True,
        text=True,
        check=True,
    )
    return Path(out.stdout.strip())


def test_zip_importable_standalone(tmp_path):
    zip_path = _build(tmp_path, "d1")
    # Fresh interpreter, zip as the ONLY path entry that can provide the
    # package — mimics an executor that received it via --py-files.
    probe = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import cugraph_spark, cugraph_spark.graph, cugraph_spark.queries, "
        "cugraph_spark.operators.pagerank, cugraph_spark.plans.skew; "
        "print(cugraph_spark.graph.__file__)"
    )
    res = subprocess.run(
        [sys.executable, "-c", probe, str(zip_path)],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo root: no fallback to the source tree
        check=True,
    )
    assert str(zip_path) in res.stdout


def test_zip_deterministic(tmp_path):
    h1 = hashlib.sha256(_build(tmp_path, "d1").read_bytes()).hexdigest()
    h2 = hashlib.sha256(_build(tmp_path, "d2").read_bytes()).hexdigest()
    assert h1 == h2


def test_submit_job_wcc_local_smoke(tmp_path, spark):
    """submit_job.py end-to-end on the derived purchase graph: the
    north-rule deployment entry for the non-PageRank algorithms (WCC
    here) writes a (vertex, labels) parquet."""
    import tools.submit_job as sj

    out = tmp_path / "wcc_out"
    argv = [
        "submit_job.py", "--algo", "wcc",
        "--edges", "/root/testdata/sf0.001/lineitem.parquet",
        "--derive-cs", "--out", str(out),
    ]
    old = sys.argv
    sys.argv = argv
    try:
        sj.main()
    finally:
        sys.argv = old
    got = spark.read.parquet(str(out))
    assert set(got.columns) == {"vertex", "labels"}
    assert got.count() > 0


def test_submit_job_resume_requires_checkpoint():
    import tools.submit_job as sj

    old = sys.argv
    sys.argv = ["submit_job.py", "--algo", "wcc", "--edges", "x",
                "--out", "y", "--resume"]
    try:
        import pytest as _pt

        with _pt.raises(SystemExit):
            sj.main()
    finally:
        sys.argv = old
