"""Package ``cugraph_spark`` for ``spark-submit --py-files``.

The north rule runs the engine on a real multi-executor cluster via
``spark-submit --py-files``; this builds the deployable zip (pure
python — the package ships no native code, so one zip serves every
executor platform).  Mirrors the reference's wheel/conda packaging
role (``/root/reference/python/cugraph/setup.py``) for a Spark
deployment instead of a CUDA site-packages install.

Usage::

    python tools/make_pyfiles.py [out_dir]        # default: dist/
    spark-submit --py-files dist/cugraph_spark.zip tools/submit_pagerank.py \
        --edges s3://bucket/edges/ --out s3://bucket/ranks/

The zip places package modules under ``cugraph_spark/...`` at the
archive root, which is what PySpark prepends to ``sys.path`` on both
driver and executors.  Deterministic: fixed timestamps, sorted member
order — re-running on an unchanged tree produces a byte-identical
archive (so cluster deploy tooling can cache by digest).
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
PKG = "cugraph_spark"
# Fixed timestamp (2020-01-01) keeps the archive byte-stable across runs.
_EPOCH = (2020, 1, 1, 0, 0, 0)


def build_zip(out_dir: Path | None = None) -> Path:
    out_dir = Path(out_dir) if out_dir else ROOT / "dist"
    out_dir.mkdir(parents=True, exist_ok=True)
    out = out_dir / f"{PKG}.zip"
    members = sorted(
        p
        for p in (ROOT / PKG).rglob("*.py")
        if "__pycache__" not in p.parts
    )
    with zipfile.ZipFile(out, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        for path in members:
            info = zipfile.ZipInfo(
                str(path.relative_to(ROOT)), date_time=_EPOCH
            )
            info.compress_type = zipfile.ZIP_DEFLATED
            # 0o644 regular file; keeps the archive umask-independent.
            info.external_attr = 0o100644 << 16
            zf.writestr(info, path.read_bytes())
    return out


if __name__ == "__main__":
    target = build_zip(Path(sys.argv[1]) if len(sys.argv) > 1 else None)
    print(target)
