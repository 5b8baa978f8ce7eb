"""Dump .explain('formatted') for every headline bench query to
plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<suffix>.txt (optimization-round
evidence; the round dir defaults to r14 for artifact continuity).

Usage: python tools/plan_dump.py <suffix> [names...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (headline list + overrides live there)
from lineage_store_database_management_system_spark import (  # noqa: E402
    get_spark,
    workloads,
)


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        app_name="plan_dump", cpus=cpus, shuffle_partitions=cpus,
        extra_conf={"spark.sql.adaptive.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # mirror bench.py's prepared-index override for the retrieval query
    import tempfile

    from lineage_store_database_management_system_spark.operators import textsearch

    _bm25_idx: dict[str, str] = {}

    def _prep_bm25(spark, sf_dir):
        if sf_dir not in _bm25_idx:
            idx = os.path.join(tempfile.mkdtemp(prefix="plan_bm25_"), "bm25")
            docs = spark.read.parquet(
                os.path.join(sf_dir, "documents.parquet")
            ).select("doc_id", "text")
            textsearch.write_bm25_index(docs, idx)
            _bm25_idx[sf_dir] = idx

    def _bench_bm25(spark, sf_dir):
        return textsearch.bm25_topk_from_index(
            spark, _bm25_idx[sf_dir], ["join", "filter", "merge"], k=20
        )

    def _bench_minhash(spark, sf_dir):
        from lineage_store_database_management_system_spark.operators import dedup

        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        return dedup.minhash_lsh_candidates(docs, "doc_id", "text")

    overrides = {
        "ds_minhash_lsh_candidates": _bench_minhash,
        "ds_bm25_index_topk": _bench_bm25,
    }
    prepare = {"ds_bm25_index_topk": _prep_bm25}

    names = [n for n in bench.HEADLINE if not only or n in only]
    for name in names:
        fn = overrides.get(name, workloads.QUERIES[name])
        if name in prepare:
            prepare[name](spark, sf_dir)
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
