"""Round-7 additions: Unicode-normalized exact dedup and the ORC
round-trip path. The workload gates prove oracle equality end-to-end;
these tests pin the operator semantics on adversarial micro-inputs the
synthetic corpus cannot contain (NFD forms, Eszett, NULL text)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from lineage_store_database_management_system_spark.operators import dedup
from lineage_store_database_management_system_spark.sources.readers import read_table
from lineage_store_database_management_system_spark.sources.writers import write_table


def test_unicode_dedup_merges_nfc_nfd_case_ws(spark):
    rows = [
        (1, "Café Society"),  # NFC
        (2, "Café  Society "),  # NFD + whitespace noise
        (3, "CAFÉ SOCIETY"),  # upper
        (4, "Straße"),  # Eszett
        (5, "STRASSE"),  # NOT a dup: lower() keeps Eszett
        (6, None),  # NULL text gets its own group
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["keep_id"]: r["n_copies"]
        for r in dedup.exact_duplicates_unicode(df, "doc_id", "text").collect()
    }
    assert got == {1: 3, 4: 1, 5: 1, 6: 1}


def test_unicode_dedup_plan_is_map_then_hashagg(spark):
    """The normalization must stay a map-only Arrow stage feeding one
    hash aggregate — no join, no second shuffle, no raw-text shuffle
    (only the 64-bit digest and id reach the exchange)."""
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = dedup.exact_duplicates_unicode(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "BatchEvalPython" not in plan
    assert "Join" not in plan


def test_orc_roundtrip_preserves_values(spark):
    rows = [(i, f"s{i % 3}", float(i) * 1.5) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, grp string, v double")
    out = os.path.join(tempfile.mkdtemp(prefix="lss_orc_test_"), "t")
    write_table(df, out, fmt="orc", target_partitions=2)
    back = read_table(spark, out, fmt="orc")
    assert back.count() == 100
    a = sorted(df.collect())
    b = sorted(back.collect())
    assert a == b
    # schema fidelity, not just values
    assert dict(back.dtypes) == dict(df.dtypes)


def test_minhash_store_bucket_cap_star_links(spark, tmp_path):
    """With a tiny cap, hot store buckets must link batch docs to the
    bucket hub (min store id) only; recall ('batch doc has a stored
    near-dup, with a representative') is preserved while pair count
    drops from A x B to A per hot bucket."""
    from lineage_store_database_management_system_spark.operators import incremental

    base = "the quick brown fox jumps over the lazy dog again and again"
    store_docs = [(i, base + f" s{i % 2}") for i in range(2, 12, 2)]  # 5 even ids
    batch_docs = [(i, base + f" b{i % 2}") for i in range(1, 11, 2)]  # 5 odd ids
    sdf = spark.createDataFrame(store_docs, "doc_id long, text string")
    bdf = spark.createDataFrame(batch_docs, "doc_id long, text string")
    store = str(tmp_path / "bands")
    incremental.update_minhash_store(sdf, "doc_id", "text", store)

    exhaustive = incremental.minhash_candidates_against_store(
        bdf, "doc_id", "text", store, update_store=False
    ).collect()
    capped = incremental.minhash_candidates_against_store(
        bdf, "doc_id", "text", store, update_store=False, bucket_cap=1
    ).collect()

    ex_batch = {r["batch_id"] for r in exhaustive}
    cap_batch = {r["batch_id"] for r in capped}
    assert ex_batch == cap_batch  # same recall: every colliding batch doc surfaces
    assert len(capped) <= len(exhaustive)
    # every capped pair points at a real stored id
    stored_ids = {i for i, _ in store_docs}
    assert {r["store_id"] for r in capped} <= stored_ids
