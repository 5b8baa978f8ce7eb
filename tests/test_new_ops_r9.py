"""Round-9 additions: PNG codec through the multimodal seam."""

import struct
import zlib

import numpy as np
import pytest

from lineage_store_database_management_system_spark.operators import multimodal as mm


@pytest.mark.parametrize("color_type,nch", [(2, 3), (6, 4), (0, 1)])
@pytest.mark.parametrize("filter_seed", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(color_type, nch, filter_seed):
    rng = np.random.RandomState(color_type * 10 + filter_seed)
    w, h = 11, 9
    src = rng.randint(0, 256, size=w * h * nch, dtype=np.uint8).tobytes()
    png = mm.encode_png(w, h, src, color_type=color_type, filter_seed=filter_seed)
    W, H, C, rgb = mm._decode_png(png)
    assert (W, H, C) == (w, h, 3)
    a = np.frombuffer(src, np.uint8).reshape(h, w, nch)
    if color_type == 2:
        want = a
    elif color_type == 6:
        want = a[:, :, :3]
    else:
        want = np.repeat(a, 3, axis=2)
    got = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
    assert (got == want).all()


def test_png_dispatch_and_stub_contract():
    # JPEG magic dispatches to the NATIVE decoder since r11 (no more
    # PIL/cv2 stub): a garbage marker stream fails inside it with the
    # decoder's own contract error
    with pytest.raises(NotImplementedError, match="JPEG marker stream"):
        mm._decode_payload(b"\xff\xd8\xff\xe0" + b"\x00" * 40)
    # PNG magic dispatches to the native decoder
    src = bytes(range(2 * 2 * 3)) * 2  # 2x4 RGB
    png = mm.encode_png(2, 4, src, color_type=2)
    assert mm._decode_payload(png)[:3] == (2, 4, 3)


def _chunk(t, d):
    crc = zlib.crc32(t + d) & 0xFFFFFFFF
    return struct.pack(">I", len(d)) + t + d + struct.pack(">I", crc)


def test_png_unsupported_shapes_keep_stub():
    # interlaced
    bad = (
        mm._PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 14))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="interlaced"):
        mm._decode_png(bad)
    # 16-bit
    bad16 = (
        mm._PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 26))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="8-bit"):
        mm._decode_png(bad16)
    # palette
    badp = (
        mm._PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 6))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="palette"):
        mm._decode_png(badp)
    # truncated IDAT
    with pytest.raises(NotImplementedError):
        mm._decode_png(
            mm._PNG_SIG
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 5))
            + _chunk(b"IEND", b"")
        )


def test_planted_png_corpus_decodes(spark):
    docs = spark.range(0, 40).selectExpr("id AS doc_id")
    imgs = mm.plant_test_images_png(docs, "doc_id")
    stats = mm.decode_image_stats(imgs, "doc_id").collect()
    assert len(stats) == 40
    for r in stats:
        rid = r["doc_id"]
        w, h = 4 + rid % 13, 3 + rid % 7
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        nch = 3 if rid % 2 == 0 else 4
        k = np.arange(w * h * nch, dtype=np.int64)
        v = (rid * 31 + k) % 256
        if nch == 4:
            keep = k % 4 != 3
            v = v[keep]
        assert r["n_pixel_bytes"] == w * h * 3
        assert abs(r["mean_byte"] - v.mean()) < 1e-9
        assert r["wsum"] == int(((np.arange(len(v)) + 1) * v).sum())


def test_point_lookup_dispatch(spark, tmp_db):
    """Index-aware dispatch: fresh index -> indexed plan (rid-pruned
    scans); stale index (commit budget 0) -> plain pushdown fallback;
    key column -> key-range file skipping. All three agree on rows."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from lineage_store_database_management_system_spark import indexing
    from lineage_store_database_management_system_spark.plans.explain import explain_str

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("grp", T.LongType()),
            T.StructField("v", T.LongType()),
        ]
    )
    t = tmp_db.create_table_typed("disp", schema, "k")
    for i in range(4):
        t.ingest_dataframe(
            spark.range(i * 500, (i + 1) * 500).select(
                F.col("id").alias("k"),
                (F.col("id") % 97).alias("grp"),
                (F.col("id") * 3).alias("v"),
            )
        )
    indexing.build_secondary_index(t, "grp", n_buckets=8)
    t.bulk_update(
        spark.range(0, 50).select(F.col("id").alias("k"), F.lit(7).alias("grp"))
    )
    want = sorted(
        (r["k"], r["grp"]) for r in t.current_view().where(F.col("grp") == 7).collect()
    )
    # fresh-enough index -> indexed plan: rid predicate visible
    df = t.point_lookup("grp", 7)
    plan = explain_str(df)
    assert "_rid" in plan, "dispatch did not route through the index"
    got = sorted((r["k"], r["grp"]) for r in df.select("k", "grp").collect())
    assert got == want
    # stale budget 0 with post-build commits -> plain fallback
    df2 = t.point_lookup("grp", 7, max_stale_commits=0)
    plan2 = explain_str(df2)
    assert "In(_rid" not in plan2
    got2 = sorted((r["k"], r["grp"]) for r in df2.select("k", "grp").collect())
    assert got2 == want
    # key column -> manifest file skipping (subset of files opened)
    df3 = t.point_lookup("k", 750)
    assert len(df3.inputFiles()) < len(t.current_view().inputFiles())
    assert [r["k"] for r in df3.select("k").collect()] == [750]


def test_agg_mv_exact_after_vacuum_history(spark, tmp_db):
    """Regression for the round-9 wear-soak catch: a rid whose last
    pre-refresh delta (a GROUP flip) was removed by vacuum_tail made
    the incremental MV refresh reconstruct its old state from BASE
    values — decrementing the wrong group. The refresh must now fold
    old/new states snapshot-forward (per-version tps recorded at
    compact time) and stay both exact AND incremental."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("grp", T.StringType()),
            T.StructField("val", T.LongType()),
        ]
    )
    db = tmp_db
    t = db.create_table_typed("mvv", schema, "k")
    t.ingest_dataframe(
        spark.range(0, 300).select(
            F.col("id").alias("k"),
            F.concat(F.lit("g"), (F.col("id") % 3)).alias("grp"),
            (F.col("id") * 2).alias("val"),
        )
    )
    db.create_aggregate_mv("mv_g", "mvv", ["grp"], {"sum_val": "val"})

    def check(tag):
        got = {
            r["grp"]: (r["n"], r["sum_val"])
            for r in db.materialized_view("mv_g").collect()
        }
        want = {
            r["grp"]: (r["n"], r["sum_val"])
            for r in t.current_view()
            .groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("sum_val"))
            .collect()
        }
        assert got == want, f"{tag}: MV {got} != direct {want}"

    # round 1: group flip on a slice, compact, refresh, vacuum
    t.bulk_update(
        spark.range(0, 30).select(F.col("id").alias("k"), F.lit("g9").alias("grp"))
    )
    t.compact()
    assert db.refresh_aggregate_mv("mv_g") == "incremental"
    check("post-flip")
    t.vacuum_tail()  # the flip deltas are now gone from raw history
    # round 2: touch the SAME rids again (value-only update)
    t.bulk_update(
        spark.range(0, 30).select(F.col("id").alias("k"), F.lit(7).alias("val"))
    )
    t.compact()
    mode = db.refresh_aggregate_mv("mv_g")
    assert mode == "incremental", mode  # snapshot-forward, not rebuild
    check("post-vacuum-retouch")
    # round 3: another flip + delete cycle after a second vacuum
    t.vacuum_tail()
    t.bulk_update(
        spark.range(10, 40).select(F.col("id").alias("k"), F.lit("g0").alias("grp"))
    )
    t.bulk_delete(spark.range(0, 5).select(F.col("id").alias("k")))
    t.compact()
    assert db.refresh_aggregate_mv("mv_g") == "incremental"
    check("post-second-vacuum")


def test_changes_between_file_skipping(spark, tmp_db):
    """CDC resume reads must open only files intersecting the resume
    window (manifest-log seq/rid skipping), and the feed content is
    unchanged."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.LongType())]
    )
    t = tmp_db.create_table_typed("cdc", schema, "k")
    for i in range(5):
        t.ingest_dataframe(
            spark.range(i * 100, (i + 1) * 100).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            )
        )
        t.bulk_update(
            spark.range(i * 100, i * 100 + 10).select(
                F.col("id").alias("k"), F.lit(i).alias("v")
            )
        )
    wm_mid = None
    # take a watermark between commits: replay history to find one
    seqs = sorted(r["_seq"] for r in t.tail_df().select("_seq").collect())
    wm_mid = seqs[len(seqs) // 2]
    feed = t.changes_between(wm_mid)
    all_files = len(t.tail_df().inputFiles()) + len(t.base_df().inputFiles())
    opened = len(feed.inputFiles())
    assert opened < all_files, (opened, all_files)
    # content identical to an unpruned computation
    want = (
        t.tail_df().where(F.col("_seq") > wm_mid).count()
        + t.base_df().where(F.col("_rid") > wm_mid).count()
    )
    assert feed.count() == want


def test_canonicalize_urls_edge_cases(spark):
    from lineage_store_database_management_system_spark.operators import textops

    cases = [
        # (messy, expected canonical)
        ("https://www.Site.COM/A/b/?utm_source=x&utm_medium=y",
         "https://site.com/A/b"),                       # path case preserved
        ("HTTP://HOST.ORG/p?page=2&utm_campaign=z#frag",
         "http://host.org/p?page=2"),                   # real param survives
        ("https://host.org/p?utm_a=1&keep=2&gclid=3",
         "https://host.org/p?keep=2"),                  # mid-list strips
        ("https://host.org/p/", "https://host.org/p"),  # trailing slash
        ("https://host.org/", "https://host.org"),
        ("no-scheme/path/?fbclid=abc", "no-scheme/path"),
        ("https://www.h.io/p?ref=feed&x=1#a#b", "https://h.io/p?x=1"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)], "i long, url string")
    got = {
        r["i"]: r["canonical_url"]
        for r in textops.canonicalize_urls(df, "url").collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i], want)


def test_canonicalize_urls_idempotent(spark):
    """Canonical keys must be FIXED POINTS: running the chain twice
    must change nothing, or re-canonicalizing an already-deduped
    corpus would split/merge groups."""
    import random

    from pyspark.sql import functions as F

    from lineage_store_database_management_system_spark.operators import textops

    rng = random.Random(42)
    schemes = ["http://", "HTTPS://", "https://", ""]
    hosts = ["www.Site.org", "HOST.com", "a-b.example.NET", "www.x.io"]
    paths = ["", "/", "/A/b", "/p/", "/item/7//", "/ref=zz"]
    queries = ["", "?utm_source=1", "?x=1&utm_a=2&y=3", "?utm_a=1&utm_b=2",
               "?a=1&&b=2", "?ref=h&gclid=9", "?page=2"]
    frags = ["", "#f", "#a#b/"]
    urls = [
        rng.choice(schemes) + rng.choice(hosts) + rng.choice(paths)
        + rng.choice(queries) + rng.choice(frags)
        for _ in range(300)
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i long, url string")
    once = textops.canonicalize_urls(df, "url", out_col="c1")
    twice = textops.canonicalize_urls(once, "c1", out_col="c2")
    bad = twice.where(~F.col("c1").eqNullSafe(F.col("c2"))).collect()
    assert not bad, [(r["url"], r["c1"], r["c2"]) for r in bad[:5]]


def test_merge_full_clause_matrix(spark, tmp_db):
    """when_matched_update condition + when_not_matched_insert=False:
    only qualifying matched rows update, non-qualifying stay, no
    inserts happen; NULL predicates count as false (SQL MERGE)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("flag", T.StringType()),
        ]
    )
    t = tmp_db.create_table_typed("mfull", schema, "k")
    t.ingest_dataframe(
        spark.range(10).select(
            F.col("id").alias("k"),
            (F.col("id") * 1.0).alias("v"),
            F.lit("x").alias("flag"),
        )
    )
    src = spark.range(5, 15).select(
        F.col("id").alias("k"),
        (F.col("id") + 100.0).alias("v"),
        # NULL flag for k=6 exercises the null-predicate-is-false rule
        F.when(F.col("id") == 6, F.lit(None).cast("string"))
        .when(F.col("id") % 2 == 0, F.lit("del"))
        .otherwise(F.lit("upd"))
        .alias("flag"),
    )
    t.merge_into(
        src,
        when_matched_delete=F.col("flag") == "del",
        when_matched_update=F.col("flag") == "upd",
        when_not_matched_insert=False,
    )
    got = {r["k"]: r["v"] for r in t.current_view().collect()}
    # k 8 deleted (matched, flag=del); k 5,7,9 updated; k 6 NULL flag
    # -> neither branch -> untouched; k 10..14 unmatched, NOT inserted
    assert set(got) == {0, 1, 2, 3, 4, 5, 6, 7, 9}
    assert got[5] == 105.0 and got[7] == 107.0 and got[9] == 109.0
    assert got[6] == 6.0
    assert max(got) == 9
