"""Extension-layer operator tests: dedup, similarity, text, multimodal,
event windows, streaming==batch equivalence."""

import datetime

import pytest
from pyspark.sql import functions as F

from lineage_store_database_management_system_spark.operators import (
    contamination,
    dedup,
    graph,
    packing,
    multimodal,
    similarity,
    textops,
    windows,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_exact_dedup_finds_planted_duplicates(spark):
    rows = [
        (1, "the quick brown fox"),
        (2, "THE  quick   brown fox"),  # same after normalization
        (3, "something else entirely"),
        (4, "the quick brown fox"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    groups = dedup.exact_duplicates(df, "doc_id", "text")
    dup = groups.where(F.col("n_copies") > 1).collect()
    assert len(dup) == 1 and dup[0]["keep_id"] == 1 and dup[0]["n_copies"] == 3
    kept = dedup.dedup_exact(df, "doc_id", "text")
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3]


def test_minhash_candidates_contain_true_near_dups(spark, docs):
    """Every exact-Jaccard >= 0.5 pair must surface as a MinHash+LSH
    candidate (16 bands of 4: P(candidate) ~ 1-(1-0.5^4)^16 = 0.65 per
    band config; with planted near-identical docs jaccard ~1 -> certain)."""
    base = docs.limit(50).select("doc_id", "text")
    clones = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra token")).alias("text"),
    )
    corpus = base.unionByName(clones)
    cands = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_candidates(corpus, "doc_id", "text").collect()
    }
    truth = dedup.ngram_jaccard_pairs(corpus, "doc_id", "text", threshold=0.8).collect()
    assert len(truth) >= 30  # the planted clones
    # 16 bands of 4: P(candidate | J) = 1-(1-J^4)^16 — essentially 1
    # for J >= 0.95, so every such pair MUST surface; overall recall
    # at J >= 0.8 should still be high.
    hi = [(r["id_a"], r["id_b"]) for r in truth if r["jaccard"] >= 0.95]
    missed_hi = [p for p in hi if p not in cands]
    assert not missed_hi, f"LSH missed near-identical pairs: {missed_hi[:5]}"
    found = sum(1 for r in truth if (r["id_a"], r["id_b"]) in cands)
    assert found / len(truth) >= 0.8


def test_simhash_deterministic_and_close_for_near_dups(spark):
    rows = [(1, "alpha beta gamma delta epsilon zeta eta theta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    h1 = dedup.simhash(df, "doc_id", "text").collect()[0]["simhash"]
    h2 = dedup.simhash(df, "doc_id", "text").collect()[0]["simhash"]
    assert h1 == h2  # deterministic across runs
    near = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "alpha beta gamma delta epsilon zeta eta iota")],
        "doc_id long, text string",
    )
    pairs = dedup.simhash_candidates(near, "doc_id", "text", max_hamming=16)
    assert pairs.count() == 1


def test_ngram_jaccard_exact_value(spark):
    # doc1 shingles: {a b c, b c d}; doc2: {a b c, b c e} -> J = 1/3
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], "doc_id long, text string"
    )
    out = dedup.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.0).collect()
    assert len(out) == 1 and abs(out[0]["jaccard"] - 1 / 3) < 1e-9


def test_brute_force_topk_and_lsh_recall(emb):
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    exact = [r["vec_id"] for r in similarity.brute_force_topk(emb, q, k=10).collect()]
    assert exact[0] == 0  # the query vector itself
    approx = [r["vec_id"] for r in similarity.lsh_topk(emb, q, k=10, n_planes=6).collect()]
    # multiprobe LSH must at least recover the identical vector and
    # retain reasonable overlap with the exact set
    assert 0 in approx
    assert len(set(exact) & set(approx)) >= 3


def test_knn_join_self_nearest(emb):
    small = emb.limit(30)
    out = similarity.knn_join(small, small, k=1).collect()
    assert all(r["nn_vec_id"] == r["vec_id"] for r in out)  # self is nearest


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is on of the mat"),
            (2, "der hund ist nicht und der katze"),
            (3, "le chat est sur la table et les chaises"),
            (4, "xyzzy qwerty asdf"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_guess"] for r in textops.lang_id(df, "text").collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_text_stats_values(spark):
    df = spark.createDataFrame([(1, "ab 12 c!")], "doc_id long, text string")
    r = textops.text_stats(df, "doc_id", "text").collect()[0]
    assert r["n_chars"] == 8 and r["n_tokens"] == 3
    assert r["n_digits"] == 2 and r["n_spaces"] == 2 and r["n_punct"] == 1


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "goodbye")],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["fp_md5"] for r in textops.fingerprint(df, "doc_id", "text").collect()}
    assert fps[1] == fps[2] != fps[3]


def test_winnowing_overlap_for_shifted_text(spark):
    a = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, a), (2, "PREFIX " + a)], "doc_id long, text string"
    )
    out = {r["doc_id"]: set(r["fingerprints"]) for r in
           textops.winnowing_fingerprint(df, "doc_id", "text").collect()}
    inter = len(out[1] & out[2]) / len(out[1] | out[2])
    assert inter > 0.5  # alignment-robust: shifted copy still overlaps


def test_multimodal_plumbing(spark, docs):
    mm = multimodal.attach_binary_payload(docs.limit(10), "text")
    assert dict(mm.dtypes)["payload"] == "binary"
    feats = multimodal.extract_byte_features(mm, "doc_id").collect()
    assert all(len(r["features"]) == 16 for r in feats)
    assert all(abs(sum(r["features"]) - 1.0) < 1e-6 for r in feats)
    # deterministic
    feats2 = multimodal.extract_byte_features(mm, "doc_id").collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))
    # the real-codec path is an explicit stub
    with pytest.raises(Exception):
        multimodal.decode_image(mm).collect()
    frames = multimodal.sample_frames(mm.limit(1), "doc_id", every_n_bytes=16)
    n_bytes = mm.limit(1).select(F.octet_length("payload")).collect()[0][0]
    assert frames.count() == (n_bytes + 15) // 16


def test_payload_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog " * 30
    # one byte-identical clone, one single-char edit (near-exact),
    # one unrelated payload
    rows = [
        (1, base),
        (2, base),
        (3, base[:-5] + "cat "),
        (4, "completely different content " * 40),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    mm = multimodal.attach_binary_payload(df, "text").select("doc_id", "payload")
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in multimodal.payload_near_duplicates(
            mm, "doc_id", max_hamming=3
        ).collect()
    }
    assert pairs.get((1, 2)) == 0  # identical bytes -> hamming 0
    assert (1, 3) in pairs and 0 < pairs[(1, 3)] <= 3  # near-exact edit
    assert not any(4 in p for p in pairs)  # unrelated never pairs
    # sketch is deterministic across runs
    s1 = {
        r.doc_id: r.simhash
        for r in multimodal.payload_simhash(mm, "doc_id").collect()
    }
    s2 = {
        r.doc_id: r.simhash
        for r in multimodal.payload_simhash(mm, "doc_id").collect()
    }
    assert s1 == s2 and s1[1] == s1[2]


def test_sessionize_gap_semantics(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 1.0),
        (1, t0 + datetime.timedelta(minutes=10), 1.0),
        (1, t0 + datetime.timedelta(minutes=70), 1.0),  # new session (gap 60 > 30)
        (2, t0, 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    sess = windows.sessionize(df, gap_minutes=30).collect()
    per_user = {}
    for r in sess:
        per_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(per_user[1]) == [1, 2] and per_user[2] == [1]


def test_streaming_equals_batch(spark, sf_dir):
    from lineage_store_database_management_system_spark.streaming import (
        read_events_stream,
        run_stream_once,
        streaming_sessionize,
        streaming_tumbling_agg,
    )

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    got = run_stream_once(streaming_tumbling_agg(stream))
    exp = windows.tumbling_agg(
        stream_to_batch(spark, f"{sf_dir}/events.parquet"), keys=["event_type"]
    )
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0
    sess = run_stream_once(
        streaming_sessionize(read_events_stream(spark, f"{sf_dir}/events.parquet"))
    )
    batch_sess = windows.sessionize(stream_to_batch(spark, f"{sf_dir}/events.parquet"))
    assert sess.count() == batch_sess.count()


def stream_to_batch(spark, path):
    """Batch read with the exact column types the stream reader produces."""
    from lineage_store_database_management_system_spark.streaming import normalize_event_time

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_event_time(spark.read.parquet(path))


def test_approx_sketches_error_bounds(spark, sf_dir):
    """HLL++ and GK-quantile sketches stay within their configured
    error bounds vs the exact answers."""
    from lineage_store_database_management_system_spark.sources.readers import load_star

    ev = load_star(spark, sf_dir)["events"]
    approx = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("au"),
            F.percentile_approx("value", 0.5, 1000).alias("am"),
        )
        .collect()
    }
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("eu"),
            F.expr("percentile(value, 0.5)").alias("em"),
        )
        .collect()
    }
    for k in exact:
        assert abs(approx[k]["au"] - exact[k]["eu"]) <= max(3, 0.05 * exact[k]["eu"])
        # GK with accuracy=1000: rank error <= n/1000; translate loosely
        # to a value tolerance via the group's value spread
        spread = ev.where(F.col("event_type") == k).agg(
            (F.max("value") - F.min("value")).alias("s")
        ).collect()[0]["s"]
        assert abs(approx[k]["am"] - exact[k]["em"]) <= 0.05 * spread + 1e-9


def test_sampling_split_total_and_determinism(spark, sf_dir):
    """Every doc lands in exactly one split; assignment is stable
    across recomputation (no RNG anywhere)."""
    from lineage_store_database_management_system_spark.operators.sampling import (
        deterministic_split,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s1 = deterministic_split(docs, "doc_id")
    counts = {r["split"]: r["n"] for r in s1.groupBy("split").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert sum(counts.values()) == docs.count()
    a = sorted(r["doc_id"] for r in s1.where("split = 'val'").select("doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in deterministic_split(docs, "doc_id")
        .where("split = 'val'")
        .select("doc_id")
        .collect()
    )
    assert a == b


def test_cap_per_group_limit_and_plan(spark, sf_dir):
    from lineage_store_database_management_system_spark.operators.sampling import (
        cap_per_group,
    )
    from lineage_store_database_management_system_spark.plans.explain import explain_str

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    capped = cap_per_group(docs, "source", "doc_id", 3)
    per = capped.groupBy("source").count().collect()
    assert per and all(r["count"] <= 3 for r in per)
    # the rank-and-filter must compile to the group-limit pushdown,
    # not a full per-group sort
    assert "WindowGroupLimit" in explain_str(capped)


def test_sampling_signed_hash_keys(spark, sf_dir):
    """Split/sample arithmetic must hold for SIGNED hash keys (the
    documented xxhash64-of-url case): every bucket lands in
    [0, buckets) via pmod, so fractions track the 80/10/10 config
    instead of collapsing negatives into 'train' (regression: `%`
    follows the dividend's sign in Spark)."""
    from lineage_store_database_management_system_spark.operators.sampling import (
        deterministic_split,
        stratified_fraction,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "hkey", F.xxhash64("text")
    )
    n = docs.count()
    n_neg = docs.where(F.col("hkey") < 0).count()
    assert 0 < n_neg < n  # the premise: signed keys on both sides

    s = deterministic_split(docs, "hkey")
    counts = {r["split"]: r["n"] for r in s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == n
    assert 0.70 <= counts.get("train", 0) / n <= 0.90
    assert 0.03 <= counts.get("val", 0) / n <= 0.20
    assert 0.03 <= counts.get("test", 0) / n <= 0.20

    frac = stratified_fraction(docs, "lang", "hkey", 10).count() / n
    assert 0.04 <= frac <= 0.18


def test_minhash_sketch_dir_reuse(spark, sf_dir, tmp_path):
    """sketch_dir persists the banded sketch as a Parquet table: the
    second candidate query reads the sketch instead of recomputing,
    and results are identical to the in-memory path."""
    import os

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    sdir = str(tmp_path / "mh_sketch")

    mem = {
        (r["id_a"], r["id_b"], r["n_shared_bands"])
        for r in dedup.minhash_lsh_candidates(docs, "doc_id", "text").collect()
    }
    first = {
        (r["id_a"], r["id_b"], r["n_shared_bands"])
        for r in dedup.minhash_lsh_candidates(
            docs, "doc_id", "text", sketch_dir=sdir
        ).collect()
    }
    success = os.path.join(sdir, "_SUCCESS")
    assert os.path.exists(success)
    mtime_first = os.path.getmtime(success)
    again = {
        (r["id_a"], r["id_b"], r["n_shared_bands"])
        for r in dedup.minhash_lsh_candidates(
            docs, "doc_id", "text", sketch_dir=sdir
        ).collect()
    }
    assert mem == first == again
    # the reuse run reads the persisted sketch instead of recomputing:
    # the sketch table must NOT have been rewritten (wall-clock
    # comparisons are meaningless on this host — 3-7x run variance)
    assert os.path.getmtime(success) == mtime_first


def test_codec_stub_contract(spark, docs):
    """Boundary contract for the real-codec stub (VERDICT r1 item 10):
    a future codec drop-in must keep (a) the declared output schema —
    input schema + `pixels binary` — and (b) the fake path's schema,
    so neither can drift without failing here. The stub's error text
    must name the installed alternative."""
    from pyspark.sql import types as T

    mm = multimodal.attach_binary_payload(docs.limit(3), "text")

    # (a) decode_image schema contract holds WITHOUT executing (lazy)
    decoded = multimodal.decode_image(mm)
    assert decoded.schema.fields[:-1] == mm.schema.fields
    assert decoded.schema.fields[-1] == T.StructField("pixels", T.BinaryType())

    # (b) executing the stub raises, and the message points at the
    # deterministic fake path
    with pytest.raises(Exception) as ei:
        decoded.collect()
    msg = str(ei.value)
    assert "image decode requires PIL/cv2" in msg
    assert "extract_byte_features" in msg

    # (c) fake-path schemas are the documented drop-in shape
    feats = multimodal.extract_byte_features(mm, "doc_id")
    assert [f.name for f in feats.schema.fields] == ["doc_id", "features"]
    assert feats.schema["features"].dataType == T.ArrayType(T.DoubleType())
    assert feats.schema["doc_id"].dataType == mm.schema["doc_id"].dataType
    resized = multimodal.resize_image(mm, "doc_id", target_bytes=8)
    assert [f.name for f in resized.schema.fields] == [
        "doc_id", "payload_resized", "n_bytes_resized",
    ]
    assert resized.schema["payload_resized"].dataType == T.BinaryType()


def test_word_shingles_short_docs(spark):
    """Docs shorter than n words must yield an EMPTY shingle array —
    sequence(1, 0) descends in Spark and slice(words, 0, n) throws, so
    the guard in word_shingles is load-bearing for every shingle-based
    operator (minhash, jaccard, contamination)."""
    from lineage_store_database_management_system_spark.functions.text import (
        word_shingles,
    )

    df = spark.createDataFrame(
        [("a b",), ("",), ("   ",), ("a b c",), ("a b c d",)], "text string"
    )
    out = [r["s"] for r in df.select(word_shingles(F.col("text"), 3).alias("s")).collect()]
    assert out[0] == [] and out[1] == [] and out[2] == []
    assert out[3] == ["a b c"]
    assert out[4] == ["a b c", "b c d"]


def test_repetition_stats_values(spark):
    df = spark.createDataFrame(
        [(1, "x x x x"), (2, "a b c d"), (3, "a b a b")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in textops.repetition_stats(df, "doc_id", "text").collect()}
    assert rows[1]["dup_word_frac"] == 0.75 and rows[1]["top_word_share"] == 1.0
    assert rows[1]["dup_bigram_frac"] == round(1 - 1 / 3, 4)
    assert rows[2]["dup_word_frac"] == 0.0 and rows[2]["top_word_share"] == 0.25
    assert rows[3]["dup_word_frac"] == 0.5
    # "a b","b a","a b" -> 2 distinct of 3
    assert rows[3]["dup_bigram_frac"] == round(1 - 2 / 3, 4)


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "contact bob@example.com or alice.smith@mail.co today"),
            (2, "ssn 123-45-6789 phone 555-123-4567 ip 192.168.0.1"),
            (3, "clean text with no identifiers at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in textops.pii_scrub(df, "doc_id", "text").collect()}
    assert rows[1]["n_email"] == 2 and rows[1]["n_redactions"] == 2
    assert "<EMAIL>" in rows[1]["text_scrubbed"]
    assert "bob@example.com" not in rows[1]["text_scrubbed"]
    assert rows[2]["n_ssn"] == 1 and rows[2]["n_phone"] == 1 and rows[2]["n_ipv4"] == 1
    assert rows[2]["n_redactions"] == 3
    assert rows[2]["text_scrubbed"] == "ssn <SSN> phone <PHONE> ip <IP>"
    assert rows[3]["n_redactions"] == 0
    assert rows[3]["text_scrubbed"] == rows[3]["text_scrubbed"]


def test_contamination_semantics(spark):
    """Exact-leak doc scores 1.0, fresh doc 0.0, short doc 0 ngrams;
    partial overlap counts distinct 8-grams, not occurrences."""
    train = spark.createDataFrame(
        [(10, "w1 w2 w3 w4 w5 w6 w7 w8 w9")], "doc_id long, text string"
    )
    test = spark.createDataFrame(
        [
            (20, "w1 w2 w3 w4 w5 w6 w7 w8 w9"),  # full leak: 2 grams, both hit
            (21, "n1 n2 n3 n4 n5 n6 n7 n8"),  # no leak: 1 gram
            (22, "too short"),  # no grams at all
            (23, "w1 w2 w3 w4 w5 w6 w7 w8 x9"),  # 1 of 2 grams leaked
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in contamination.ngram_contamination(
            train, test, "doc_id", "text", n=8
        ).collect()
    }
    assert out[20]["n_ngrams"] == 2 and out[20]["n_hit"] == 2 and out[20]["rate"] == 1.0
    assert out[21]["n_ngrams"] == 1 and out[21]["n_hit"] == 0 and out[21]["rate"] == 0.0
    assert out[22]["n_ngrams"] == 0 and out[22]["rate"] == 0.0
    assert out[23]["n_ngrams"] == 2 and out[23]["n_hit"] == 1 and out[23]["rate"] == 0.5


def test_connected_components_chain_and_singletons(spark):
    """Multi-hop chains converge to the min id; isolated nodes from
    the `nodes` frame come back as singleton components; output is
    stable under repartition."""
    pairs = spark.createDataFrame(
        [(5, 4), (4, 3), (3, 2), (2, 1), (10, 11)], "id_a long, id_b long"
    ).repartition(7)
    nodes = spark.range(1, 15).withColumnRenamed("id", "doc_id")
    comp = {
        r["id"]: r["component"]
        for r in graph.connected_components(pairs, nodes=nodes).collect()
    }
    assert all(comp[i] == 1 for i in (1, 2, 3, 4, 5))
    assert comp[10] == 10 and comp[11] == 10
    assert all(comp[i] == i for i in (6, 7, 8, 9, 12, 13, 14))


def test_dedup_by_clusters_keeps_min_member(spark):
    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (6, 7)], "id_a long, id_b long")
    kept = sorted(
        r["doc_id"]
        for r in graph.dedup_by_clusters(df, "doc_id", pairs).collect()
    )
    assert kept == [0, 1, 4, 5, 6]


def test_pack_concat_split_offsets_and_chunks(spark):
    """Offsets are exclusive prefix sums per partition group; chunk
    range covers [off, off+n); zero-token docs occupy no space."""
    df = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 28), (3, "a", 0), (4, "a", 130), (5, "b", 5)],
        "doc_id long, src string, n long",
    )
    out = {
        r["doc_id"]: r
        for r in packing.pack_concat_split(df, "doc_id", "n", 128, "src").collect()
    }
    assert (out[1]["tok_offset"], out[1]["first_chunk"], out[1]["last_chunk"]) == (0, 0, 0)
    assert (out[2]["tok_offset"], out[2]["first_chunk"], out[2]["last_chunk"]) == (100, 0, 0)
    # doc 3: zero tokens at cursor 128 -> chunk 1, n_chunks 0
    assert (out[3]["tok_offset"], out[3]["n_chunks"]) == (128, 0)
    # doc 4: [128, 258) spans chunks 1..2
    assert (out[4]["first_chunk"], out[4]["last_chunk"], out[4]["n_chunks"]) == (1, 2, 2)
    assert (out[5]["tok_offset"], out[5]["first_chunk"]) == (0, 0)


def test_domain_mixture_budget_and_determinism(spark):
    from lineage_store_database_management_system_spark.operators.sampling import (
        domain_mixture,
    )

    df = spark.createDataFrame(
        [(i, "big" if i % 2 == 0 else "small", 10) for i in range(200)],
        "doc_id long, dom string, n long",
    )
    kept, plan = domain_mixture(df, "doc_id", "dom", "n", {"big": 1.0}, 600)
    p = {r["dom"]: r for r in plan.collect()}
    # each domain: 100 docs x 10 tokens; equal weights -> 300-token
    # target each -> frac 0.3
    assert p["big"]["n_tokens"] == 1000 and p["big"]["target_frac"] == 0.3
    assert p["small"]["target_frac"] == 0.3
    # thinning is approximate (hash scramble) but within sane bounds
    assert 10 <= p["big"]["n_kept"] <= 50
    k1 = sorted(r["doc_id"] for r in kept.collect())
    k2 = sorted(
        r["doc_id"]
        for r in domain_mixture(
            df.repartition(13), "doc_id", "dom", "n", {"big": 1.0}, 600
        )[0].collect()
    )
    assert k1 == k2  # deterministic under repartition
    # under-budget: frac capped at 1.0, everything kept
    _, plan_all = domain_mixture(df, "doc_id", "dom", "n", {}, 10**9)
    assert all(r["target_frac"] == 1.0 and r["n_kept"] == 100 for r in plan_all.collect())


def test_chunk_fixed_windows(spark):
    from lineage_store_database_management_system_spark.operators.textops import chunk_fixed

    df = spark.createDataFrame(
        [(1, "a" * 950), (2, "b" * 400), (3, ""), (4, "c" * 401)],
        ["doc_id", "text"],
    )
    out = chunk_fixed(df, "doc_id", "text", size=500, stride=400)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    # 950 chars -> starts at 0, 400, 800 -> 3 chunks; last is 150 long
    assert {k for k in rows if k[0] == 1} == {(1, 0), (1, 1), (1, 2)}
    assert rows[(1, 0)]["chunk_len"] == 500 and rows[(1, 2)]["chunk_len"] == 150
    # overlap: chunk 1 starts 400 in, so its first 100 chars repeat chunk 0's tail
    assert rows[(1, 0)]["chunk"][400:] == rows[(1, 1)]["chunk"][:100]
    # exactly one stride of text -> one chunk; empty doc -> none
    assert {k for k in rows if k[0] == 2} == {(2, 0)}
    assert not any(k[0] == 3 for k in rows)
    assert {k for k in rows if k[0] == 4} == {(4, 0), (4, 1)}
    assert rows[(4, 1)]["chunk_len"] == 1


def test_tfidf_top_terms_ranking(spark):
    from lineage_store_database_management_system_spark.operators.textops import (
        tfidf_top_terms,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha alpha alpha common", "g1"),
            (2, "common common beta", "g1"),
            (3, "common gamma gamma", "g2"),
        ],
        ["doc_id", "text", "source"],
    )
    out = tfidf_top_terms(df, "doc_id", "text", "source", k=2, min_token_len=4)
    per_group = {}
    for r in out.collect():
        per_group.setdefault(r["source"], []).append((r["term"], r["tfidf"]))
    # 'common' appears in every doc -> idf = ln(1) = 0 -> never outranks
    # group-specific terms
    assert per_group["g1"][0][0] == "alpha"
    assert per_group["g2"][0][0] == "gamma"
    assert all(len(v) <= 2 for v in per_group.values())
    assert all(s >= 0 for v in per_group.values() for _t, s in v)

def test_scalar_quantize_roundtrip(emb):
    q = similarity.scalar_quantize(emb.limit(100))
    rows = q.collect()
    assert all(0 <= c <= 255 for r in rows for c in r["codes"])
    err = similarity.dequantize_error(q, emb.limit(100)).collect()
    assert all(
        r["max_abs_err"] <= r["qstep"] * 0.5000001 or r["qstep"] == 0.0
        for r in err
    )
    # deterministic across runs
    again = {r["vec_id"]: r["codes"] for r in similarity.scalar_quantize(emb.limit(100)).collect()}
    assert all(again[r["vec_id"]] == r["codes"] for r in rows)

def test_remove_boilerplate_lines(spark):
    """Lines in >= min_docs distinct docs are stripped everywhere;
    order of surviving lines is preserved; an all-boilerplate doc
    becomes an empty string, not a dropped row."""
    footer = "(c) example corp - all rights reserved"
    rows = [
        (1, f"unique alpha\n{footer}\nunique beta"),
        (2, f"{footer}\nsomething else"),
        (3, f"third body\n{footer}"),
        (4, footer),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["text"]
        for r in textops.remove_boilerplate_lines(df, "doc_id", "text", min_docs=3).collect()
    }
    assert out == {
        1: "unique alpha\nunique beta",
        2: "something else",
        3: "third body",
        4: "",
    }


def test_remove_repeated_spans_boundaries(spark):
    """Span-boundary reassembly for substring-level dedup: covered
    tokens drop exactly (boundary neighbours survive), overlapping /
    adjacent duplicated windows merge via token coverage, spans at
    document start/middle work, sub-k documents pass through, and
    WITHIN-document repetition alone is never removed (the threshold
    counts distinct documents)."""
    from pyspark.sql import functions as F

    from lineage_store_database_management_system_spark.operators import textops

    SPAN = "q w e r t y u i"  # 8 tokens = exactly one k=8 window
    docs = [
        (1, f"a b c {SPAN} d e f"),      # mid-doc: neighbours c/d survive
        (2, f"{SPAN} x y z"),            # doc-start boundary
        (3, "a b c d e f g h i j"),      # clean doc unchanged
        (4, f"m n {SPAN} {SPAN} o"),     # adjacent copies merge coverage
        (5, "p p p p p p p p p p p p"),  # within-doc repetition only
        (6, "t i n y"),                  # < k tokens: no windows
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: r["text"]
        for r in textops.remove_repeated_spans(
            df, "doc_id", "text", k=8, min_docs=2
        ).collect()
    }
    assert out[1] == "a b c d e f"
    assert out[2] == "x y z"
    assert out[3] == "a b c d e f g h i j"
    assert out[4] == "m n o"
    assert out[5] == "p p p p p p p p p p p p"
    assert out[6] == "t i n y"

    # a doc that is ENTIRELY a duplicated span comes back empty, not dropped
    df2 = spark.createDataFrame(
        [(1, SPAN), (2, SPAN), (3, "u n r e l a t e d x")],
        "doc_id long, text string",
    )
    out2 = {
        r["doc_id"]: r["text"]
        for r in textops.remove_repeated_spans(
            df2, "doc_id", "text", k=8, min_docs=2
        ).collect()
    }
    assert out2[1] == "" and out2[2] == "" and len(out2) == 3


def test_gopher_quality_flags_edges(spark):
    from lineage_store_database_management_system_spark.operators import textops

    good = " ".join(
        ["the quick brown fox and that dog have fun with games to play"] * 6
    )
    docs = spark.createDataFrame(
        [
            (1, good),                       # passes everything
            (2, ""),                         # empty -> fails word count
            (3, "short text only"),          # too few words
            (4, "#### " * 60),               # symbol ratio + no alpha
            (5, ("x" * 40 + " ") * 60),      # mean word length 40
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textops.gopher_quality_flags(
        docs, "doc_id", "text").collect()}
    assert out[1].passes_gopher
    assert out[1].ok_stop_words and out[1].stop_word_hits >= 2
    assert out[2].n_words == 0 and not out[2].passes_gopher
    assert not out[3].ok_word_count
    assert not out[4].ok_symbol_ratio and not out[4].ok_alpha_words
    assert not out[5].ok_mean_word_len and out[5].n_words == 60


def test_product_quantization_roundtrip_and_refine(spark, sf_dir):
    import os

    from lineage_store_database_management_system_spark.operators import similarity

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = [float(x) for x in emb.where(F.col("vec_id") == 1).first()["embedding"]]
    books = similarity.pq_train(emb, m=8, nbits=4)
    assert len(books) == 8 and len(books[0]) == 16
    assert len(books[0][0]) == len(q) // 8

    enc = similarity.pq_encode(emb, books)
    codes = enc.select("_pq").limit(50).collect()
    assert all(len(r["_pq"]) == 8 for r in codes)
    assert all(0 <= c < 16 for r in codes for c in r["_pq"])

    # encoding is a pure function: repartitioning must not change it
    enc2 = similarity.pq_encode(emb.repartition(7), books)
    a = {r.vec_id: tuple(r["_pq"]) for r in enc.collect()}
    b = {r.vec_id: tuple(r["_pq"]) for r in enc2.collect()}
    assert a == b

    # the refined top-k equals brute force restricted to the ADC
    # candidate set, and the query's own vector is always recalled
    cands = similarity.pq_adc_candidates(enc, q, books, n_candidates=50)
    cand_ids = {r.vec_id for r in cands.select("vec_id").collect()}
    assert 1 in cand_ids
    topk = similarity.pq_topk(enc, q, books, k=5, n_candidates=50, round_to=3)
    got = [r.vec_id for r in topk.collect()]
    assert got[0] == 1  # exact refine ranks the query itself first
    subset = emb.where(F.col("vec_id").isin(list(cand_ids)))
    direct = [
        r.vec_id
        for r in similarity.brute_force_topk(subset, q, k=5, round_to=3).collect()
    ]
    assert got == direct


def test_pq_train_rejects_indivisible_dim(spark, sf_dir):
    import os

    from lineage_store_database_management_system_spark.operators import similarity

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    with pytest.raises(ValueError):
        similarity.pq_train(emb, m=7)


def test_ivf_pq_composed_recipe(spark, sf_dir):
    import os

    from lineage_store_database_management_system_spark.operators import similarity

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    cents = similarity.ivf_centroids(emb, n_lists=8)
    books = similarity.pq_train(emb, m=8, nbits=4)
    prepared = similarity.pq_encode(similarity.ivf_assign(emb, cents), books)

    got = similarity.ivf_pq_topk(
        prepared, q, cents, books, k=5, nprobe=8, n_candidates=100, round_to=3
    )
    ids = [r.vec_id for r in got.collect()]
    assert ids[0] == 0  # querying with vector 0: exact refine ranks it first
    # with nprobe = n_lists the IVF stage prunes nothing, so the
    # composed result equals plain PQ top-k
    pq_only = similarity.pq_topk(
        prepared, q, books, k=5, n_candidates=100, round_to=3
    )
    assert ids == [r.vec_id for r in pq_only.collect()]
    # partial probe returns k rows from the probed lists only
    part = similarity.ivf_pq_topk(
        prepared, q, cents, books, k=5, nprobe=2, n_candidates=50, round_to=3
    )
    rows = part.collect()
    assert len(rows) == 5 and rows[0].vec_id == 0


def test_training_shards_deterministic_and_reshuffled_by_seed(spark, tmp_path, sf_dir):
    import os

    from lineage_store_database_management_system_spark.operators import packing

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    a = os.path.join(str(tmp_path), "a")
    b = os.path.join(str(tmp_path), "b")
    c = os.path.join(str(tmp_path), "c")
    ca = packing.write_training_shards(docs, a, n_shards=4, id_col="doc_id", seed=7)
    cb = packing.write_training_shards(
        docs.repartition(13), b, n_shards=4, id_col="doc_id", seed=7
    )
    assert ca == cb  # layout independent of input partitioning
    la = spark.read.parquet(a).orderBy("_shard", "_ord").select("doc_id").collect()
    lb = spark.read.parquet(b).orderBy("_shard", "_ord").select("doc_id").collect()
    assert [r.doc_id for r in la] == [r.doc_id for r in lb]  # full order identical

    cc = packing.write_training_shards(docs, c, n_shards=4, id_col="doc_id", seed=8)
    lc = spark.read.parquet(c).orderBy("_shard", "_ord").select("doc_id").collect()
    assert [r.doc_id for r in la] != [r.doc_id for r in lc]  # new seed reshuffles
    assert sum(cc.values()) == sum(ca.values()) == docs.count()


def test_persisted_ann_index_probe_prunes_partitions(spark, sf_dir, tmp_path):
    import os

    from lineage_store_database_management_system_spark.operators import similarity
    from lineage_store_database_management_system_spark.plans.explain import explain_str

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    idx = os.path.join(str(tmp_path), "ann")
    similarity.ivf_pq_write_index(emb, idx, n_lists=8, m=8, nbits=4)
    # list partitions on disk
    assert sum(d.startswith("_list=") for d in os.listdir(idx)) == 8

    q = [float(x) for x in emb.where(F.col("vec_id") == 3).first()["embedding"]]
    got = similarity.ivf_pq_topk_from_index(
        spark, idx, q, k=5, nprobe=8, n_candidates=100, round_to=3
    )
    ids = [r.vec_id for r in got.collect()]
    assert ids[0] == 3  # exact refine puts the query's own vector first

    # partial probe must push the list filter to the scan as a
    # PARTITION filter (unprobed list files never open)
    part = similarity.ivf_pq_topk_from_index(spark, idx, q, k=5, nprobe=2)
    plan = explain_str(part)
    assert "PartitionFilters" in plan and "_list" in plan
    assert len(part.collect()) == 5


def test_repeat_by_weight_deterministic_epochs(spark):
    from lineage_store_database_management_system_spark.operators import packing

    rows = [(i, "web" if i % 2 else "code", f"doc {i}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, text string")
    out = packing.repeat_by_weight(
        df, "domain", {"code": 2.0, "web": 1.5}, id_col="doc_id", seed=3
    )
    by_dom = {r.domain: r.n for r in out.groupBy("domain").count()
              .withColumnRenamed("count", "n").collect()}
    assert by_dom["code"] == 400  # integral weight: exactly 2x of 200
    assert 200 * 1.3 <= by_dom["web"] <= 200 * 1.7  # 1.5 +- sampling band

    # pure function of (seed, id): partitioning cannot change the draw
    out2 = packing.repeat_by_weight(
        df.repartition(17), "domain", {"code": 2.0, "web": 1.5},
        id_col="doc_id", seed=3,
    )
    a = sorted((r.doc_id, r._epoch) for r in out.collect())
    b = sorted((r.doc_id, r._epoch) for r in out2.collect())
    assert a == b

    # a different seed redraws WHICH web docs get the extra epoch
    out3 = packing.repeat_by_weight(
        df, "domain", {"code": 2.0, "web": 1.5}, id_col="doc_id", seed=4
    )
    extra3 = {r.doc_id for r in out3.where("domain='web' AND _epoch=1").collect()}
    extra1 = {r.doc_id for r in out.where("domain='web' AND _epoch=1").collect()}
    assert extra3 != extra1

    # weight 0 drops the domain; unlisted domains default to one epoch
    out4 = packing.repeat_by_weight(df, "domain", {"code": 0.0},
                                    id_col="doc_id", seed=3)
    assert out4.where("domain='code'").count() == 0
    assert out4.where("domain='web'").count() == 200


def test_bpe_train_matches_reference(spark):
    corpus = [
        ("low low low low low lower lower newest newest newest "
         "newest newest newest widest widest widest",),
        ("low lower newest widest newest",),
    ]
    df = spark.createDataFrame(corpus, "text string")
    merges, vocab = textops.bpe_train(df, "text", n_merges=6)

    # pure-Python reference BPE (Sennrich et al. 2016 pseudocode)
    from collections import Counter

    words = Counter()
    for (t,) in corpus:
        for w in t.lower().strip().split():
            words[tuple(w)] += 1
    ref_merges = []
    for _ in range(6):
        pc = Counter()
        for syms, f in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        best = max(pc.items(), key=lambda kv: (kv[1], [-ord(c) for c in kv[0][0]]))
        # deterministic tie-break matching the operator: count desc,
        # then left asc, right asc
        top = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0][0]
        ref_merges.append(top)
        new = Counter()
        for syms, f in words.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == top:
                    res.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new[tuple(res)] += f
        words = new
    assert merges == ref_merges
    got_vocab = {
        tuple(r.syms): r.freq for r in vocab.collect()
    }
    assert got_vocab == {k: v for k, v in words.items()}


def test_charlm_xent_flags_gibberish(spark):
    rows = [
        (1, "the cat sat on the mat and the dog sat on the log " * 5),
        (2, "the rat sat on the hat and the cat ran to the dog " * 5),
        (3, "qzxjvk wqpzt xkcvbz jqwwpz zzxqkv bbqzxw " * 8),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.xent for r in textops.charlm_xent(df, "doc_id", "text").collect()}
    # gibberish scores strictly worse than both natural docs under the
    # corpus-trained model
    assert got[3] > got[1] and got[3] > got[2]
    # deterministic
    again = {r.doc_id: r.xent for r in textops.charlm_xent(df, "doc_id", "text").collect()}
    assert got == again


def test_payload_neardup_clone_group_guard(spark):
    """Default exact-first guard (VERDICT r5 item 5): a clone group of
    g byte-identical payloads must NOT produce g^2/2 pairs once above
    clone_cap — it star-links (O(g) pairs) — while groups under the
    cap keep their full pair closure, and the connected components
    equal raw enumeration's in both regimes (hamming-0 equality is
    transitive, so the star keeps the class connected)."""
    big = [(i, "heavily cloned payload " * 40) for i in range(100)]       # g=100
    small = [(200 + i, "small clone group " * 40) for i in range(5)]      # g=5
    other = [(900, "unrelated content entirely " * 40)]
    df = spark.createDataFrame(big + small + other, "doc_id long, text string")
    mm = multimodal.attach_binary_payload(df, "text").select("doc_id", "payload")

    guarded = multimodal.payload_near_duplicates(mm, "doc_id", clone_cap=16)
    rows = guarded.collect()
    pairs = {(r.id_a, r.id_b) for r in rows}
    assert all(r.hamming == 0 for r in rows)
    # oversized group: star only -> 99 pairs, all anchored at min id
    big_pairs = {p for p in pairs if p[1] < 200}
    assert big_pairs == {(0, i) for i in range(1, 100)}
    # small group: full closure (5 choose 2 = 10 pairs)
    small_pairs = {p for p in pairs if p[0] >= 200 and p[1] < 900}
    assert len(small_pairs) == 10
    assert not any(900 in p for p in pairs)

    # connected components identical to raw enumeration
    def comps(pair_set, ids):
        parent = {i: i for i in ids}
        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x
        for a, b in pair_set:
            parent[find(a)] = find(b)
        from collections import defaultdict
        cc = defaultdict(set)
        for i in ids:
            cc[find(i)].add(i)
        return {frozenset(s) for s in cc.values() if len(s) > 1}

    raw = {
        (r.id_a, r.id_b)
        for r in multimodal.payload_near_duplicates(
            mm, "doc_id", exact_first=False
        ).collect()
    }
    ids = [r.doc_id for r in df.select("doc_id").collect()]
    assert comps(pairs, ids) == comps(raw, ids)
    # and the guard actually bounds the blowup: raw has 100*99/2 pairs
    # for the big group, guarded has 99
    assert len({p for p in raw if p[1] < 200}) == 4950
    assert len(big_pairs) == 99


def test_codebook_scale_path_deterministic(spark, sf_dir):
    """ivf_centroids/pq_train scale path (hash sample + distributed
    Lloyd refinement): deterministic across runs, correct shapes, and
    the refined centroids are genuine full-corpus means (every vector
    contributes through the partial-sum passes, not just the driver
    sample)."""
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    kw = dict(n_lists=8, sample="hash", sample_n=64, refine_iters=2)
    c1 = similarity.ivf_centroids(emb, **kw)
    c2 = similarity.ivf_centroids(emb, **kw)
    assert c1 == c2  # hash sample + Lloyd passes are deterministic
    assert len(c1) == 8 and len(c1[0]) == len(emb.select("embedding").first()[0])
    # refinement moved the centroids off the 64-row sample's optimum
    c0 = similarity.ivf_centroids(emb, n_lists=8, sample="hash", sample_n=64)
    assert c1 != c0
    # refined centroids satisfy the Lloyd fixed-point property against
    # the FULL corpus: one more distributed pass from c1 moves each
    # centroid less than the first refinement step did
    d_refine = max(
        float(np.abs(np.asarray(a) - np.asarray(b)).max()) for a, b in zip(c1, c0)
    )
    c3 = similarity.ivf_centroids(emb, n_lists=8, sample="hash", sample_n=64, refine_iters=3)
    d_next = max(
        float(np.abs(np.asarray(a) - np.asarray(b)).max()) for a, b in zip(c3, c1)
    )
    assert d_next < d_refine

    books = similarity.pq_train(
        emb, m=4, nbits=3, sample="hash", sample_n=64, refine_iters=1
    )
    assert len(books) == 4 and all(len(b) == 8 for b in books)
    books2 = similarity.pq_train(
        emb, m=4, nbits=3, sample="hash", sample_n=64, refine_iters=1
    )
    assert books == books2


def test_ivf_topk_batch_equals_single_query(spark, sf_dir):
    """Batch ANN must return EXACTLY the single-query ivf_topk result
    for every query in the batch (same probes, same rounding, same
    tiebreak) — one job instead of one per query."""
    from lineage_store_database_management_system_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = similarity.ivf_centroids(emb, n_lists=8)
    assigned = similarity.ivf_assign(emb, cents).persist()
    qids = [0, 3, 7]
    queries = emb.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_embedding")
    )
    batch = {
        (r["q_id"], r["vec_id"]): r["cosine"]
        for r in similarity.ivf_topk_batch(
            assigned, queries, cents, k=10, nprobe=3, round_to=3
        ).collect()
    }
    for qid in qids:
        qv = [float(x) for x in emb.where(F.col("vec_id") == qid).first()["embedding"]]
        single = {
            (qid, r["vec_id"]): r["cosine"]
            for r in similarity.ivf_topk(
                assigned, qv, cents, k=10, nprobe=3, round_to=3
            ).collect()
        }
        got = {kv: c for kv, c in batch.items() if kv[0] == qid}
        assert got == single, f"q={qid}: batch != single"
    assigned.unpersist()


def test_bpe_encode_matches_reference(spark):
    """bpe_encode applies the learned merge list exactly like the
    pure-Python reference apply (greedy left-to-right, learned
    order), including nested merges ('lo'+'w' -> 'low') and docs with
    unseen/empty text."""
    corpus = [
        (1, "low low low low low lower lower newest newest newest "
            "newest newest newest widest widest widest"),
        (2, "low lower newest widest newest"),
        (3, "unseen zebra tokens"),
        (4, "   "),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    merges, _ = textops.bpe_train(df.where("doc_id <= 2"), "text", n_merges=6)
    got = {
        r.doc_id: r.n_tokens
        for r in textops.bpe_encode(df, "doc_id", "text", merges).collect()
    }

    def ref_ntok(text):
        total = 0
        for w in text.lower().strip().split():
            s = list(w)
            for l, r in merges:
                res, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                        res.append(l + r)
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                s = res
            total += len(s)
        return total

    exp = {d: ref_ntok(t) for d, t in corpus}
    assert got == exp
    assert got[4] == 0  # whitespace-only doc -> zero tokens
    # merged symbols actually compress: fewer tokens than characters
    assert got[1] < sum(len(w) for w in corpus[0][1].split())


def test_ivf_pq_append_index_equals_rebuild(spark, sf_dir, tmp_path):
    """Appending new vectors to a persisted ANN index (frozen
    codebooks) must be indistinguishable at query time from encoding
    the full corpus under those same codebooks: identical top-k,
    identical partition layout."""
    import json
    import os

    from lineage_store_database_management_system_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    half1 = emb.where("vec_id % 2 = 0")
    half2 = emb.where("vec_id % 2 = 1")
    idx = str(tmp_path / "ann_idx")
    similarity.ivf_pq_write_index(half1, idx, n_lists=8, m=4, nbits=4)
    n = similarity.ivf_pq_append_index(half2, idx)
    assert n == half2.count()
    # the appended index covers the full corpus
    assert spark.read.parquet(idx).count() == emb.count()

    with open(os.path.join(idx, "_ann_meta.json")) as f:
        meta = json.load(f)
    q = [float(x) for x in emb.where("vec_id = 1").first()["embedding"]]
    got = [
        (r["vec_id"], r["cosine"])
        for r in similarity.ivf_pq_topk_from_index(
            spark, idx, q, k=10, nprobe=3, n_candidates=50, round_to=3
        ).collect()
    ]
    # twin: encode EVERYTHING under the same frozen codebooks in one go
    prepared = similarity.pq_encode(
        similarity.ivf_assign(emb, meta["centroids"]), meta["codebooks"]
    )
    exp = [
        (r["vec_id"], r["cosine"])
        for r in similarity.ivf_pq_topk(
            prepared, q, meta["centroids"], meta["codebooks"],
            k=10, nprobe=3, n_candidates=50, round_to=3,
        ).collect()
    ]
    assert got == exp
    # appended files landed inside list partitions (layout preserved)
    stray = [
        f for f in os.listdir(idx)
        if f.endswith(".parquet") and not f.startswith("_")
    ]
    assert stray == []


def test_ppm_bmp_decode_roundtrip(spark):
    """Real-codec path (r7): PPM P6 and 24bpp BMP round-trip through
    encode -> decode_image, including odd widths that exercise BMP's
    4-byte stride padding, BGR order, and bottom-up rows."""
    import numpy as np

    rows = []
    for i, (w, h) in enumerate([(5, 3), (4, 2), (7, 1), (3, 3)]):
        rgb = bytes((i * 37 + k) % 256 for k in range(w * h * 3))
        payload = (
            multimodal.encode_ppm(w, h, rgb)
            if i % 2 == 0
            else multimodal.encode_bmp(w, h, rgb)
        )
        rows.append((i, payload, rgb, w, h))
    df = spark.createDataFrame(
        [(r[0], bytearray(r[1])) for r in rows], "id long, payload binary"
    )
    got = {r["id"]: bytes(r["pixels"]) for r in multimodal.decode_image(df).collect()}
    for i, _p, rgb, _w, _h in rows:
        assert got[i] == rgb, f"row {i} pixels mismatch"
    # stats kernel agrees with a direct numpy computation
    stats = {r["id"]: r for r in multimodal.decode_image_stats(df, "id").collect()}
    for i, _p, rgb, w, h in rows:
        arr = np.frombuffer(rgb, np.uint8).astype(np.int64)
        assert stats[i]["width"] == w and stats[i]["height"] == h
        assert stats[i]["n_pixel_bytes"] == w * h * 3
        assert stats[i]["mean_byte"] == arr.sum() / arr.size
        assert stats[i]["wsum"] == int(((np.arange(arr.size) + 1) * arr).sum())
    # P3 ascii variant decodes to the same pixels as P6
    w, h = 4, 2
    rgb = bytes(range(w * h * 3))
    p3 = b"P3\n# comment\n4 2\n255\n" + " ".join(str(b) for b in rgb).encode()
    df3 = spark.createDataFrame([(0, bytearray(p3))], "id long, payload binary")
    assert bytes(multimodal.decode_image(df3).collect()[0]["pixels"]) == rgb
    # undecodable payloads: raise by default, NULL under on_error=skip
    bad = spark.createDataFrame(
        [(0, bytearray(b"\x89PNG....")), (1, bytearray(multimodal.encode_ppm(1, 1, b"abc")))],
        "id long, payload binary",
    )
    with pytest.raises(Exception):
        multimodal.decode_image(bad).collect()
    out = {r["id"]: r["pixels"] for r in multimodal.decode_image(bad, on_error="skip").collect()}
    assert out[0] is None and bytes(out[1]) == b"abc"
    assert multimodal.decode_image_stats(bad, "id", on_error="skip").count() == 1


def test_ivf_residual_encoding_recipe(spark, sf_dir):
    """Full IVFADC (r7): residual-trained codes + per-list query-residual
    ADC. Correctness: residuals reconstruct (centroid + residual ==
    vector); the composed residual top-k finds the query's own vector
    first; and with nprobe = n_lists + generous candidates it matches
    the exact brute-force top-k."""
    import os

    from lineage_store_database_management_system_spark.operators import similarity

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    cents = similarity.ivf_centroids(emb, n_lists=8)
    assigned = similarity.ivf_assign(emb, cents)
    res = similarity.ivf_residuals(assigned, cents)

    # residual + its list's centroid reconstructs the vector exactly
    # (float32 arithmetic both sides)
    row = res.where(F.col("vec_id") == 0).first()
    rebuilt = [c + r for c, r in zip(cents[row["_list"]], row["_res"])]
    import numpy as np

    orig32 = np.asarray(row["embedding"], dtype=np.float32)
    assert np.allclose(rebuilt, orig32, atol=1e-5)

    books = similarity.pq_train(res, vec_col="_res", m=8, nbits=4)
    prepared = similarity.pq_encode(res, books, vec_col="_res")
    got = similarity.ivf_pq_topk(
        prepared, q, cents, books, k=5, nprobe=8, n_candidates=200,
        round_to=3, residual=True,
    )
    ids = [r.vec_id for r in got.collect()]
    assert ids[0] == 0
    exact = [
        r.vec_id
        for r in similarity.brute_force_topk(emb, q, 5, round_to=3).collect()
    ]
    assert ids == exact
    # partial probe still returns k rows
    part = similarity.ivf_pq_topk(
        prepared, q, cents, books, k=5, nprobe=2, n_candidates=50,
        round_to=3, residual=True,
    )
    assert len(part.collect()) == 5


def test_semantic_dedup_blocking_invariant(spark, sf_dir):
    """r7 skew fix: the within-cluster pair stage salted into bounded
    block pairs must enumerate the IDENTICAL pair set as the
    single-block plan — same drops, same n_close_prior — regardless
    of block_target."""
    import os

    from lineage_store_database_management_system_spark.operators import similarity

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    clones = emb.where("vec_id % 5 = 0").select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    allv = emb.unionByName(clones)
    one_block = similarity.semantic_dedup(
        allv, threshold=0.99, n_lists=8, block_target=10**9, kernel="expr"
    )
    blocked = similarity.semantic_dedup(
        allv, threshold=0.99, n_lists=8, block_target=7, kernel="expr"
    )
    vectorized = similarity.semantic_dedup(
        allv, threshold=0.99, n_lists=8, block_target=7, kernel="numpy"
    )
    ra = sorted(map(tuple, one_block.collect()))
    rb = sorted(map(tuple, blocked.collect()))
    rc = sorted(map(tuple, vectorized.collect()))
    assert ra == rb  # blocking enumerates the identical pair set
    assert ra == rc  # numpy block kernel == Catalyst expression path
    assert sum(1 for r in ra if not r[3]) == clones.count()  # every clone dropped


def test_durable_index_residual_mode(spark, sf_dir, tmp_path):
    """Durable ANN index with residual=True: sidecar records the flag,
    appends encode under the frozen residual codebooks, and probes
    find the query's own vector first."""
    import json
    import os

    from lineage_store_database_management_system_spark.operators import similarity

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    idx = str(tmp_path / "ann_res")
    similarity.ivf_pq_write_index(
        emb.where("vec_id < 400"), idx, n_lists=8, m=8, nbits=4, residual=True
    )
    with open(os.path.join(idx, "_ann_meta.json")) as f:
        assert json.load(f)["residual"] is True
    n = similarity.ivf_pq_append_index(emb.where("vec_id >= 400"), idx)
    assert n == emb.where("vec_id >= 400").count()
    q = [float(x) for x in emb.where(F.col("vec_id") == 450).first()["embedding"]]
    # full probe + full candidate set: ADC excludes nothing, so the
    # exact refine must reproduce brute force deterministically
    got = similarity.ivf_pq_topk_from_index(
        spark, idx, q, k=5, nprobe=8, n_candidates=600, round_to=3
    )
    ids = [r.vec_id for r in got.collect()]
    assert ids[0] == 450
    exact = [
        r.vec_id for r in similarity.brute_force_topk(emb, q, 5, round_to=3).collect()
    ]
    assert ids == exact


def test_wav_codec_roundtrip_and_stub_contract():
    import struct

    import numpy as np
    import pytest

    from lineage_store_database_management_system_spark.operators import multimodal as mm

    v = np.array([0, 1, -2, 32767, -32768, 7], dtype="<i2")
    b = mm.encode_wav(16000, 2, v.tobytes())
    rate, ch, data = mm._decode_wav(b)
    assert (rate, ch) == (16000, 2)
    assert np.array_equal(np.frombuffer(data, "<i2"), v)
    # compressed format tag -> documented stub contract, not garbage
    bad = bytearray(b)
    fmt_at = b.index(b"fmt ") + 8
    bad[fmt_at : fmt_at + 2] = struct.pack("<H", 85)  # MP3 tag
    with pytest.raises(NotImplementedError, match="compressed WAVE"):
        mm._decode_wav(bytes(bad))
    with pytest.raises(NotImplementedError, match="RIFF"):
        mm._decode_wav(b"not audio at all")
    # odd-sized chunk word alignment: a 3-byte LIST chunk before data
    head, tail = b[:12], b[12:]
    lst = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    b2 = head[:4] + struct.pack("<I", len(head) + len(lst) + len(tail) - 8) + head[8:] + lst + tail
    rate2, ch2, data2 = mm._decode_wav(b2)
    assert np.array_equal(np.frombuffer(data2, "<i2"), v)
