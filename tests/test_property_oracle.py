"""Lineage property test (SURVEY §5.2 item 2 / FIXTURES.md A2):
replay a random-but-seeded interleaving of insert/update/delete/
increment/select/select_version through the Query API against a
pure-Python oracle of per-key version lists; verify every read, then
verify the Spark current view matches the oracle's final state — at
an arbitrary compaction point (merge must never change an answer)."""

import random

import pytest

from lineage_store_database_management_system_spark import Query

K = 92106429
NCOLS = 5


class Oracle:
    """key -> list of version column-tuples (oldest first)."""

    def __init__(self):
        self.data: dict[int, list[list]] = {}

    def insert(self, cols):
        self.data[cols[0]] = [list(cols)]

    def update(self, key, cols):
        if key not in self.data:
            return False
        prev = self.data[key][-1]
        nxt = [cols[i] if cols[i] is not None else prev[i] for i in range(NCOLS)]
        if nxt[0] != key:  # pk change
            self.data[nxt[0]] = self.data.pop(key) + [nxt]
        else:
            self.data[key].append(nxt)
        return True

    def delete(self, key):
        return self.data.pop(key, None) is not None

    def latest(self, key):
        return self.data[key][-1] if key in self.data else None

    def version(self, key, k):
        if key not in self.data:
            return None
        vs = self.data[key]
        return vs[max(0, len(vs) - 1 - abs(k))]


def test_oplog_replay_matches_oracle(tmp_db):
    rng = random.Random(42)
    t = tmp_db.create_table("grades", NCOLS, 0)
    q = Query(t)
    oracle = Oracle()
    live_keys: list[int] = []
    compact_at = {120, 260}

    for step in range(400):
        if step in compact_at:
            t.compact()  # merge at arbitrary points; answers must not change
        op = rng.random()
        if op < 0.35 or not live_keys:
            key = K + step
            cols = (key, rng.randint(0, 100), rng.randint(0, 100), rng.randint(0, 100), rng.randint(0, 100))
            assert q.insert(*cols) is True
            oracle.insert(cols)
            live_keys.append(key)
        elif op < 0.65:
            key = rng.choice(live_keys)
            cols = [None] * NCOLS
            for i in rng.sample(range(1, NCOLS), rng.randint(1, 3)):
                cols[i] = rng.randint(0, 100)
            assert q.update(key, *cols) is True
            oracle.update(key, cols)
        elif op < 0.72:
            key = rng.choice(live_keys)
            assert q.delete(key) is True
            oracle.delete(key)
            live_keys.remove(key)
        elif op < 0.78:
            key = rng.choice(live_keys)
            prev = oracle.latest(key)[2]
            assert q.increment(key, 2) is True
            oracle.update(key, [None, None, prev + 1, None, None])
        elif op < 0.92:
            key = rng.choice(live_keys)
            got = q.select(key, 0, [1] * NCOLS)
            assert got and got[0].columns == oracle.latest(key)
        else:
            key = rng.choice(live_keys)
            k = rng.randint(0, 4)
            got = q.select_version(key, 0, [1] * NCOLS, -k)
            assert got and got[0].columns == oracle.version(key, k)

    # final state: Spark current view == oracle, regardless of
    # compaction state and pending buffers
    rows = {r["col0"]: [r[f"col{i}"] for i in range(NCOLS)] for r in t.current_view().collect()}
    expected = {k: v[-1] for k, v in oracle.data.items()}
    assert rows == expected

    # one more compaction; re-check a version query through Spark
    t.compact()
    rows2 = {r["col0"]: [r[f"col{i}"] for i in range(NCOLS)] for r in t.current_view().collect()}
    assert rows2 == expected
    v1 = {r["col0"]: [r[f"col{i}"] for i in range(NCOLS)] for r in t.version_view(-1).collect()}
    exp_v1 = {}
    for key, vs in oracle.data.items():
        prev = vs[max(0, len(vs) - 2)]
        exp_v1[prev[0]] = prev
    assert v1 == exp_v1


def test_bulk_oplog_replay_matches_oracle(tmp_db, spark):
    """Bulk-path analogue of the replay test: a seeded interleaving of
    ingest_dataframe / bulk_update / bulk_delete with compaction in
    every flavor (plain, sort-clustered, z-ordered) at arbitrary
    points, verified against a pure-Python oracle — layout operations
    must never change an answer, and a CHECK constraint added mid-run
    must hold from that point on."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from lineage_store_database_management_system_spark.lineage import CheckViolation

    rng = random.Random(7)
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("a", T.LongType()),
            T.StructField("b", T.DoubleType()),
        ]
    )
    t = tmp_db.create_table_typed("bulk", schema, "k")
    oracle: dict[int, tuple[int, float]] = {}
    next_key = 0

    def ingest(n):
        nonlocal next_key
        rows = [(next_key + i, rng.randrange(100), float(rng.randrange(1000))) for i in range(n)]
        next_key += n
        for k, a, b in rows:
            oracle[k] = (a, b)
        t.ingest_dataframe(spark.createDataFrame(rows, schema))

    def verify():
        got = sorted((r["k"], r["a"], r["b"]) for r in t.current_view().collect())
        exp = sorted((k, a, b) for k, (a, b) in oracle.items())
        assert got == exp

    ingest(300)
    check_added = False
    for step in range(24):
        op = rng.random()
        if op < 0.30:
            keys = rng.sample(sorted(oracle), min(40, len(oracle)))
            col = rng.choice(["a", "b"])
            delta = [
                (k, rng.randrange(100) if col == "a" else float(rng.randrange(1000)))
                for k in keys
            ]
            t.bulk_update(
                spark.createDataFrame(delta, f"k long, {col} {'long' if col == 'a' else 'double'}")
            )
            for k, v in delta:
                a, b = oracle[k]
                oracle[k] = (v, b) if col == "a" else (a, float(v))
        elif op < 0.45:
            keys = rng.sample(sorted(oracle), min(25, len(oracle)))
            t.bulk_delete(spark.createDataFrame([(k,) for k in keys], "k long"))
            for k in keys:
                del oracle[k]
        elif op < 0.60:
            ingest(rng.randrange(20, 60))
        elif op < 0.70 and not check_added:
            t.add_check_constraint("b_nonneg", "b >= 0")
            check_added = True
        else:
            kind = rng.choice(["plain", "sort", "zorder"])
            if kind == "plain":
                t.compact()
            elif kind == "sort":
                t.compact(sort_by=["a"], n_files=4)
            else:
                t.compact(zorder_by=["a", "b"], n_files=4)
        if step % 4 == 3:
            verify()
    verify()
    if check_added:
        live = sorted(oracle)[0]
        with pytest.raises(CheckViolation):
            t.bulk_update(spark.createDataFrame([(live, -1.0)], "k long, b double"))
        verify()  # rejected write changed nothing
