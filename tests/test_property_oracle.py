"""Lineage property test (SURVEY §5.2 item 2 / FIXTURES.md A2):
replay a random-but-seeded interleaving of insert/update/delete/
increment/select/select_version through the Query API against a
pure-Python oracle of per-key version lists; verify every read, then
verify the Spark current view matches the oracle's final state — at
an arbitrary compaction point (merge must never change an answer)."""

import random

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
