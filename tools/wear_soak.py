"""30+ round wear soak at sf1 through Database.maintain() (VERDICT
r7/r8 item 7): every round mutates the table (dependent updates +
deletes + fresh inserts), runs the full maintenance pass (flush /
repair / auto-compact / optimize / index refresh / snapshot reclaim /
MV refresh), and checks invariants; vacuum_tail interleaves on its
own cadence. The failure mode hunted is bookkeeping drift that only
manifests generations in (a seq floor moving wrong after the Nth
vacuum, an index refresh missing a delta class, MV drift after a
group-key flip under compaction).

Invariants checked:
 - cheap, EVERY round: COUNT and SUM(o_totalprice) of the current
   view == closed-form model; aggregate-MV read == model per-group
   spot sums; indexed point_lookup == plain filtered view.
 - full, every 5 rounds + final: the complete (key -> price) map ==
   the driver-side model, plus a close/reopen re-check at the end.

Wear metrics per round (proving no degradation): wall time per phase,
live base/tail file counts, tail rows past TPS. Results appended to
stdout as one JSON line per round; summarize into SCALING.md.

Usage: python tools/wear_soak.py [rounds] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata",
        "sf1",
    )

    from pyspark.sql import functions as F

    from lineage_store_database_management_system_spark import (
        Database,
        get_spark,
        indexing,
    )

    spark = get_spark(app_name="wear-soak", cpus=16, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    src = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="lss_wear_")
    db = Database().open(root, spark)
    t = db.create_table_typed("orders", src.schema, "o_orderkey")
    t.ingest_dataframe(src)
    indexing.build_secondary_index(t, "o_custkey", n_buckets=32)
    db.create_aggregate_mv(
        "mv_status", "orders", ["o_orderstatus"], {"sum_price": "o_totalprice"}
    )

    # driver-side model: key -> (custkey, status, price)
    model = {
        r["o_orderkey"]: [r["o_custkey"], r["o_orderstatus"], r["o_totalprice"]]
        for r in src.collect()
    }
    max_key = max(model)
    probe_cust = next(iter(model.values()))[0]

    def cheap_checks(rnd: int) -> None:
        row = t.current_view().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("s"),
        ).collect()[0]
        want_n = len(model)
        want_s = round(sum(v[2] for v in model.values()), 2)
        assert row["n"] == want_n, f"r{rnd}: count {row['n']} != {want_n}"
        got_s = round(float(row["s"]), 2)
        assert abs(got_s - want_s) < 0.05, f"r{rnd}: sum {got_s} != {want_s}"
        # MV vs model for one group
        g = "O"
        mv = {
            r["o_orderstatus"]: (r["n"], round(float(r["sum_price"]), 2))
            for r in db.materialized_view("mv_status").collect()
        }
        wn = sum(1 for v in model.values() if v[1] == g)
        ws = round(sum(v[2] for v in model.values() if v[1] == g), 2)
        assert mv.get(g, (0, 0.0))[0] == wn, f"r{rnd}: MV count {mv.get(g)} != {wn}"
        assert abs(mv.get(g, (0, 0.0))[1] - ws) < 0.05, f"r{rnd}: MV sum"
        # indexed dispatch vs model
        got = sorted(
            r["o_orderkey"]
            for r in t.point_lookup("o_custkey", probe_cust)
            .select("o_orderkey")
            .collect()
        )
        want = sorted(k for k, v in model.items() if v[0] == probe_cust)
        assert got == want, f"r{rnd}: indexed lookup {len(got)} != {len(want)}"

    def full_check(rnd: int) -> None:
        got = {
            r["o_orderkey"]: round(r["o_totalprice"], 6)
            for r in t.current_view()
            .select("o_orderkey", "o_totalprice")
            .collect()
        }
        want = {k: round(v[2], 6) for k, v in model.items()}
        assert got == want, (
            f"r{rnd}: full state diverged — {len(got)} vs {len(want)} rows, "
            f"{len(set(got.items()) ^ set(want.items()))} differing entries"
        )

    pinned: dict[str, tuple[int, float]] = {}  # ref -> (count, sum)
    for rnd in range(rounds):
        rep: dict = {"round": rnd}
        mod = 7 + (rnd % 11)
        t0 = time.time()
        # dependent update: touched keys get price = price + rnd + 1
        upd = (
            t.current_view()
            .where(F.col("o_orderkey") % mod == 0)
            .select(
                "o_orderkey",
                (F.col("o_totalprice") + (rnd + 1)).alias("o_totalprice"),
            )
        )
        t.bulk_update(upd)
        for k, v in model.items():
            if k % mod == 0:
                v[2] = v[2] + rnd + 1
        # group-key flip for a thin slice (exercises MV group moves)
        flip = (
            t.current_view()
            .where(F.col("o_orderkey") % 97 == rnd % 97)
            .select(
                "o_orderkey",
                F.lit("F" if rnd % 2 == 0 else "O").alias("o_orderstatus"),
            )
        )
        t.bulk_update(flip)
        for k, v in model.items():
            if k % 97 == rnd % 97:
                v[1] = "F" if rnd % 2 == 0 else "O"
        # delete a small slice, reinsert it next round under new keys
        del_keys = [k for k in model if k % 211 == rnd % 211]
        t.bulk_delete(
            spark.createDataFrame([(k,) for k in del_keys], "o_orderkey long")
        )
        for k in del_keys:
            model.pop(k)
        ins = [
            (max_key + rnd * 1000 + i + 1, 1 + i, "N", float(100 + rnd))
            for i in range(200)
        ]
        t.ingest_dataframe(spark.createDataFrame(ins, src.schema))
        for k, c, s, p in ins:
            model[k] = [c, s, p]
        rep["mutate_s"] = round(time.time() - t0, 2)

        t0 = time.time()
        rep["maintain"] = {
            k: v
            for k, v in db.maintain(
                max_stale_deltas=50_000,
                optimize_target_bytes=32 << 20 if rnd % 6 == 5 else None,
            )["orders"].items()
            if k != "repair"
        }
        if rnd % 7 == 6:
            t.vacuum_tail()
            rep["vacuumed"] = True
        rep["maintain_s"] = round(time.time() - t0, 2)

        # named-ref durability under wear (round-9 third continuation):
        # pin a tag every 8 rounds; EVERY later round each tag must
        # still answer its frozen count+sum through whatever
        # compaction / vacuum / optimize has happened since.
        if rnd % 8 == 3:
            name = f"soak-r{rnd}"
            t.create_ref(name)
            pinned[name] = (
                len(model),
                round(sum(v[2] for v in model.values()), 2),
            )
        for name, (wn, ws) in pinned.items():
            row = (
                t.snapshot_at_ref(name)
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("s"),
                )
                .collect()[0]
            )
            assert row["n"] == wn, f"r{rnd}: ref {name} count {row['n']} != {wn}"
            assert abs(round(float(row["s"]), 2) - ws) < 0.05, (
                f"r{rnd}: ref {name} sum drifted"
            )
        rep["refs_checked"] = len(pinned)

        t0 = time.time()
        cheap_checks(rnd)
        if rnd % 5 == 4:
            full_check(rnd)
            rep["full_check"] = True
        rep["check_s"] = round(time.time() - t0, 2)
        rep["base_files"] = len(t.filelog.live("base") or [])
        rep["tail_files"] = len(t.filelog.live("tail") or [])
        rep["tail_rows_past_tps"] = (
            t.tail_df().where(F.col("_seq") > t.manifest.tps).count()
        )
        print(json.dumps(rep), flush=True)

    # closing: reopen from disk and re-verify the full state
    db2 = Database().open(root, spark)
    t2 = db2.get_table("orders")
    got = {
        r["o_orderkey"]: round(r["o_totalprice"], 6)
        for r in t2.current_view().select("o_orderkey", "o_totalprice").collect()
    }
    want = {k: round(v[2], 6) for k, v in model.items()}
    assert got == want, "reopen state diverged"
    print(json.dumps({"result": "PASS", "rounds": rounds, "rows": len(model)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
