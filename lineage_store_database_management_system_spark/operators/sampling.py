"""Dataset-curation sampling operators for training-data pipelines.

The reference has no sampling of any kind (SURVEY §2.6); these are
extension-layer operators sized for the 100 TB corpus case:

- deterministic_split : reproducible train/val/test assignment from a
  stable key — pure arithmetic on the key, no RNG state, so the split
  is identical across runs, partitionings, and engines, and a document
  never migrates between splits when the corpus is re-processed.
- cap_per_group       : keep at most N rows per group (domain/source
  caps — the standard guard against one crawl domain dominating a
  pretraining mix). One window over the group key; deterministic
  order by the id column.
- stratified_fraction : per-stratum deterministic fraction (e.g. 10%
  of every language) — same key arithmetic, applied within strata.

All three are single-shuffle (or shuffle-free for the splits) and
stay entirely in JVM expressions. At real scale the split key should
be a content-stable id (e.g. xxhash64 of a canonical url), not a
dense sequence — the arithmetic is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def deterministic_split(
    df: DataFrame,
    key_col: str,
    buckets: int = 100,
    train: int = 80,
    val: int = 10,
) -> DataFrame:
    """Adds a `split` column: bucket = pmod(key, buckets); [0, train)
    -> 'train', [train, train+val) -> 'val', rest -> 'test'. No
    shuffle: the assignment is a projection. ``pmod`` (not ``%``)
    because split keys are typically signed hashes (xxhash64) and
    Spark's ``%`` follows the dividend's sign — a plain modulo would
    send every negative key to 'train'."""
    b = F.pmod(F.col(key_col), F.lit(buckets))
    return df.withColumn(
        "split",
        F.when(b < train, F.lit("train"))
        .when(b < train + val, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def cap_per_group(
    df: DataFrame, group_col: str, id_col: str, max_rows: int
) -> DataFrame:
    """At most ``max_rows`` rows per group, keeping the smallest ids
    (deterministic). Compiles to a single window with WindowGroupLimit
    pushdown — Spark stops ranking beyond the cap per partition, so
    the cost is one shuffle on the group key, not a full sort."""
    w = Window.partitionBy(group_col).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_rows)
        .drop("_rn")
    )


def stratified_fraction(
    df: DataFrame, stratum_col: str, key_col: str, percent: int, buckets: int = 100
) -> DataFrame:
    """Deterministic ~percent% of every stratum: keep rows whose
    key bucket falls below ``percent``. Because the predicate is
    per-row arithmetic, sampling is a filter (pushdown-friendly),
    never a shuffle; strata are preserved exactly (no variance in
    which rows are kept, unlike RNG-based sampleBy). ``pmod`` keeps
    signed hash keys in [0, buckets)."""
    return df.where(F.pmod(F.col(key_col), F.lit(buckets)) < percent)


# 16-bit Fibonacci-style multiplicative scramble: cheap, engine-
# portable (plain BIGINT arithmetic, never overflows 63 bits), and
# decorrelates dense ids from the keep threshold. 40503 is the
# 16-bit multiplier from Knuth TAOCP vol 3 §6.4.
_MIX_BUCKETS = 65536
_MIX_MULT = 40503


def _scramble16(key):
    return F.pmod(F.pmod(key, F.lit(_MIX_BUCKETS)) * F.lit(_MIX_MULT), F.lit(_MIX_BUCKETS))


def domain_mixture(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    n_tokens_col: str,
    weights: dict[str, float],
    budget_tokens: int,
    default_weight: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic domain-mixture downsampling: given per-domain mix
    weights and a total token budget, each domain's target is
    ``budget * w_d / sum(w)`` tokens; domains over target are thinned
    to ``frac_d = target_d / tokens_d`` (capped at 1), domains under
    target are kept whole (no upsampling — repeat-epoch logic lives in
    the trainer, not the corpus store).

    Returns ``(kept_rows, plan)`` where ``plan`` is the per-domain
    summary ``(domain, n_docs, n_tokens, target_frac, n_kept,
    kept_tokens)``. The keep decision is per-row arithmetic on a
    16-bit scramble of the id — reproducible across runs,
    partitionings, and engines; the plan side is one aggregate over
    (domain, tokens) plus a broadcast join of the tiny per-domain
    fraction table back onto the corpus."""
    wexpr = F.lit(float(default_weight))
    for d, w in weights.items():
        wexpr = F.when(F.col(domain_col) == d, F.lit(float(w))).otherwise(wexpr)

    per_domain = df.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens_col).cast("long").alias("n_tokens"),
    )
    # weight mass of the domains actually PRESENT — a window over the
    # tiny per-domain table, so targets always sum to the budget
    wsum = F.sum(wexpr).over(Window.partitionBy())
    frac = F.least(
        F.lit(1.0),
        (F.lit(float(budget_tokens)) * wexpr / wsum) / F.col("n_tokens"),
    )
    per_domain = per_domain.withColumn("target_frac", frac)

    keep = _scramble16(F.col(id_col)) < F.col("target_frac") * F.lit(_MIX_BUCKETS)
    kept = df.join(
        F.broadcast(per_domain.select(domain_col, "target_frac")), on=domain_col
    ).where(keep)

    plan = (
        per_domain.join(
            kept.groupBy(domain_col).agg(
                F.count(F.lit(1)).alias("n_kept"),
                F.sum(n_tokens_col).cast("long").alias("kept_tokens"),
            ),
            on=domain_col,
            how="left",
        )
        .select(
            F.col(domain_col),
            "n_docs",
            "n_tokens",
            F.round("target_frac", 6).alias("target_frac"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("kept_tokens", F.lit(0)).cast("long").alias("kept_tokens"),
        )
    )
    return kept.drop("target_frac"), plan


def proportional_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    total_k: int,
) -> DataFrame:
    """Draw EXACTLY ``min(total_k, count(df))`` rows allocated across
    groups proportionally to group size by the CAPPED largest-remainder
    (Hamilton) method: floor quotas first, leftover seats to the
    largest fractional remainders (group key ascending on ties), and
    any group whose quota exceeds its row count is capped at its size
    with the freed seats redistributed among the uncapped groups —
    iterated until every quota fits, so the global budget is met
    exactly whenever the corpus is large enough. All-integer
    arithmetic (quota numerators and remainders, never float shares),
    so the allocation is a pure function of the counts. When no group
    is undersized this reduces to plain Hamilton.

    Within each group the selected rows are the ``k_g`` smallest by
    ``(md5(id), id)`` — a deterministic, engine-portable stand-in for
    a uniform draw (md5 scrambles id locality; ties impossible but
    id-broken anyway).

    Scale shape: counts are one partial-aggregated pass collected to
    the driver — the allocation frame is |groups| rows, the same
    broadcast-sized frame every variant of this operator materializes
    (the capped redistribution is a data-dependent fixpoint, ≤|groups|
    cheap integer rounds, driver-side by design); selection is one
    row_number window per group partition — the same shuffle the
    grouped top-k (cap_per_group) pays. Returns the selected rows
    (id, group)."""
    from pyspark.sql import Window
    from pyspark.sql.types import LongType, StructField, StructType

    counts = {
        r[0]: r[1]
        for r in df.groupBy(F.col(group_col))
        .agg(F.count(F.lit(1)).alias("_ng"))
        .collect()
    }
    if not counts:
        empty = df.select(F.col(id_col), F.col(group_col))
        return empty.where(F.lit(False))
    # capped Hamilton fixpoint: allocate k over the still-uncapped
    # groups proportionally to their sizes; cap overflowing groups at
    # size and repeat with the freed seats. Each round caps >=1 group,
    # so it terminates in <=|groups| rounds of pure integer math.
    active = dict(counts)
    quota: dict = {}
    k = min(int(total_k), sum(counts.values()))
    while active and k > 0:
        tot = sum(active.values())
        fl = {g: (k * n) // tot for g, n in active.items()}
        rem = {g: (k * active[g]) % tot for g in active}
        extra = k - sum(fl.values())
        order = sorted(active, key=lambda g: (-rem[g], g))
        prop = {
            g: fl[g] + (1 if i < extra else 0) for i, g in enumerate(order)
        }
        over = [g for g in active if prop[g] > active[g]]
        if not over:
            quota.update(prop)
            break
        for g in over:
            quota[g] = active[g]
            k -= active[g]
            del active[g]
    quotas = df.sparkSession.createDataFrame(
        [(g, int(kg)) for g, kg in quota.items() if kg > 0],
        StructType([df.schema[group_col], StructField("_kg", LongType())]),
    )
    w = Window.partitionBy(F.col(group_col)).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    ranked = df.select(F.col(id_col), F.col(group_col)).withColumn(
        "_rn", F.row_number().over(w)
    )
    return (
        ranked.join(F.broadcast(quotas), on=group_col)
        .where(F.col("_rn") <= F.col("_kg"))
        .select(F.col(id_col), F.col(group_col))
    )


def epoch_shuffle(
    df: DataFrame, id_col: str, seed: int, n_shards: int
) -> DataFrame:
    """Deterministic epoch shuffle + shard assignment — the
    reproducible data-ordering a training run needs ("epoch 3 of run
    X read shard 5 in exactly this order", replayable on any engine):
    order key = md5(seed:id) (engine-portable pseudo-randomness, a new
    permutation per seed), shard = hash-prefix % n_shards, position =
    rank within shard. Plan shape: map-only key computation, ONE
    shuffle on the shard id, rank within shard (at scale: write with
    repartition(shard) + sortWithinPartitions — the rank is then free
    at read time). Returns (shard, pos, id_col)."""
    h = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    out = df.select(
        F.col(id_col),
        h.alias("_h"),
        (
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
            % F.lit(n_shards)
        ).cast("int").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy(F.col("_h"), F.col(id_col))
    return out.select(
        "shard", F.row_number().over(w).alias("pos"), id_col
    )
