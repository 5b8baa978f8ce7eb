"""Physical-plan audit: dump the formatted Catalyst plan of every
headline query plus automated checks that the plan has the shape we
designed for at 100 TB — filters pushed to the scan, dimensions
broadcast, top-k compiled to TakeOrderedAndProject, no stray
row-at-a-time Python.

Usage: python tools/plan_audit.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (workload, [required plan fragments], [forbidden plan fragments])
AUDIT = [
    ("pq_select_point", ["PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,7)]"], ["BatchEvalPython"]),
    ("pq_sum_range", ["PushedFilters"], ["BatchEvalPython"]),
    ("ext_q1_pricing_summary", ["HashAggregate"], ["SortMergeJoin"]),
    ("ext_q3_shipping_priority", ["BroadcastHashJoin", "TakeOrderedAndProject"], ["SortMergeJoin"]),
    ("ext_q5_region_revenue", ["BroadcastHashJoin"], ["SortMergeJoin"]),
    ("ext_q6_forecast_revenue", ["PushedFilters"], ["Exchange hashpartitioning"]),
    ("ext_q19_disjunctive_join", ["BroadcastHashJoin"], []),
    ("ext_window_topn_per_customer", ["WindowGroupLimit"], []),
    ("ds_dedup_exact", ["xxhash64"], ["BatchEvalPython"]),
    ("ds_embedding_topk", ["TakeOrderedAndProject"], ["BatchEvalPython"]),
    ("ext_bucketed_join_agg", ["SortMergeJoin"], ["Exchange"]),
    ("ext_q7_nation_volume", ["BroadcastHashJoin"], ["SortMergeJoin"]),
    ("ext_q8_market_share", ["BroadcastHashJoin"], ["SortMergeJoin"]),
    ("ext_q9_product_profit", ["BroadcastHashJoin"], ["SortMergeJoin"]),
    ("ext_q12_late_shipping", ["BroadcastHashJoin"], ["SortMergeJoin"]),
    ("ext_q13_customer_distribution", ["HashAggregate"], ["BatchEvalPython"]),
    ("ext_q15_top_supplier", ["PushedFilters"], ["BatchEvalPython"]),
    ("ext_q16_supplier_count", ["BroadcastHashJoin", "HashAggregate"], ["SortMergeJoin"]),
    ("ext_q17_small_quantity_revenue", ["BroadcastHashJoin"], ["SortMergeJoin"]),
    ("ext_q21_blocking_supplier", ["TakeOrderedAndProject"], ["BatchEvalPython"]),
    ("ext_q22_idle_customers", ["LeftAnti"], ["BatchEvalPython"]),
    # round-3 additions. ds_chunk_documents must stay a map-only
    # generate stage (no shuffle); ds_ivf_full_probe's only Python is
    # the Arrow-batched list-assignment UDF, and the final rank is
    # top-k, not a global sort.
    ("ds_chunk_documents", ["Generate"], ["Exchange", "BatchEvalPython"]),
    ("ds_tfidf_top_terms", ["Window", "HashAggregate"], ["BatchEvalPython"]),
    ("ds_ivf_full_probe", ["TakeOrderedAndProject"], ["BatchEvalPython"]),
    # round-4 additions. The indexed lookups must push the candidate
    # rid set into the scans; the gated ANN workloads keep the exact
    # side a top-k (TakeOrderedAndProject), never a global sort; no
    # row-at-a-time Python anywhere.
    ("pq_indexed_lookup", ["_rid"], ["BatchEvalPython"]),
    ("pq_indexed_range_lookup", ["_rid"], ["BatchEvalPython"]),
    ("ds_embedding_lsh_topk", ["TakeOrderedAndProject"], ["BatchEvalPython"]),
    ("ds_embedding_ivf_topk", ["TakeOrderedAndProject"], ["BatchEvalPython"]),
    ("ds_winnowing_fingerprints", ["lambdafunction"], ["BatchEvalPython"]),
    # The LATERAL subquery must decorrelate to a ranked window join
    # (per-row re-execution would be a nested loop); reading a
    # materialized view must be a bare parquet scan — zero join or
    # aggregate work at read time; boilerplate removal stays
    # JVM-side end to end.
    ("ext_lateral_topk_per_nation", ["WindowGroupLimit", "BroadcastHashJoin"], ["BatchEvalPython"]),
    ("pq_materialized_view", ["Scan parquet"], ["Join", "HashAggregate", "BatchEvalPython"]),
    ("ds_boilerplate_lines", ["Generate", "HashAggregate"], ["BatchEvalPython"]),
    # round-5 additions. Substring dedup stays JVM-side (explode +
    # hash aggregate, window hashes never text). The incremental
    # dedup result is a checkpointed RDD scan BY DESIGN (the answer
    # is pinned before the store append — refreshByPath would
    # recompute a live plan against the updated store). The rollup
    # query must push the seal predicate into the raw scan. Bloom
    # probing must be the Arrow path (ArrowEvalPython), never
    # row-at-a-time (BatchEvalPython).
    ("ds_substring_dedup", ["Generate", "HashAggregate"], ["BatchEvalPython"]),
    ("ds_incremental_dedup", ["Scan ExistingRDD"], ["BatchEvalPython"]),
    ("ext_rollup_realtime_agg", ["GreaterThanOrEqual(ts", "HashAggregate"], ["BatchEvalPython"]),
    ("ds_bloom_decontaminate", ["ArrowEvalPython", "xxhash64"], ["BatchEvalPython"]),
    # Gopher rules must stay one map-only projection (no shuffle at
    # all); PQ's exact-refine side compiles to top-k and its only
    # Python is the Arrow-batched encode/ADC kernels; sketch rollups
    # are aggregates end to end.
    ("ds_gopher_quality", [], ["Exchange", "BatchEvalPython"]),
    ("ds_embedding_pq_topk", ["TakeOrderedAndProject", "ArrowEvalPython"], ["BatchEvalPython"]),
    ("ext_rollup_distinct_sketch", ["HashAggregate"], ["BatchEvalPython"]),
    # quantile rollup: sealed sketch is a bare scan + hash agg; the
    # 2-row q-list join must broadcast (non-equi rank filter -> BNLJ);
    # the est-vs-exact SMJ is gate apparatus (bucket-count-scaling,
    # AQE-decided per the size-based join policy); no Python anywhere
    ("ext_rollup_quantile_sketch", ["HashAggregate", "BroadcastNestedLoopJoin"], ["BatchEvalPython"]),
    # daily regroup reads ONLY the sealed sketch + tail sketch; no raw
    # re-read beyond the tail predicate; no Python
    ("ext_rollup_quantile_daily", ["HashAggregate"], ["BatchEvalPython"]),
    # BPE stats fold to the distinct vocab first (two-level agg), and
    # the top-k compiles to TakeOrderedAndProject; all Catalyst
    ("ds_bpe_pair_stats", ["HashAggregate", "TakeOrderedAndProject"], ["BatchEvalPython"]),
    # merge round: learned pair is a 1-row broadcast onto the vocab
    ("ds_bpe_merge_round", ["TakeOrderedAndProject"], ["BatchEvalPython", "SortMergeJoin"]),
    # payload near-dup: pigeonhole equi-join (never a cartesian);
    # only the shared bit-vote kernel is (Arrow) Python
    ("mm_payload_neardup", ["ArrowEvalPython"], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    # join MV read = lineage current view of the MV table (fold join
    # broadcast when the delta side is small); no Python, no cartesian
    ("pq_incremental_join_mv", ["Scan parquet"], ["BatchEvalPython", "CartesianProduct"]),
    # The salted broadcast join must really broadcast (its whole
    # point is no shuffle of the hot left side); the bucketized
    # interval join is explode + equi-join, never a nested-loop
    # range join; sliding windows stay one aggregate after the
    # window-explode projection.
    ("ds_skew_salted_join", ["BroadcastHashJoin"], ["SortMergeJoin", "BatchEvalPython"]),
    ("ext_interval_bucketized", ["Generate", "HashAggregate"], ["BroadcastNestedLoopJoin", "BatchEvalPython"]),
    ("ext_sliding_windows", ["HashAggregate"], ["BatchEvalPython"]),
    ("ds_knn_join", ["WindowGroupLimit"], ["BatchEvalPython"]),
    # Round-5 late additions. BM25's final rank must compile to top-k
    # (TakeOrderedAndProject), never a global sort; heavy hitters'
    # only Python is the Arrow-batched CMS probe and the confirm step
    # is a hash aggregate; the gap-fill grid comes from an exploded
    # sequence (Generate) + per-key window, never a nested-loop range
    # join; the time-weighted average is window + aggregate end to
    # end; SemDeDup's only Python is the Arrow-batched cluster
    # assignment and the pair stage must never degrade to a cartesian
    # product.
    ("ds_bm25_topk", ["TakeOrderedAndProject"], ["BatchEvalPython"]),
    ("ds_heavy_hitters", ["ArrowEvalPython", "HashAggregate"], ["BatchEvalPython"]),
    ("ext_gapfill_locf", ["Generate", "Window"], ["BatchEvalPython", "BroadcastNestedLoopJoin"]),
    ("ext_time_weighted_avg", ["Window", "HashAggregate"], ["BatchEvalPython"]),
    ("ds_semantic_dedup", ["ArrowEvalPython"], ["BatchEvalPython", "CartesianProduct"]),
    # Q20 keeps the part filter broadcast and the excess test inside
    # one conditional aggregate (no second lineitem scan, no SMJ);
    # the composed pretraining pipeline's only Python is the
    # Arrow-batched Bloom probe; the star-CC variant stays JVM-side.
    ("ext_q20_excess_inventory", ["BroadcastHashJoin", "HashAggregate"], ["SortMergeJoin", "BatchEvalPython"]),
    ("ds_pretrain_pipeline", ["ArrowEvalPython", "HashAggregate"], ["BatchEvalPython", "CartesianProduct"]),
    ("ds_dup_clusters_star", ["HashAggregate"], ["BatchEvalPython"]),
    # Round-6 additions. The refined-codebook IVF keeps the exact side
    # a top-k and its only Python is the Arrow-batched list assignment
    # (codebook training ran BEFORE the audited plan — its Lloyd
    # passes are separate bounded mapInPandas jobs); the substring
    # window stage must hash inside the array (one Generate, no
    # per-window array replication shows as plan-identical but is
    # pinned by the SCALING.md probe instead).
    ("ds_embedding_ivf_refined_topk", ["TakeOrderedAndProject", "ArrowEvalPython"], ["BatchEvalPython"]),
    # Batch ANN: per-query top-k must be a grouped window limit (not a
    # global sort), probes assigned by the Arrow kernel, and the
    # data-x-queries pairing an equi-join on the list id — never a
    # cartesian product (the exact gate side's broadcast cross join is
    # BroadcastNestedLoop, which stays allowed as gate apparatus).
    ("ds_embedding_ivf_batch_topk", ["WindowGroupLimit", "ArrowEvalPython"], ["CartesianProduct", "BatchEvalPython"]),
    # BPE encode: training jobs run before the audited plan; the
    # encode itself must be ONE Arrow map-only pass over the corpus
    # scan — zero shuffle, zero row-at-a-time Python.
    ("ds_bpe_encode_tokens", ["ArrowEvalPython"], ["Exchange", "BatchEvalPython"]),
    # Grown (build+append) ANN index: the gated plan's exact side is
    # a top-k; index build/append jobs run before the audited plan.
    ("ds_embedding_index_append_topk", ["TakeOrderedAndProject"], ["BatchEvalPython", "CartesianProduct"]),
    # Maintained (drift->retrain->swap) ANN index: same gated-plan
    # shape as the other index workloads; staleness/rebuild jobs run
    # before the audited plan.
    ("ds_embedding_ivf_pq_maintained_topk", ["TakeOrderedAndProject"], ["BatchEvalPython", "CartesianProduct"]),
    # Keep-best dedup: one digest-keyed aggregate (struct max -> no
    # mutable-buffer hash impl -> SortAggregate, still partial
    # map-side), never a window sort over the corpus; all Catalyst.
    ("ds_dedup_keep_best", ["SortAggregate", "xxhash64"], ["Window", "BatchEvalPython"]),
    # Recursive hierarchy: the audited plan is the CONVERGED state
    # read (pointer-jump rounds ran before it, each localCheckpointed)
    # — a checkpointed-RDD scan with zero residual join/Python work.
    ("ext_recursive_hierarchy", ["Scan ExistingRDD"], ["BatchEvalPython"]),
    # KMV overlap: sketch arithmetic is Catalyst array functions over
    # broadcast one-row-per-group frames; the exact twin's pair join
    # is a hash equi-join on the digest; no Python anywhere, and the
    # pair stage must never degrade to a cartesian product.
    ("ds_kmv_overlap", ["xxhash64", "HashAggregate"], ["BatchEvalPython", "CartesianProduct"]),
    # CDC chunking must stay map-only: one Generate streaming chunks
    # out of the scan, no shuffle, no Python.
    ("ds_chunk_cdc", ["Generate"], ["Exchange", "BatchEvalPython"]),
    # PageRank: audited plan is the converged integer-mass state
    # (iterations localCheckpointed before it) — zero residual work.
    ("ext_pagerank_nations", ["Scan ExistingRDD"], ["BatchEvalPython"]),
    # EWMA / funnel: one grouping aggregate (collect_list ->
    # ObjectHashAggregate) + array fold; no UDF, no window, no
    # second shuffle.
    ("ext_ewma_per_user", ["ObjectHashAggregate"], ["BatchEvalPython", "Window"]),
    ("ext_funnel_conversion", ["ObjectHashAggregate"], ["BatchEvalPython", "Window"]),
    # TV drift: token shuffle + term-keyed equi-join; broadcast totals;
    # never a cartesian or full-outer per pair.
    ("ds_source_drift_tv", ["HashAggregate", "BroadcastHashJoin"], ["BatchEvalPython", "CartesianProduct"]),
    # Chunk-level corpus dedup: digest-keyed winner election
    # (struct-min SortAggregate, partial map-side) + equi-join back;
    # never a cartesian, no Python.
    ("ds_chunk_dedup_corpus", ["Generate", "SortAggregate"], ["BatchEvalPython", "CartesianProduct"]),
    # Schema evolution: the gated read is a plain current-view fold —
    # schema-directed scans (old files NULL-fill the added column),
    # no Python, no cartesian.
    ("pq_schema_evolution", ["Scan parquet"], ["BatchEvalPython", "CartesianProduct"]),
    # r7: widen+rename evolution must stay a pure schema-directed scan
    # (physical->logical aliasing adds Project nodes, never Python or
    # a join); decode is one fused Arrow stage, no shuffle in sight
    ("pq_schema_evolution_widen_rename", ["Scan parquet"], ["BatchEvalPython", "CartesianProduct"]),
    ("mm_decode_image_stats", ["MapInPandas"], ["BatchEvalPython", "Exchange hashpartitioning"]),
    # Triangle counting: degree-oriented wedge enumeration — the
    # wedge stage is an equi-join on the low corner (hash or SMJ on
    # src with the rank inequality as a post-filter), the closing
    # edge an equi-join on (y,z); a cartesian anywhere means the
    # orientation was lost. All Catalyst.
    ("ext_triangle_count", ["HashAggregate"], ["BatchEvalPython", "CartesianProduct"]),
    # r7: Unicode dedup is one Arrow map stage (NFC has no Catalyst
    # expression — ArrowEvalPython is the DESIGNED shape here, the
    # forbidden form is row-at-a-time Python) feeding a digest
    # hash-aggregate; only (digest, id) reach the exchange, never text.
    ("ds_dedup_unicode", ["ArrowEvalPython", "xxhash64", "HashAggregate"], ["BatchEvalPython", "Join"]),
    # r7: ORC round-trip must read back through a native columnar ORC
    # scan (no Python anywhere) into a two-phase hash aggregate.
    ("ext_orc_roundtrip", ["Scan orc", "HashAggregate"], ["BatchEvalPython", "Join"]),
    # r7: text-format round-trip reads back through native csv/json
    # scans with the EXPLICIT schema (no inference job in the plan).
    ("ext_csv_json_roundtrip", ["Scan csv", "Scan json", "HashAggregate"], ["BatchEvalPython"]),
    # r9: manifest-log file skipping — the range read plans its base
    # scan from the file log's per-file key min/max (no directory
    # listing); the scan stays native parquet, no Python. The actual
    # skip ratio is asserted by the FILE-SKIPPING PROBE section that
    # main() appends after the fragment checks (a plan string does
    # not expose file counts).
    ("pq_manifest_skip_range", ["Scan parquet"], ["BatchEvalPython"]),
    # r9: index-aware dispatch — the non-key point lookup must route
    # through the secondary index (rid catch-up set visible as a _rid
    # predicate on the base/tail scans), never a full unpruned fold.
    ("pq_index_dispatch_lookup", ["_rid"], ["BatchEvalPython"]),
    # r9: URL canonicalization is a pure Catalyst regexp chain fused
    # into the scan; the ONLY exchange is the canonical-key hash
    # aggregate (same shape as dedup_exact) — no Python, no join.
    ("ds_url_canonical_dedup", ["regexp_replace", "HashAggregate"], ["BatchEvalPython", "Join"]),
    # r9: absolute-time travel is one _ts filter on each side of the
    # standard base/tail fold — native parquet scans, no Python, no
    # cartesian; the _ts predicate must reach the scans.
    ("pq_snapshot_as_of", ["Scan parquet", "_ts"], ["BatchEvalPython", "CartesianProduct"]),
    # r9: the restored table reads as a plain current-view fold; the
    # compensating writes happened at scenario build — zero residual
    # join/Python work in the gated read.
    ("pq_restore_as_of", ["Scan parquet"], ["BatchEvalPython", "CartesianProduct"]),
    # r9 continuation: metadata-only COUNT — the base side is a
    # driver-side sum over the file log, so the PLAN must contain no
    # join at all (only the tail tombstone aggregate reaches Spark;
    # the no-base-files-opened property is asserted inside the
    # workload via inputFiles()).
    ("pq_count_metadata_only", ["HashAggregate"], ["Join", "BatchEvalPython"]),
    # r9 continuation: commit-pinned travel — log replay happens
    # driver-side; the plan is the standard base/tail fold over the
    # as-of file set: native parquet scans, no Python, no cartesian.
    ("pq_snapshot_at_commit", ["Scan parquet"], ["BatchEvalPython", "CartesianProduct"]),
    # r9 continuation 2: OPTIMIZE-packed table reads as a plain
    # current-view fold over the packed files — native scans, no
    # Python; the files_after < files_before property is asserted
    # inside the workload from optimize_files' own accounting.
    ("pq_optimize_invariance", ["Scan parquet", "HashAggregate"], ["BatchEvalPython", "CartesianProduct"]),
    # Stats-driven MIN/MAX with planted tail extremes reads ZERO base
    # bytes: the returned frame is literals over range(1) — the plan
    # must contain NO parquet scan at all (scan accounting asserted
    # in-workload via last_fast_minmax).
    ("pq_fast_min_max", [], ["Scan parquet", "BatchEvalPython", "Join"]),
    # Named-ref read: the standard fold over the ref's hardlinked
    # file set — native parquet scans, no Python, no cartesian.
    ("pq_ref_travel", ["Scan parquet"], ["BatchEvalPython", "CartesianProduct"]),
    # Row provenance: base (rid, file) projection + BROADCAST
    # file->commit map + rid-keyed join onto the fold; never a
    # cartesian, no Python, and the tiny map must not shuffle-join.
    ("pq_row_provenance", ["BroadcastHashJoin"], ["BatchEvalPython", "CartesianProduct"]),
    # General-column data skipping over the z-ordered snapshot: the
    # kept files scan natively with the row filter pushed down; the
    # skip ratio is asserted in-workload (last_scan_bounds).
    ("pq_zorder_skip", ["Scan parquet", "PushedFilters"], ["BatchEvalPython", "CartesianProduct"]),
    # DSIR: token explode (Generate) -> bucket/doc hash aggregates,
    # log-ratio model broadcast back; top-k compiles to
    # TakeOrderedAndProject, never a global sort; all Catalyst.
    ("ds_dsir_select", ["Generate", "HashAggregate", "TakeOrderedAndProject"], ["BatchEvalPython", "CartesianProduct"]),
    # Cluster-balanced sampling: map-only sign signatures (zip_with
    # fold), ONE bucket shuffle with the quota compiled to a grouped
    # window limit; no Python, no join.
    ("ds_cluster_balanced_sample", ["WindowGroupLimit"], ["BatchEvalPython", "Join"]),
    # WAV decode: plant and decode fuse into Arrow map stages over the
    # scan — zero shuffle, zero row-at-a-time Python.
    ("mm_decode_wav_stats", ["MapInPandas"], ["BatchEvalPython", "Exchange hashpartitioning"]),
    # Baseline-JPEG decode (r11): same fused Arrow map-only shape as
    # the PNG/WAV twins — Huffman+IDCT run inside the kernel, no
    # shuffle, no row-at-a-time Python.
    ("mm_decode_jpeg_stats", ["MapInPandas"], ["BatchEvalPython", "Exchange hashpartitioning"]),
    # Full MERGE: the gated read is a plain current-view fold (the
    # merge's classification join ran at scenario build) — native
    # scans, no Python, no cartesian.
    ("pq_merge_full", ["Scan parquet"], ["BatchEvalPython", "CartesianProduct"]),
    # File-inventory metadata table: driver-built from the log with
    # ZERO data I/O — the plan must contain no parquet scan at all.
    ("pq_files_metadata_table", [], ["Scan parquet", "BatchEvalPython"]),
    # Commit-pinned CDC: the feed scans exactly the window's tail
    # files (zero base files asserted in-workload) — native parquet,
    # no Python, no join at all.
    ("pq_cdc_by_commit", ["Scan parquet"], ["BatchEvalPython", "Join"]),
    # Partition drop is a pure log commit at scenario build; the gated
    # read is the standard fold over the surviving partitions — the
    # dropped status must NOT appear in the scan's partition filters
    # or paths (asserted by value-hash), and the plan stays native.
    ("pq_drop_partition", ["Scan parquet"], ["BatchEvalPython", "CartesianProduct"]),
    # Shallow clone: both sides read as plain folds over (partly
    # shared-inode) native scans; the clone walk ran at build time.
    ("pq_clone_independence", ["Scan parquet"], ["BatchEvalPython", "CartesianProduct"]),
    # Epoch shuffle: map-only md5 keys + ONE shard shuffle; the rank
    # is a plain window, all Catalyst.
    ("ds_epoch_shuffle", ["Window"], ["BatchEvalPython", "Join"]),
    # Contrastive mining: bucket-restricted equi-join (never a
    # cartesian), zip_with/aggregate cosine fold, per-anchor ranks.
    ("ds_contrastive_pairs", ["Window"], ["BatchEvalPython", "CartesianProduct"]),
    # SQL DML: the gated read is the standard fold after the
    # statement-driven mutations — native scans, no Python.
    ("pq_sql_dml", ["Scan parquet"], ["BatchEvalPython", "CartesianProduct"]),
    # Ref diff: one full-outer key join between the two pinned folds —
    # a hash/merge equi-join, never a cartesian, no Python.
    ("pq_ref_diff", ["Scan parquet"], ["BatchEvalPython", "CartesianProduct"]),
    # 2D z-order skipping: conjunctive bounds push into the kept
    # files' native scans; no Python, no cartesian.
    ("pq_zorder_skip_2d", ["Scan parquet", "PushedFilters"], ["BatchEvalPython", "CartesianProduct"]),
    # bloom skipping happens at PLANNING time (file-set restriction):
    # the returned plan is the ordinary fold over the ~3 kept files —
    # no Python, no cartesian; the sidecar probe is a separate tiny job
    ("pq_bloom_skip_lookup", ["Scan parquet"], ["BatchEvalPython", "CartesianProduct"]),
    # Filtered ANN: the gated exact path pushes the label predicate
    # into the parquet scan and ranks via top-k — never a global sort,
    # never row-Python (ivf_assign's Arrow kernel runs in the
    # adaptive branch only, not in the returned plan).
    ("ds_embedding_filtered_topk", ["TakeOrderedAndProject", "PushedFilters"], ["BatchEvalPython", "CartesianProduct"]),
    # Trigram search: the posting intersection runs as its own
    # bounded candidate job; the RETURNED plan must verify on the
    # candidates only — the id IN-list pushed into the docs scan
    # (file skipping prunes the text read), contains() JVM-side.
    # Left to Catalyst the contains() would commute below the join
    # and re-scan the whole corpus (the r11 fix this shape pins).
    ("ds_substring_search", ["In(doc_id", "StringContains"], ["BatchEvalPython", "CartesianProduct"]),
    # Expectations quarantine: the gated read is a native parquet
    # scan of the quarantine area — tagging/splitting happened at
    # ingest as one Catalyst projection, nothing row-at-a-time.
    ("pq_expectations_quarantine", ["Scan parquet"], ["BatchEvalPython", "CartesianProduct"]),
    # MaxSim: the whole late-interaction score is a map-only
    # projection (unrolled array_max/zip_with terms) + top-k — no
    # Python, no shuffle before the k-row merge.
    ("ds_maxsim_topk", ["TakeOrderedAndProject"], ["BatchEvalPython", "Exchange hashpartitioning", "CartesianProduct"]),
    # Interpolation gapfill: same dense-grid shape as LOCF — grid
    # explode + pre-aggregated observed side + per-key windows, all
    # Catalyst.
    ("ext_gapfill_interpolate", ["Window", "Generate"], ["BatchEvalPython", "CartesianProduct"]),
    # Incremental trigram search: same pruned-verify contract over
    # the persisted index (candidates from the folded posting scans,
    # id IN-list pushed into both corpus branches of the union).
    ("ds_incremental_trigram_search", ["In(doc_id", "StringContains"], ["BatchEvalPython", "CartesianProduct"]),
    # Durable filtered ANN: the gated exact path is a pushed-down
    # equality scan of the index parquet + top-k — label reaches the
    # reader, ranking never globally sorts.
    ("ds_embedding_filtered_index_topk", ["TakeOrderedAndProject", "PushedFilters"], ["BatchEvalPython", "CartesianProduct"]),
    # Streaming expectations: the gated read is a native scan of the
    # per-batch quarantine dirs; the split ran in foreachBatch as one
    # Catalyst projection per micro-batch.
    ("st_stream_expectations", ["Scan parquet"], ["BatchEvalPython", "CartesianProduct"]),
    # KMV distinct: the sketch merge is driver-side over O(files)
    # sidecar rows; the gated row is a local one-row result — no data
    # scan in the returned plan at all.
    ("pq_fast_approx_distinct", ["Scan ExistingRDD"], ["BatchEvalPython", "CartesianProduct", "Scan parquet"]),
    # Batch filtered ANN: per-query top-k via ranked window with the
    # group limit pushed into the shuffle; probe-set generation is
    # the Arrow kernel, never row-Python; the value-folded equi-join
    # must never degrade to a cartesian.
    ("ds_embedding_filtered_batch_topk", ["WindowGroupLimit"], ["BatchEvalPython", "CartesianProduct"]),
    # Constraint enforcement: the gated row is local; enforcement ran
    # as Observations on the staged writes.
    ("pq_constraint_enforcement", ["Scan ExistingRDD"], ["BatchEvalPython", "CartesianProduct", "Scan parquet"]),
    # Round 12. Range-filtered ANN: the gated exact path pushes the
    # score BETWEEN bounds into the index parquet scan and ranks via
    # top-k; strategy planning consumed only the sidecar (no extra
    # jobs appear in the returned plan).
    ("ds_embedding_range_filtered_topk", ["TakeOrderedAndProject", "PushedFilters"], ["BatchEvalPython", "CartesianProduct"]),
    # Trigram delete/update reconciliation: same pruned-verify
    # contract (candidate id IN-list pushed to the corpus scans,
    # contains() JVM-side); the tombstone anti-join ran in the
    # bounded candidate job, not the returned plan.
    ("ds_trigram_delete_update_search", ["In(doc_id", "StringContains"], ["BatchEvalPython", "CartesianProduct"]),
    # Composite filtered ANN: equality AND range both pushed into the
    # index scan of the sidecar-pruned lists; ranking stays top-k.
    ("ds_embedding_composite_filtered_topk", ["TakeOrderedAndProject", "PushedFilters"], ["BatchEvalPython", "CartesianProduct"]),
    # Hybrid RRF: corpus-sized work lives in the upstream retrieval
    # operators; the fusion is k-row rank windows + join + top-k.
    ("ds_hybrid_rrf_topk", ["Window", "TakeOrderedAndProject"], ["BatchEvalPython", "CartesianProduct"]),
    # Durable BM25: query = term-pruned posting scan (IN-list reaches
    # the reader) + broadcast idf + top-k; dl is denormalized so no
    # corpus-sized join appears anywhere in the plan.
    ("ds_bm25_index_topk", ["In(term", "TakeOrderedAndProject"], ["BatchEvalPython", "CartesianProduct"]),
    ("ds_bm25_index_delete_update", ["In(term", "TakeOrderedAndProject"], ["BatchEvalPython", "CartesianProduct"]),
    # Fuzzy similarity: exact-Jaccard verify runs on candidates only
    # (id IN-list pushed into the corpus scan), gram math JVM-side.
    ("ds_fuzzy_similarity_search", ["In(doc_id"], ["BatchEvalPython", "CartesianProduct"]),
    # Round-13 additions. Fuzzy over the DURABLE mutated index keeps
    # the same pruned-verify contract (candidate IN-list pushed to the
    # corpus scan; the tombstone-filtered posting read happened in the
    # bounded candidate job).
    ("ds_fuzzy_index_delete_update_search", ["In(doc_id"], ["BatchEvalPython", "CartesianProduct"]),
    # Hybrid over durable mutated indexes: the BM25 leg's term IN-list
    # reaches the posting reader inside the fused plan, fusion stays
    # k-row rank windows + top-k; ANN's only Python is the
    # Arrow-batched ADC kernel.
    ("ds_hybrid_index_mutated_rrf", ["In(term", "Window", "TakeOrderedAndProject"], ["BatchEvalPython", "CartesianProduct"]),
    # ANN delete: the filtered prefilter over the live view is a
    # pushed-predicate scan + broadcast tombstone anti-join + top-k —
    # all JVM-side (no ADC on this branch, so zero Python at all).
    ("ds_ann_index_delete_filtered_topk", ["TakeOrderedAndProject", "BroadcastHashJoin"], ["BatchEvalPython", "CartesianProduct"]),
    # Batch durable ANN: probe planning is driver math, so the plan is
    # a partition-filtered index scan + broadcast (query, list) join +
    # per-query rank window — zero Python anywhere.
    ("ds_ann_index_batch_topk", ["PartitionFilters", "Window", "BroadcastHashJoin"], ["BatchEvalPython", "CartesianProduct"]),
    # Batch BM25: one term-IN-pruned posting read shared across the
    # query batch, broadcast (q_id, term) fan-out, per-query window.
    ("ds_bm25_index_batch_topk", ["In(term", "Window", "BroadcastHashJoin"], ["BatchEvalPython", "CartesianProduct"]),
    # Stream-maintained BM25 index: after the drained upsert stream,
    # the query plan is identical to the batch-built index's.
    ("st_stream_bm25_index_topk", ["In(term", "TakeOrderedAndProject"], ["BatchEvalPython", "CartesianProduct"]),
    # Round-14: stream-maintained ANN index. Same-id upserts leave
    # generation-bounded tombstones, so the query reads the live view
    # (broadcast anti-join BELOW the partition-pruned scan); ranking
    # stays top-k.
    ("st_stream_ann_index_topk", ["TakeOrderedAndProject", "BroadcastHashJoin"], ["BatchEvalPython", "CartesianProduct"]),
    # One-call coordinated mutation, then hybrid fusion: the fused
    # plan keeps the BM25 leg's pruned posting read and rank-window
    # fusion; ANN's only Python is the Arrow-batched ADC kernel.
    ("ds_corpus_changes_hybrid_rrf", ["In(term", "Window", "TakeOrderedAndProject"], ["BatchEvalPython", "CartesianProduct"]),
    # CDC-driven table->index sync: the query after sync is the plain
    # pruned-posting BM25 plan — the sync's work rode the CDC window,
    # not the query.
    ("ds_index_sync_from_table_bm25", ["In(term", "TakeOrderedAndProject"], ["BatchEvalPython", "CartesianProduct"]),
    # As-of (time-travel) BM25: the marker replay is the SAME pruned
    # plan as the live query — term IN-list at the posting scan plus
    # a pushed _batch <= marker comparison; the slot-filtered
    # tombstones still broadcast; top-k stays compiled.
    ("ds_bm25_index_asof_topk", ["In(term", "LessThanOrEqual(_batch", "TakeOrderedAndProject"], ["BatchEvalPython", "CartesianProduct"]),
    # As-of ANN: generation filtering sits ABOVE the _list partition
    # pruning (probe planning is driver math over frozen centroids),
    # so time travel keeps the partition-pruned scan + broadcast
    # anti-join + per-query window shape of the live batch path.
    ("ds_ann_index_asof_topk", ["PartitionFilters", "Window", "BroadcastHashJoin"], ["BatchEvalPython", "CartesianProduct"]),
    # Snapshot-consistent hybrid: the as-of replay keeps the fused
    # plan of the live hybrid path — pruned posting read, rank-window
    # fusion, compiled top-k; ANN's only Python is the Arrow ADC
    # kernel.
    ("ds_hybrid_index_asof_rrf", ["In(term", "Window", "TakeOrderedAndProject"], ["BatchEvalPython", "CartesianProduct"]),
    # As-of trigram (substring + fuzzy): the candidate job read the
    # pruned gram IN-list over slot-filtered postings eagerly (the
    # bounded collect, as in ds_fuzzy_index_delete_update_search);
    # the returned plan is the verify behind the pushed candidate-id
    # IN-list on the caller's as-of frame.
    ("ds_substring_index_asof", ["In(doc_id"], ["BatchEvalPython", "CartesianProduct"]),
    # Commit-consistent time travel: the as-of replay keyed by a
    # table commit keeps the pruned-posting BM25 plan with the pushed
    # generation bound.
    ("ds_table_sync_asof_bm25", ["In(term", "LessThanOrEqual(_batch", "TakeOrderedAndProject"], ["BatchEvalPython", "CartesianProduct"]),
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from lineage_store_database_management_system_spark import get_spark, workloads
    from lineage_store_database_management_system_spark.plans.explain import explain_str

    spark = get_spark(app_name="plan-audit", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    failures = []
    print(f"# Physical-plan audit ({sf_dir})\n")
    print(
        "Automated shape checks per headline query: required fragments "
        "must appear in the formatted plan, forbidden ones must not.\n"
    )
    for name, required, forbidden in AUDIT:
        df = workloads.QUERIES[name](spark, sf_dir)
        plan = explain_str(df)
        missing = [f for f in required if f not in plan]
        present = [f for f in forbidden if f in plan]
        ok = not missing and not present
        if not ok:
            failures.append((name, missing, present))
        print(f"## {name} — {'OK' if ok else 'FAIL'}")
        if missing:
            print(f"- MISSING: {missing}")
        if present:
            print(f"- FORBIDDEN PRESENT: {present}")
        print("\n```\n" + plan.strip()[:4000] + "\n```\n")

    # Manifest-log FILE-SKIPPING PROBE: plan strings don't expose file
    # counts, so measure them directly — a key-range current view over
    # the 8-commit orders_mc scenario must open a strict subset of the
    # live base files (lineage.py _read_or_empty prune path).
    from lineage_store_database_management_system_spark.workloads import _table

    t = _table(spark, sf_dir, "orders_mc")
    opened = len(t.current_view(key_range=(1000, 2000)).inputFiles())
    total = len(t.current_view().inputFiles())
    skip_ok = opened < total
    print("## manifest file-skipping probe — " + ("OK" if skip_ok else "FAIL"))
    print(
        f"\ncurrent_view(key_range=(1000, 2000)) opened {opened} of "
        f"{total} live files (8 disjoint-key-range commits; the log's "
        "per-file key min/max prunes the rest driver-side).\n"
    )
    if not skip_ok:
        failures.append(("manifest_skip_probe", ["opened < total"], []))

    # FUZZY FALLBACK PROBE (VERDICT r12 What's-wrong #3): force the
    # >cap branch by shrinking the IN-list cap, then assert the
    # corpus-scaled candidate/shared frames carry NO broadcast hint in
    # the optimized logical plan — a forced broadcast there is an OOM
    # at 100 TB; AQE may still pick a broadcast for SMALL data on its
    # own, which is exactly the behavior we want to leave to it.
    from pyspark.sql import functions as F

    from lineage_store_database_management_system_spark.operators import textsearch

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta text "), F.col("id").cast("string")).alias(
            "text"
        ),
    )
    old_cap = textsearch._VERIFY_ISIN_CAP
    try:
        textsearch._VERIFY_ISIN_CAP = 5
        out, info = textsearch.fuzzy_similarity_search(
            docs, "alpha beta", threshold=0.1
        )
    finally:
        textsearch._VERIFY_ISIN_CAP = old_cap
    logical = out._jdf.queryExecution().optimizedPlan().toString()
    fb_ok = info["n_candidates"] == -1 and "broadcast" not in logical.lower()
    print("## fuzzy fallback: no corpus-scaled broadcast — " + ("OK" if fb_ok else "FAIL"))
    print(
        "\n>cap branch (cap forced to 5, 200 candidate docs): the "
        "shared-count and candidate frames join shuffle-side with no "
        "hint; AQE owns the strategy.\n"
    )
    print("```\n" + logical.strip()[:2500] + "\n```\n")
    if not fb_ok:
        failures.append(("fuzzy_fallback_probe", ["no broadcast hint"], []))

    # FUZZY RAREST-GRAM PREFIX PROBE (VERDICT r13 What's-wrong #2):
    # with df stats available, the candidate job reads only the
    # q - ceil(t*q) + 1 LOWEST-df grams' postings (pigeonhole keeps
    # candidate completeness); the skipped grams are the highest-df
    # ones, which is where a heavy-tailed posting distribution keeps
    # its bytes. Assert the prune happened AND the pruned gram IN-list
    # reaches the posting reader as a pushed filter.
    import tempfile as _tf

    fz_idx = _tf.mkdtemp(prefix="lss_audit_fz_") + "/trgm"
    textsearch.write_trigram_index(docs, fz_idx)
    out2, info2 = textsearch.fuzzy_similarity_search(
        docs, "alpha beta txet", threshold=0.4, index_dir=fz_idx
    )
    qn = len(textsearch.pattern_grams("alpha beta txet"))
    prune_ok = (
        info2["postings_source"] == "durable"
        and len(info2["probe_grams"]) == qn - info2["min_shared"] + 1 < qn
    )
    postings2, _stats2 = textsearch.open_trigram_index(spark, fz_idx)
    pruned_read = postings2.where(F.col("gram").isin(info2["probe_grams"]))
    pplan = explain_str(pruned_read)
    prune_ok = prune_ok and "In(gram" in pplan
    print(
        "## fuzzy rarest-gram prefix filter: pruned posting read — "
        + ("OK" if prune_ok else "FAIL")
    )
    print(
        f"\nquery has {qn} grams, min_shared="
        f"{info2['min_shared']}; the candidate job read only "
        f"{len(info2['probe_grams'])} posting lists (the lowest-df "
        "grams), with the IN-list pushed to the gram-clustered "
        "parquet so file/row-group pruning applies. Exact Jaccard is "
        "verified on candidates with FULL gram sets, so results are "
        "bit-identical to the unpruned path.\n"
    )
    print("```\n" + pplan.strip()[:2500] + "\n```\n")
    if not prune_ok:
        failures.append(
            ("fuzzy_prefix_probe", ["pruned gram IN-list pushed"], [])
        )

    if failures:
        print(f"\n**{len(failures)} plan-shape failures**: {[f[0] for f in failures]}")
        return 1
    print(f"\nAll {len(AUDIT)} plan shapes + file-skipping and fallback probes OK.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
