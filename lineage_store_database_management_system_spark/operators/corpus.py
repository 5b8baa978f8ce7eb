"""Coordinated corpus mutation across the durable retrieval indexes
(VERDICT r13 next-steps #5): one call applies the same change set —
deletes + re-indexed documents/vectors — to the BM25, trigram, and
ANN indexes, and is itself crash-convergent, so hybrid retrieval can
never silently fuse one mutated leg with one stale leg.

The reference has no retrieval surface at all (its closest analogue
is the single-column key index, reference query.py:34); this is the
extension layer's multi-index transaction-ish primitive. True
cross-index atomicity is not claimed — a reader between two index
applies sees one index ahead of the other, same as any pair of
independently maintained systems — what IS guaranteed is
CONVERGENCE: every index reaches the post-change state after enough
retries, a crash anywhere included, because each index application
runs under its own reservation-marker discipline
(textsearch._index_apply_stream_batch): already-applied indexes skip
on retry, a torn apply repairs (markers-vs-footers) and re-applies
through update semantics, so exactly one live generation of each
changed id survives however many attempts ran."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["apply_corpus_changes"]


def apply_corpus_changes(
    change_id: int,
    deletes: DataFrame | None = None,
    updates: DataFrame | None = None,
    bm25_dir: str | None = None,
    trigram_dir: str | None = None,
    ann_dir: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_col: str = "embedding",
) -> dict:
    """Apply one corpus change set to every supplied index.

    ``change_id`` is the idempotence key: a monotonically increasing
    integer per index set (a CDC batch id, a commit sequence). Reusing
    an applied id is a recorded no-op; replaying a crashed id
    converges. ``deletes`` is a one-column id frame; ``updates``
    carries ``id_col`` plus ``text_col`` (re-indexed into BM25 +
    trigram) and/or ``vec_col`` (re-indexed into ANN) — an id in
    ``updates`` that was also in ``deletes`` ends up LIVE under its
    new content (delete applies first, update re-inserts).

    Returns ``{"bm25": bool, "trigram": bool, "ann": bool}`` — True
    where THIS call applied the change, False where the index had
    already absorbed it (or was not supplied). Concurrent maintainers
    are fenced per index by the sidecar CAS (operators/_idxmeta.py);
    a conflict aborts that index's apply with
    ``IndexConcurrentWriteError`` before any write, and the retry
    skips the indexes that already completed."""
    from . import similarity, textsearch

    stream_id = "corpus_changes"
    applied = {"bm25": False, "trigram": False, "ann": False}

    def _text_update(kind: str, index_dir: str):
        delete = (
            textsearch.delete_from_bm25_index
            if kind == "bm25"
            else textsearch.delete_from_trigram_index
        )
        reindex = (
            textsearch.update_bm25_index
            if kind == "bm25"
            else textsearch.update_trigram_index
        )

        def _fn():
            if deletes is not None:
                delete(deletes.select(deletes.columns[0]), index_dir)
            if updates is not None and text_col in updates.columns:
                reindex(
                    updates.select(id_col, text_col), index_dir,
                    id_col, text_col,
                )

        return _fn

    if bm25_dir is not None:
        spark = _session(deletes, updates)
        applied["bm25"] = textsearch._index_apply_stream_batch(
            bm25_dir,
            change_id,
            stream_id,
            update_fn=_text_update("bm25", bm25_dir),
            repair_fn=lambda: textsearch.bm25_index_repair(spark, bm25_dir),
        )
    if trigram_dir is not None:
        spark = _session(deletes, updates)
        applied["trigram"] = textsearch._index_apply_stream_batch(
            trigram_dir,
            change_id,
            stream_id,
            update_fn=_text_update("trigram", trigram_dir),
            repair_fn=lambda: textsearch.trigram_index_repair(
                spark, trigram_dir
            ),
        )
    if ann_dir is not None:
        spark = _session(deletes, updates)

        def _ann_fn():
            if deletes is not None:
                similarity.ivf_pq_delete_from_index(
                    deletes.select(deletes.columns[0]), ann_dir
                )
            if updates is not None and vec_col in updates.columns:
                meta = similarity._open_ann_meta(ann_dir)
                similarity.ivf_pq_update_index(
                    updates.select(
                        updates[id_col].alias(meta["id_col"]),
                        updates[vec_col].alias(meta["vec_col"]),
                    ),
                    ann_dir,
                )

        applied["ann"] = textsearch._index_apply_stream_batch(
            ann_dir,
            change_id,
            stream_id,
            update_fn=_ann_fn,
            repair_fn=lambda: similarity.ivf_pq_index_repair(spark, ann_dir),
            meta_name="_ann_meta.json",
        )
    return applied


def _session(*frames):
    for f in frames:
        if f is not None:
            return f.sparkSession
    raise ValueError(
        "apply_corpus_changes needs at least one of deletes/updates"
    )
