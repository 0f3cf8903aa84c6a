"""Streaming near-duplicate dedup against a static corpus.

The production shape for continuous ingestion into a training corpus:
every incoming micro-batch of documents is checked for near-duplicates
(shingle Jaccard, the q30 operator) against the EXISTING corpus without
ever recomputing the corpus side — its shingle inverted index is built
once and reused across batches. Novel documents append to the corpus
sink; near-duplicates are routed to a quarantine sink with their match
evidence (corpus doc, Jaccard), mirroring the ingest path's
valid/quarantine split (operators/transforms.validate).

Executed via ``foreachBatch``: aggregation-over-candidates is not
expressible in pure append-mode streaming, and foreachBatch is Spark's
supported seam for reusing arbitrary batch plans per micro-batch. Both
sinks are written as batch_id=N partitions with dynamic overwrite, so
a checkpoint replay rewrites its own partition instead of appending
duplicates (the idempotence contract of streaming/upsert.py).

Scale posture (100 TB corpus): the per-batch cost is
|batch shingles| joined against the corpus index — an equi-join on the
shingle key, shuffle-partitioned, never all-pairs; the corpus index
(pruned shingles, hot-shingle list, per-doc sizes) is built once — at
real scale a bucketed-on-`s` table, so the per-batch join co-locates
without reshuffling the corpus. State lives in the index, not the
stream. The hot-shingle prune is applied to BOTH sides (the q30
semantics): batch shingles are anti-joined against the same hot list,
so Jaccard numerator and denominators count the same shingle universe.
New docs admitted to the corpus do NOT update the index mid-stream
(batch-boundary consistency); on the compaction cadence, admit them
with :func:`append_corpus_index` (incremental, frozen hot list,
per-doc idempotent, reports hot-list drift) and rebuild with
:func:`save_corpus_index` when the reported drift grows.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from eventsgateway_spark.functions.text import ngrams, tokens
from eventsgateway_spark.queries.ext_dedup import MAX_SHINGLE_DF, SHINGLE_N


def batch_shingles(docs: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """(doc_id, s) distinct shingles — the un-pruned, checkpoint-free
    shingle explode (safe on micro-batch frames)."""
    return docs.select("doc_id", tokens("text").alias("toks")).select(
        "doc_id", F.explode(F.array_distinct(ngrams(F.col("toks"), n))).alias("s")
    )


class CorpusIndex(NamedTuple):
    """Materialized once, reused by every micro-batch."""

    shingles: DataFrame  # (doc_id, s) — hot-pruned
    hot: DataFrame  # (s) — shingles with df > cap, pruned from BOTH sides
    sizes: DataFrame  # (corpus_id, sz_corp) — post-prune shingle counts


def _index_frames(
    corpus_docs: DataFrame, n: int, max_df: int
) -> tuple[DataFrame, CorpusIndex]:
    """(raw shingles, index) from ONE tokenize/shingle pass — raw is
    localCheckpointed so callers that also need the pre-prune frame
    (save_corpus_index's df partials) don't rescan the corpus."""
    raw = batch_shingles(corpus_docs, n).localCheckpoint()
    hot = (
        raw.groupBy("s")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") > max_df)
        .select("s")
        .localCheckpoint()
    )
    sh = raw.join(F.broadcast(hot), "s", "left_anti").localCheckpoint()
    # EVERY corpus doc gets a sizes row (0 when all its shingles are
    # hot, or the doc is shorter than the shingle width): sizes doubles
    # as append_corpus_index's admission ledger, so a missing row would
    # re-admit the doc later
    sizes = (
        sh.groupBy(F.col("doc_id").alias("corpus_id"))
        .agg(F.count(F.lit(1)).alias("sz_corp"))
        .join(
            corpus_docs.select(F.col("doc_id").alias("corpus_id")).distinct(),
            "corpus_id",
            "right",
        )
        .fillna(0, subset=["sz_corp"])
        .localCheckpoint()
    )
    return raw, CorpusIndex(shingles=sh, hot=hot, sizes=sizes)


def build_corpus_index(
    corpus_docs: DataFrame, n: int = SHINGLE_N, max_df: int = MAX_SHINGLE_DF
) -> CorpusIndex:
    """In-session index: localCheckpoint pins (block manager). Fine for
    one streaming job over a modest corpus; the durable/100 TB form is
    :func:`save_corpus_index` + :func:`load_corpus_index`."""
    return _index_frames(corpus_docs, n, max_df)[1]


def save_corpus_index(
    corpus_docs: DataFrame,
    table_prefix: str,
    buckets: int = 32,
    n: int = SHINGLE_N,
    max_df: int = MAX_SHINGLE_DF,
) -> None:
    """Materialize the corpus index as catalog tables — the 100 TB
    posture: the shingle inverted index is BUCKETED (and sorted) on
    ``s``, so every micro-batch's candidate equi-join co-locates
    against the bucket layout and only the (small) batch side
    shuffles; the corpus is never reshuffled, never pinned in the
    block manager, and survives session restarts.

    Alongside the three query-side tables, ``{prefix}_df`` keeps
    APPEND-ONLY partial document-frequency counts per shingle (bucketed
    on ``s`` like the index; the query path never reads it — it exists
    so :func:`append_corpus_index` can measure hot-list drift without
    rescanning the corpus), and ``{prefix}_meta`` pins the build
    parameters (n, max_df, buckets) so appends can never silently use
    a different shingle width or cap than the index was built with.

    The six table writes are not one transaction. A crashed FIRST save
    leaves a partial index that simply fails to load; a crashed
    same-parameter RE-SAVE can leave mixed generations of the data
    tables (re-run the save to completion before appending — every
    table is a full overwrite, so completion restores consistency).
    Re-saving over a live prefix with DIFFERENT parameters is refused
    outright: whichever write order, a crash mid-way would pair one
    generation's data with the other generation's parameters and make
    appends silently shingle the wrong universe — rebuild to a FRESH
    prefix and swap names instead."""
    spark = corpus_docs.sparkSession
    if spark.catalog.tableExists(f"{table_prefix}_meta") and not spark.catalog.tableExists(
        f"{table_prefix}_shingles"
    ):
        # phantom _meta: a FIRST save crashed between the _meta write
        # and the first data table, so the parameters pin NOTHING —
        # refusing a rebuild here would demand a manual DROP for an
        # index that never existed (ADVICE r8). Clear it and fall
        # through to a clean first save.
        spark.sql(f"DROP TABLE IF EXISTS {table_prefix}_meta")
    if spark.catalog.tableExists(f"{table_prefix}_meta"):
        old = spark.table(f"{table_prefix}_meta").collect()[0]
        if (int(old["n"]), int(old["max_df"]), int(old["buckets"])) != (
            int(n), int(max_df), int(buckets)
        ):
            raise ValueError(
                f"{table_prefix} already holds an index built with "
                f"(n={old['n']}, max_df={old['max_df']}, "
                f"buckets={old['buckets']}); rebuilding in place with "
                f"different parameters (n={n}, max_df={max_df}, "
                f"buckets={buckets}) is refused — a crash mid-save "
                "would mix generations. Save to a fresh prefix and "
                "swap names."
            )
    elif spark.catalog.tableExists(f"{table_prefix}_shingles"):
        # live pre-_meta index: its n/max_df cannot be read back, but
        # every pre-_meta save used the module defaults; buckets come
        # from the table's own catalog spec — the same refusal must
        # protect the migration targets, not only post-_meta indexes
        from eventsgateway_spark.queries._util import table_buckets

        bk = table_buckets(spark, f"{table_prefix}_shingles")
        if (int(n), int(max_df), int(buckets)) != (
            int(SHINGLE_N), int(MAX_SHINGLE_DF), int(bk)
        ):
            raise ValueError(
                f"{table_prefix} holds a pre-_meta index (defaults "
                f"n={SHINGLE_N}, max_df={MAX_SHINGLE_DF}, buckets={bk}); "
                "re-saving in place with different parameters is "
                "refused — save to a fresh prefix and swap names."
            )
        # park any markerless orphans of pre-protocol crashed appends
        # in _pending BEFORE _meta is written: writing _meta first
        # would take the migration fast path forever if THIS save
        # crashes before overwriting the data tables, leaving the
        # orphans loose; the completed save eliminates them (full
        # overwrite) and drops the marker at the end
        _park_legacy_orphans(spark, table_prefix)
    raw, idx = _index_frames(corpus_docs, n, max_df)
    spark.createDataFrame(
        [(int(n), int(max_df), int(buckets))], "n int, max_df int, buckets int"
    ).write.mode("overwrite").saveAsTable(f"{table_prefix}_meta")
    (
        idx.shingles.write.bucketBy(buckets, "s")
        .sortBy("s")
        .mode("overwrite")
        .saveAsTable(f"{table_prefix}_shingles")
    )
    idx.hot.write.mode("overwrite").saveAsTable(f"{table_prefix}_hot")
    idx.sizes.write.mode("overwrite").saveAsTable(f"{table_prefix}_sizes")
    # raw (pre-prune) df partials — reusing the checkpointed raw frame,
    # not a second corpus scan: the hot list's own counts must be
    # included so drift math can compare future totals against the cap
    (
        raw.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df_part"))
        .write.bucketBy(buckets, "s")
        .sortBy("s")
        .mode("overwrite")
        .saveAsTable(f"{table_prefix}_df")
    )
    # marker cleanup LAST: a crash before this point leaves _pending
    # (repairable) or _df_fold (recoverable) rather than dropping them
    # while the state they guard still needs them
    spark.sql(f"DROP TABLE IF EXISTS {table_prefix}_pending")
    spark.sql(f"DROP TABLE IF EXISTS {table_prefix}_df_fold")
    # the in-session frames are superseded by the saved tables —
    # reclaim their checkpoint blocks now, not at GC time: a process
    # that saves several indexes (scale probes, per-tenant rebuilds)
    # otherwise accumulates every generation's blocks in the block
    # manager for the session's life. release_frame, NOT df.unpersist:
    # Dataset.unpersist is a no-op for localCheckpoint blocks
    # (verified on pyspark 4.1 — queries/_util.release_frame).
    from eventsgateway_spark.queries._util import release_frame

    for frame in (raw, idx.shingles, idx.hot, idx.sizes):
        release_frame(frame)


def _index_meta(spark, table_prefix: str) -> tuple[int, int, int]:
    """Build parameters pinned at save time (pure read; legacy
    backfill lives in :func:`_ensure_meta_and_migrate`)."""
    r = spark.table(f"{table_prefix}_meta").collect()[0]
    return int(r["n"]), int(r["max_df"]), int(r["buckets"])


def _ensure_meta_and_migrate(spark, table_prefix: str) -> tuple[int, int, int]:
    """Read the pinned build parameters, migrating a pre-_meta index
    exactly once. Order is load-bearing: a nonexistent prefix raises
    BEFORE anything is written (no phantom _meta poisoning a later
    first save); the legacy ORPHAN SWEEP runs and durably parks its
    findings in ``_pending`` BEFORE _meta is written, so a crash
    mid-sweep leaves _meta absent and the sweep reruns — writing the
    done-marker first would disable it forever with orphans still
    loose. n/max_df backfill from the module defaults (every pre-_meta
    save this code shipped used them — the width is baked into the
    stored shingles); buckets from the table's own catalog spec."""
    from eventsgateway_spark.queries._util import table_buckets

    if spark.catalog.tableExists(f"{table_prefix}_meta"):
        if not spark.catalog.tableExists(f"{table_prefix}_shingles"):
            # phantom _meta (crashed FIRST save): appending would fail
            # on the missing data table anyway — name the real state
            # instead of surfacing a raw table-not-found (ADVICE r8)
            raise ValueError(
                f"no corpus index at {table_prefix!r} (only a phantom "
                "_meta from a crashed first save) — run "
                "save_corpus_index to completion first"
            )
        return _index_meta(spark, table_prefix)
    if not spark.catalog.tableExists(f"{table_prefix}_shingles"):
        raise ValueError(
            f"no corpus index at {table_prefix!r} — save_corpus_index first"
        )
    bk = table_buckets(spark, f"{table_prefix}_shingles")
    # one-time sweep for markerless orphans of pre-pending-protocol
    # crashed appends; parked in _pending so the standard repair path
    # (and a rerun after a crash right here) finishes the job
    _park_legacy_orphans(spark, table_prefix)
    spark.createDataFrame(
        [(int(SHINGLE_N), int(MAX_SHINGLE_DF), int(bk))],
        "n int, max_df int, buckets int",
    ).write.mode("overwrite").saveAsTable(f"{table_prefix}_meta")
    return int(SHINGLE_N), int(MAX_SHINGLE_DF), int(bk)


def _park_legacy_orphans(spark, table_prefix: str) -> None:
    """Write doc_ids with shingles but no sizes row to ``_pending`` so
    the standard repair path finishes them — the pre-pending-protocol
    crash residue. Shared by the append-side migration and the save
    path's pre-_meta branch (one copy of the sweep). A crashed FIRST
    save has no ``_sizes`` at all — nothing to sweep; the re-run's
    full overwrite restores consistency by itself."""
    from eventsgateway_spark.queries._util import release_frame

    if not spark.catalog.tableExists(f"{table_prefix}_sizes"):
        return
    legacy_orphans = (
        spark.table(f"{table_prefix}_shingles")
        .select("doc_id")
        .distinct()
        .join(
            spark.table(f"{table_prefix}_sizes").select(
                F.col("corpus_id").alias("doc_id")
            ),
            "doc_id",
            "left_anti",
        )
        .localCheckpoint()
    )
    try:
        if legacy_orphans.count():
            legacy_orphans.write.mode("overwrite").saveAsTable(
                f"{table_prefix}_pending"
            )
    finally:
        release_frame(legacy_orphans)


def _recover_df_fold(spark, table_prefix: str, buckets: int) -> None:
    """If a compaction died mid-overwrite, ``_df_fold`` is the only
    surviving copy of the drift partials — restore it BEFORE anything
    reads or appends ``_df`` (a bucketed append would silently CREATE
    a truncated ``_df`` that the next compaction would then fold over
    the staged copy, zeroing the drift gate forever)."""
    fold_tbl, df_tbl = f"{table_prefix}_df_fold", f"{table_prefix}_df"
    if spark.catalog.tableExists(fold_tbl) and not spark.catalog.tableExists(
        df_tbl
    ):
        (
            spark.table(fold_tbl)
            .write.bucketBy(buckets, "s")
            .sortBy("s")
            .mode("overwrite")
            .saveAsTable(df_tbl)
        )
        spark.sql(f"DROP TABLE {fold_tbl}")


def append_corpus_index(spark, table_prefix: str, new_docs: DataFrame) -> dict:
    """Admit new documents into a SAVED index incrementally — the
    "append on the compaction cadence" path the module contract names:
    novel docs accepted by the stream accumulate in the index without
    rebuilding it, so the next batches dedup against them too. Shingle
    width, df cap, and bucket count come from the index's own
    ``_meta`` table (pinned at save time), never from the caller — a
    mismatched width would make appended docs silently undetectable.

    Semantics vs a full rebuild: the HOT LIST IS FROZEN at build time.
    New shingles are pruned with the existing hot list (both sides of
    every future Jaccard keep counting the same universe — the q30
    consistency requirement), and shingles whose total df crosses the
    cap only AFTER the freeze stay in the index until the next
    :func:`save_corpus_index` rebuild. That staleness only adds
    candidate-join work; it never splits the universe between the two
    Jaccard sides. The returned ``n_drifted_hot`` counts such shingles
    (computed from the ``_df`` partials, no corpus rescan) — rebuild
    when it grows past tolerance.

    Idempotence/crash posture: ``new_docs`` is deduplicated by doc_id
    within the call, then doc_ids already in the _sizes ledger are
    dropped. Each append runs a PENDING-MARKER protocol around its
    three table writes (each individually atomic under Spark's commit
    protocol; the sequence is not): the admitted ids are written to
    ``_pending`` first, then _shingles → _sizes → _df, then _pending
    is dropped. A surviving _pending at the next append triggers
    repair — scoped to the marked ids, so the healthy-path cost stays
    one small-ledger anti-join, never a scan of the inverted index:
    ids whose shingles landed but whose sizes row is missing get their
    sizes row AND their pruned-df partials recomputed from the index;
    ids whose shingles never landed stay unadmitted and re-admittable.
    The one non-recovered state: a crash between the _sizes and _df
    writes loses that batch's df partials (the hot-pruned occurrences
    are not in the index to recount) — the drift metric then
    under-reports until the next rebuild, which is the metric's safe
    direction (rebuild later than ideal, never wrong matches).

    Indexes written by pre-pending-protocol code get a ONE-TIME full
    orphan sweep when their ``_meta`` table is backfilled (a crashed
    old-style append could leave markerless orphans); thereafter the
    marker makes orphans impossible and the sweep never reruns."""
    n, max_df, buckets = _ensure_meta_and_migrate(spark, table_prefix)
    _recover_df_fold(spark, table_prefix, buckets)
    pending_tbl = f"{table_prefix}_pending"
    n_repaired = 0
    if spark.catalog.tableExists(pending_tbl):
        n_repaired = _repair_pending(spark, table_prefix, buckets)
        spark.sql(f"DROP TABLE {pending_tbl}")
    sizes_ids = spark.table(f"{table_prefix}_sizes").select(
        F.col("corpus_id").alias("doc_id")
    )
    from eventsgateway_spark.queries._util import release_frame

    # checkpoint blocks are reclaimed on EVERY exit (early return,
    # exception, success) — the cleanup must not depend on the happy
    # path, or a compaction loop of no-op appends leaks one `docs`
    # frame per call
    pins: list[DataFrame] = []
    try:
        docs = (
            new_docs.dropDuplicates(["doc_id"])  # at-least-once upstream
            .join(sizes_ids, "doc_id", "left_anti")
            .localCheckpoint()
        )
        pins.append(docs)
        n_new_docs = docs.count()
        if n_new_docs == 0:
            return {
                "n_new_docs": 0,
                "n_new_shingles": 0,
                "n_repaired_docs": n_repaired,
                "n_drifted_hot": _drifted_hot(spark, table_prefix, max_df),
            }
        docs.select("doc_id").write.mode("overwrite").saveAsTable(pending_tbl)
        raw = batch_shingles(docs, n).localCheckpoint()
        pins.append(raw)
        hot = spark.table(f"{table_prefix}_hot")
        pruned = raw.join(F.broadcast(hot), "s", "left_anti").localCheckpoint()
        pins.append(pruned)
        n_new_shingles = pruned.count()
        (
            pruned.write.bucketBy(buckets, "s")
            .sortBy("s")
            .mode("append")
            .saveAsTable(f"{table_prefix}_shingles")
        )
        (
            pruned.groupBy(F.col("doc_id").alias("corpus_id"))
            .agg(F.count(F.lit(1)).alias("sz_corp"))
            # docs whose every shingle is hot still need a sizes row
            # (sz 0): it is the idempotence ledger, so absence would
            # re-admit them
            .join(
                docs.select(F.col("doc_id").alias("corpus_id")),
                "corpus_id",
                "right",
            )
            .fillna(0, subset=["sz_corp"])
            .write.mode("append")
            .saveAsTable(f"{table_prefix}_sizes")
        )
        (
            raw.groupBy("s")
            .agg(F.count(F.lit(1)).alias("df_part"))
            .write.bucketBy(buckets, "s")
            .sortBy("s")
            .mode("append")
            .saveAsTable(f"{table_prefix}_df")
        )
        spark.sql(f"DROP TABLE {pending_tbl}")
        return {
            "n_new_docs": n_new_docs,
            "n_new_shingles": n_new_shingles,
            "n_repaired_docs": n_repaired,
            "n_drifted_hot": _drifted_hot(spark, table_prefix, max_df),
        }
    finally:
        for frame in pins:
            release_frame(frame)


def _repair_pending(spark, table_prefix: str, buckets: int) -> int:
    """Finish a crashed append, scoped to the ids its ``_pending``
    marker recorded: ids whose shingles landed but whose sizes row is
    missing get the sizes row and the pruned portion of their df
    partials recomputed from the index (the index scan is filtered to
    the marked ids — never a full inverted-index pass); ids whose
    shingles never landed are left unadmitted and re-admit naturally.
    Returns how many docs were repaired."""
    from eventsgateway_spark.queries._util import release_frame

    pending = spark.table(f"{table_prefix}_pending")
    sizes_ids = spark.table(f"{table_prefix}_sizes").select(
        F.col("corpus_id").alias("doc_id")
    )
    pins: list[DataFrame] = []
    try:
        missing = pending.join(sizes_ids, "doc_id", "left_anti").localCheckpoint()
        pins.append(missing)
        if missing.count() == 0:
            return 0
        sh = (
            spark.table(f"{table_prefix}_shingles")
            .join(F.broadcast(missing), "doc_id")
            .localCheckpoint()  # consumed by the sizes AND df repairs
        )
        pins.append(sh)
        repaired = sh.groupBy(F.col("doc_id").alias("corpus_id")).agg(
            F.count(F.lit(1)).alias("sz_corp")
        ).localCheckpoint()
        pins.append(repaired)
        n_repaired = repaired.count()
        if n_repaired:
            repaired.write.mode("append").saveAsTable(f"{table_prefix}_sizes")
            # the crashed run never reached its _df write (sizes precedes
            # df), so re-appending the pruned counts cannot double-count;
            # the hot-pruned occurrences are unrecoverable (docstring)
            (
                sh.groupBy("s")
                .agg(F.count(F.lit(1)).alias("df_part"))
                .write.bucketBy(buckets, "s")
                .sortBy("s")
                .mode("append")
                .saveAsTable(f"{table_prefix}_df")
            )
        return n_repaired
    finally:
        for frame in pins:
            release_frame(frame)


def compact_df_partials(spark, table_prefix: str) -> int:
    """Fold the append-only ``_df`` partial counts into one row per
    shingle — run on the same compaction cadence once the partials
    outnumber the shingle universe by enough to slow the drift
    aggregate. Sums are associative, so the rewrite changes no drift
    math. Crash-safe via a staging table: the folded copy is committed
    to ``_df_fold`` BEFORE ``_df`` is overwritten (a volatile
    checkpoint alone would be the only copy mid-overwrite — a crash
    there would silently zero the drift gate forever), and a surviving
    ``_df_fold`` whose ``_df`` is missing restores it on the next run.
    Returns the compacted row count."""
    _, _, buckets = _ensure_meta_and_migrate(spark, table_prefix)
    fold_tbl = f"{table_prefix}_df_fold"
    df_tbl = f"{table_prefix}_df"
    _recover_df_fold(spark, table_prefix, buckets)
    if not spark.catalog.tableExists(df_tbl):
        # pre-_df legacy index: nothing to compact (the drift metric
        # reads 0 for it, _drifted_hot's documented degradation) — do
        # not die after the migration already mutated the catalog
        return 0
    (
        spark.table(df_tbl)
        .groupBy("s")
        .agg(F.sum("df_part").alias("df_part"))
        .write.bucketBy(buckets, "s")
        .sortBy("s")
        .mode("overwrite")
        .saveAsTable(fold_tbl)
    )
    n = spark.table(fold_tbl).count()
    (
        spark.table(fold_tbl)
        .write.bucketBy(buckets, "s")
        .sortBy("s")
        .mode("overwrite")
        .saveAsTable(df_tbl)
    )
    spark.sql(f"DROP TABLE {fold_tbl}")
    return n


def _drifted_hot(spark, table_prefix: str, max_df: int) -> int:
    """Shingles over the df cap that the frozen hot list does not
    prune — the staleness metric appends report. One aggregate over
    the bucketed ``_df`` partials (no shuffle on the corpus index).
    A pre-_df legacy index reports 0 until a rebuild establishes the
    partials — drift under-report is the metric's safe direction."""
    if not spark.catalog.tableExists(f"{table_prefix}_df"):
        return 0
    totals = (
        spark.table(f"{table_prefix}_df")
        .groupBy("s")
        .agg(F.sum("df_part").alias("df"))
        .filter(F.col("df") > max_df)
    )
    return (
        totals.join(
            F.broadcast(spark.table(f"{table_prefix}_hot")), "s", "left_anti"
        ).count()
    )


def load_corpus_index(spark, table_prefix: str) -> CorpusIndex:
    """Reopen a saved index; drop-in wherever a CorpusIndex is used."""
    return CorpusIndex(
        shingles=spark.table(f"{table_prefix}_shingles"),
        hot=spark.table(f"{table_prefix}_hot"),
        sizes=spark.table(f"{table_prefix}_sizes"),
    )


def propagate_quality_with_index(
    spark, table_prefix: str, docs: DataFrame, iters: int = 3
) -> DataFrame:
    """q80's quality propagation with edges derived from the DURABLE
    shingle index instead of re-shingling the corpus: the saved table
    is bucketed on ``s`` (the pair join key), so the inverted-index
    self-join is bucket-local — no corpus reshuffle, no re-tokenize.
    Run on the compaction cadence (scores are a GLOBAL fixed point:
    a new edge moves old docs' scores, so per-micro-batch incremental
    maintenance is not meaningful — same cadence contract as
    ``append_corpus_index``).

    Row-identical to batch q80 on the same corpus PROVIDED the index
    was built with the module-default shingle parameters (q80's gram
    universe); an index pinned to different n/max_df is refused rather
    than silently propagating over a different graph. The doc SET must
    cover the index too (ADVICE r10): if ``docs`` omits an indexed
    doc, that doc contributes edges (so its neighbors have deg > 0)
    but no seed — their contribution sum comes up NULL and the damped
    update silently propagates NULL scores instead of failing. Refused
    loudly (one count over the |corpus|-row sizes ledger, fine on the
    compaction cadence) — same discipline as the gram-universe check.
    Docs ABSENT from the index are fine: they are isolated nodes
    (deg 0, keep their seed), exactly batch q80's semantics for
    edge-free documents."""
    from eventsgateway_spark.queries.ext_dedup import (
        MAX_SHINGLE_DF,
        SHINGLE_N,
        jaccard_pairs,
        quality_propagation,
    )

    n, max_df, _ = _ensure_meta_and_migrate(spark, table_prefix)
    if (n, max_df) != (SHINGLE_N, MAX_SHINGLE_DF):
        raise ValueError(
            f"index at {table_prefix!r} was built with (n={n}, "
            f"max_df={max_df}) — not q80's gram universe "
            f"(n={SHINGLE_N}, max_df={MAX_SHINGLE_DF}); propagation "
            "over a different graph would not match batch q80"
        )
    idx = load_corpus_index(spark, table_prefix)
    n_missing = (
        idx.sizes.select(F.col("corpus_id").alias("doc_id"))
        .join(docs.select("doc_id").distinct(), "doc_id", "left_anti")
        .count()
    )
    if n_missing:
        raise ValueError(
            f"docs omits {n_missing} document(s) present in the index "
            f"at {table_prefix!r}; propagating over a graph whose edge "
            "endpoints have no seed would yield NULL scores — pass the "
            "full indexed corpus (or rebuild the index for the subset)"
        )
    edges0 = jaccard_pairs(idx.shingles, 0.5).select("d1", "d2")
    return quality_propagation(docs, edges0=edges0, iters=iters)


def flag_near_dups(
    batch_docs: DataFrame, index: CorpusIndex, threshold: float = 0.5
) -> DataFrame:
    """(doc_id, corpus_id, jaccard) for every batch doc whose shingle
    Jaccard against some corpus doc reaches the threshold. Batch
    shingles are pruned with the SAME hot list as the index, so both
    Jaccard denominators count the same shingle universe (q30
    semantics)."""
    sh_new = batch_shingles(batch_docs).join(
        F.broadcast(index.hot), "s", "left_anti"
    )
    sz_new = sh_new.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz_new"))
    corp = index.shingles.withColumnRenamed("doc_id", "corpus_id")
    inter = (
        sh_new.join(corp, "s")
        .groupBy("doc_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sz_new, "doc_id")
        .join(index.sizes, "corpus_id")
        .select(
            "doc_id",
            "corpus_id",
            (
                F.col("inter").cast("double")
                / (F.col("sz_new") + F.col("sz_corp") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _idempotent_append(df: DataFrame, batch_id: int, path: str) -> None:
    """Write a micro-batch output as its own batch_id partition with
    dynamic overwrite — a checkpoint replay rewrites the same partition
    instead of appending duplicates."""
    (
        df.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


def stream_dedup_against_corpus(
    stream_docs: DataFrame,
    corpus_docs: DataFrame | None,
    novel_path: str,
    dup_path: str,
    checkpoint: str,
    threshold: float = 0.5,
    trigger_once: bool = False,
    index: CorpusIndex | None = None,
) -> StreamingQuery:
    """Route a document stream: near-dups of the corpus → ``dup_path``
    (with best-match evidence), novel docs → ``novel_path``. Pass a
    prebuilt (e.g. table-backed) ``index`` to skip the inline build."""
    if index is None:
        if corpus_docs is None:
            raise ValueError("need corpus_docs or a prebuilt index")
        index = build_corpus_index(corpus_docs)

    def _route(batch_df: DataFrame, batch_id: int) -> None:
        from eventsgateway_spark.queries._util import released_checkpoints

        # per-batch checkpoints released when the sinks complete —
        # long-running streams must not accumulate them (ADVICE r8)
        with released_checkpoints() as ckpt:
            batch = ckpt(batch_df)  # consumed by 2 sinks + the join
            best = ckpt(  # consumed by the dup join AND the anti-join
                flag_near_dups(batch, index, threshold)
                .groupBy("doc_id")
                .agg(F.max(F.struct("jaccard", "corpus_id")).alias("m"))
            )
            dups = batch.join(best, "doc_id").select(
                "doc_id",
                "text",
                F.col("m.corpus_id").alias("matched_corpus_id"),
                F.col("m.jaccard").alias("jaccard"),
            )
            novel = batch.join(best.select("doc_id"), "doc_id", "left_anti")
            _idempotent_append(dups, batch_id, dup_path)
            _idempotent_append(novel, batch_id, novel_path)

    writer = stream_docs.writeStream.foreachBatch(_route).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
