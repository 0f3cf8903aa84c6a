"""Durable perceptual-signature index for media near-dup serving.

The serving side of q89/q90 (queries/ext_dedup.py): a continuously-
ingesting pipeline cannot re-run the batch pair join against the whole
corpus per micro-batch — it needs the corpus's perceptual signatures
(image dHash-56 / audio afp56, both 64-bit-lane integers) materialized
once in the banded layout the Manku candidate join consumes, with
incremental admission for newly accepted assets. This module is the
media sibling of ``near_dup.save_corpus_index`` (shingle index) and
``ann_lookup.save_ivf_index`` (vector index), sharing their protocol:

- ``{prefix}_bands``: (doc_id, sig, band, bval, gen) — the signature
  exploded into its ``bands`` (band, band-value) rows (ONE copy of the
  banding law: queries/ext_dedup.banded_signatures), BUCKETED on
  ``bval`` so every lookup/batch join co-locates against the table
  layout and only the (small) query side shuffles. 8-byte signatures,
  never payloads — the index over 10^9 assets is tens of GB.
- ``{prefix}_meta``: (bands, band_w, max_ham, buckets, gen) — the
  banding parameters are pinned so appends/lookups can never silently
  band a different geometry than the index was built with; ``max_ham``
  is a default the lookup may override DOWNWARD (a tighter bound is
  always pigeonhole-safe; looser would need more bands than stored).

Crash protocol (the IVF-index contract, two tables instead of three):
every save stamps one ``gen`` into both tables; ``_meta`` lands first,
``_bands`` is the commit point. A first save that crashes in between
leaves a phantom ``_meta`` that pins nothing — the next save clears it
(ADVICE r8). A RE-save that crashes in between leaves ``_meta`` one
generation ahead of ``_bands``; load/append REFUSE the mixed index
(ADVICE r10) until a save completes. Re-saving in place with different
parameters is refused outright (fresh prefix + name swap instead).

Scale posture (10^9+ assets): candidate volume per lookup is the
band-bucket occupancy of the query's ``bands`` buckets — true near-dup
mass plus the 2^-band_w birthday floor — independent of corpus size;
the corpus side is never reshuffled (bucketBy) and never pinned in
executor memory. Appends are per-doc idempotent (anti-join on doc_id)
so a crashed-and-replayed admission batch cannot double-index a doc.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eventsgateway_spark.queries.ext_dedup import (
    IMG_HAM_BANDS,
    IMG_HAM_MAX,
    _IMG_BAND_W,
    banded_signatures,
)


class MediaIndex(NamedTuple):
    """The reusable side of a signature index (in-session form)."""

    bands: DataFrame  # (doc_id, sig, band, bval)
    n_bands: int
    band_w: int
    max_ham: int


def build_media_index(
    sigs: DataFrame,
    sig_col: str = "dhash",
    bands: int = IMG_HAM_BANDS,
    band_w: int = _IMG_BAND_W,
    max_ham: int = IMG_HAM_MAX,
) -> MediaIndex:
    """In-session index over a (doc_id, <sig_col>) frame
    (localCheckpoint pins); the durable form is
    :func:`save_media_index` + :func:`load_media_index`."""
    if max_ham > bands - 1:
        raise ValueError(
            f"pigeonhole bound: max_ham={max_ham} needs >= {max_ham + 1} "
            f"bands, got {bands}"
        )
    banded = banded_signatures(sigs, sig_col, bands, band_w).localCheckpoint()
    return MediaIndex(bands=banded, n_bands=bands, band_w=band_w, max_ham=max_ham)


def _meta_row(spark, table_prefix: str):
    return spark.table(f"{table_prefix}_meta").collect()[0]


def _check_same_generation(spark, table_prefix: str) -> int:
    """Refuse a mixed-generation index (a RE-save crashed between the
    ``_meta`` and ``_bands`` overwrites) — the IVF contract. Returns
    the verified generation."""
    meta = _meta_row(spark, table_prefix)
    bands_tbl = spark.table(f"{table_prefix}_bands")
    if "gen" not in bands_tbl.columns:
        return int(meta["gen"])
    row = bands_tbl.select("gen").limit(1).collect()
    data_gen = int(row[0]["gen"]) if row else int(meta["gen"])
    if data_gen != int(meta["gen"]):
        raise ValueError(
            f"mixed-generation media index at {table_prefix!r} "
            f"(_meta gen {int(meta['gen'])}, _bands gen {data_gen}) — "
            "a re-save crashed mid-way; re-run save_media_index to "
            "completion before loading or appending"
        )
    return data_gen


def save_media_index(
    sigs: DataFrame,
    table_prefix: str,
    sig_col: str = "dhash",
    buckets: int = 32,
    bands: int = IMG_HAM_BANDS,
    band_w: int = _IMG_BAND_W,
    max_ham: int = IMG_HAM_MAX,
) -> None:
    """Materialize the banded signature index as catalog tables (see
    module docstring for layout + crash protocol)."""
    if max_ham > bands - 1:
        raise ValueError(
            f"pigeonhole bound: max_ham={max_ham} needs >= {max_ham + 1} "
            f"bands, got {bands}"
        )
    spark = sigs.sparkSession
    have_meta = spark.catalog.tableExists(f"{table_prefix}_meta")
    have_bands = spark.catalog.tableExists(f"{table_prefix}_bands")
    if have_meta and not have_bands:
        # phantom _meta (crashed FIRST save): pins nothing loadable —
        # clear and fall through to a clean first save (ADVICE r8)
        spark.sql(f"DROP TABLE IF EXISTS {table_prefix}_meta")
        have_meta = False
    gen = 1
    if have_meta:
        old = _meta_row(spark, table_prefix)
        if (int(old["bands"]), int(old["band_w"]), int(old["buckets"])) != (
            int(bands), int(band_w), int(buckets)
        ):
            raise ValueError(
                f"{table_prefix} already holds an index built with "
                f"(bands={old['bands']}, band_w={old['band_w']}, "
                f"buckets={old['buckets']}); re-saving in place with "
                f"(bands={bands}, band_w={band_w}, buckets={buckets}) "
                "is refused — a crash mid-save would mix geometries. "
                "Save to a fresh prefix and swap names."
            )
        gen = int(old["gen"]) + 1
    banded = banded_signatures(sigs, sig_col, bands, band_w)
    # _meta first, _bands is the commit point (module docstring)
    spark.createDataFrame(
        [(int(bands), int(band_w), int(max_ham), int(buckets), int(gen))],
        "bands int, band_w int, max_ham int, buckets int, gen int",
    ).write.mode("overwrite").saveAsTable(f"{table_prefix}_meta")
    (
        banded.withColumn("gen", F.lit(gen))
        .write.bucketBy(buckets, "bval")
        .sortBy("bval")
        .mode("overwrite")
        .saveAsTable(f"{table_prefix}_bands")
    )


def load_media_index(spark, table_prefix: str) -> MediaIndex:
    """Reopen a saved index after the generation check; the stamp
    column is dropped so the served frame keeps the build shape."""
    if not spark.catalog.tableExists(f"{table_prefix}_bands"):
        if spark.catalog.tableExists(f"{table_prefix}_meta"):
            raise ValueError(
                f"no complete media index at {table_prefix!r} (a phantom "
                "first save left _bands missing) — run save_media_index "
                "to completion first"
            )
        raise ValueError(
            f"no media index at {table_prefix!r} — save_media_index first"
        )
    _check_same_generation(spark, table_prefix)
    meta = _meta_row(spark, table_prefix)
    return MediaIndex(
        bands=spark.table(f"{table_prefix}_bands").drop("gen"),
        n_bands=int(meta["bands"]),
        band_w=int(meta["band_w"]),
        max_ham=int(meta["max_ham"]),
    )


def append_media_index(
    spark, table_prefix: str, new_sigs: DataFrame, sig_col: str = "dhash"
) -> dict:
    """Admit new signatures incrementally — per-doc IDEMPOTENT
    (anti-join on doc_id: a replayed admission batch cannot
    double-index), banded with the SAVED geometry (never the caller's
    defaults), appended into the bucket layout. Returns
    ``{"n_new_docs": int, "bucket_skew": float}`` — skew is max/avg
    band-bucket occupancy, the rebuild-cadence signal (a viral
    near-dup cluster concentrates one bucket; candidate volume per
    lookup tracks that bucket)."""
    if not spark.catalog.tableExists(f"{table_prefix}_bands"):
        raise ValueError(
            f"no media index at {table_prefix!r} — save_media_index first"
        )
    cur_gen = _check_same_generation(spark, table_prefix)
    meta = _meta_row(spark, table_prefix)
    # every doc appears once per band — the idempotence anti-join only
    # needs band 0's rows (1/bands of the table; round-13 review)
    existing = (
        spark.table(f"{table_prefix}_bands")
        .filter(F.col("band") == 0)
        .select("doc_id")
    )
    fresh = (
        new_sigs.dropDuplicates(["doc_id"])
        .join(existing, "doc_id", "left_anti")
        .localCheckpoint()
    )
    try:
        n_new = fresh.count()
        if n_new:
            banded = banded_signatures(
                fresh, sig_col, int(meta["bands"]), int(meta["band_w"])
            )
            if "gen" in spark.table(f"{table_prefix}_bands").columns:
                banded = banded.withColumn("gen", F.lit(cur_gen))
            (
                banded.write.bucketBy(int(meta["buckets"]), "bval")
                .sortBy("bval")
                .mode("append")
                .saveAsTable(f"{table_prefix}_bands")
            )
    finally:
        from eventsgateway_spark.queries._util import release_frame

        release_frame(fresh)
    occ = (
        spark.table(f"{table_prefix}_bands")
        .groupBy("band", "bval")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"), F.avg("n").alias("avg"))
        .collect()[0]
    )
    return {
        "n_new_docs": n_new,
        "bucket_skew": float(occ["mx"]) / float(occ["avg"]) if occ["avg"] else 0.0,
    }


def media_lookup_batch(
    query_sigs: DataFrame,
    index: MediaIndex,
    sig_col: str = "dhash",
    max_ham: int | None = None,
) -> DataFrame:
    """(qid, doc_id, hamming) — every indexed asset within ``max_ham``
    of each query signature. The query side is banded with the INDEX
    geometry and equi-joined on (band, bval) against the bucketed
    corpus table (only the query side shuffles); verification is one
    integer popcount per candidate. No forced broadcast of the query
    side — an availableNow backlog replay can be arbitrarily large;
    AQE broadcasts it while it is genuinely small (the ann_lookup
    contract). ``max_ham`` may only TIGHTEN the saved bound: a looser
    bound than ``bands - 1`` has no pigeonhole guarantee in the stored
    geometry and would silently lose recall."""
    bound = index.max_ham if max_ham is None else max_ham
    if bound > index.n_bands - 1:
        raise ValueError(
            f"max_ham={bound} exceeds the index's pigeonhole bound "
            f"({index.n_bands - 1}) — rebuild with more bands instead"
        )
    q = banded_signatures(
        query_sigs, sig_col, index.n_bands, index.band_w
    ).select(
        F.col("doc_id").alias("qid"),
        F.col("sig").alias("qsig"),
        "band",
        "bval",
    )
    cand = (
        index.bands.join(q, ["band", "bval"])
        .select("qid", "doc_id", "qsig", "sig")
        .filter(F.col("qid") != F.col("doc_id"))
        .distinct()
    )
    return (
        cand.select(
            "qid",
            "doc_id",
            F.bit_count(F.col("qsig").bitwiseXOR(F.col("sig")))
            .cast("bigint")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= bound)
    )


def stream_media_dedup(
    stream_assets: DataFrame,
    index: MediaIndex,
    novel_path: str,
    dup_path: str,
    checkpoint: str,
    hasher=None,
    trigger_once: bool = False,
):
    """Route an asset stream against a prebuilt signature index:
    assets whose perceptual signature lands within the index's Hamming
    bound of some indexed asset → ``dup_path`` (with the best match's
    id + distance as evidence), novel assets → ``novel_path``. The
    near_dup.stream_dedup_against_corpus shape on the media tier:
    foreachBatch (the candidate join + popcount verify is a batch
    plan), both sinks written as batch_id=N partitions with dynamic
    overwrite so a checkpoint replay rewrites its own partition
    instead of appending duplicates.

    ``hasher`` maps an asset micro-batch (MEDIA_SCHEMA columns) to
    (asset_id, dhash) — default ``operators.multimodal.image_dhash``;
    pass ``audio_fingerprint``-based hashing for audio streams. New
    assets admitted to the corpus do NOT update the index mid-stream
    (batch-boundary consistency — the corpus-index contract); admit
    them on the compaction cadence with :func:`append_media_index`."""
    if hasher is None:
        from eventsgateway_spark.operators.multimodal import image_dhash

        def hasher(assets):
            return image_dhash(assets).select(
                F.col("asset_id").alias("doc_id"),
                F.col("dhash").alias("dhash"),
            )

    from eventsgateway_spark.streaming.near_dup import _idempotent_append

    sig_col = "dhash"

    def _route(batch_df: DataFrame, batch_id: int) -> None:
        from eventsgateway_spark.queries._util import released_checkpoints

        with released_checkpoints() as ckpt:
            batch = ckpt(batch_df)  # consumed by 2 sinks + the hash
            sigs = ckpt(hasher(batch))  # consumed by lookup + anti-join
            best = ckpt(
                media_lookup_batch(sigs, index, sig_col=sig_col)
                .groupBy("qid")
                # min(struct) = closest match, smallest doc_id tie-break
                .agg(F.min(F.struct("hamming", "doc_id")).alias("m"))
                .select(
                    F.col("qid").alias("asset_id"),
                    F.col("m.doc_id").alias("matched_id"),
                    F.col("m.hamming").alias("hamming"),
                )
            )
            dups = batch.join(best, "asset_id").select(
                "asset_id", "media_type", "n_bytes", "matched_id", "hamming"
            )
            novel = batch.join(
                best.select("asset_id"), "asset_id", "left_anti"
            ).select("asset_id", "media_type", "payload", "n_bytes")
            _idempotent_append(dups, batch_id, dup_path)
            _idempotent_append(novel, batch_id, novel_path)

    writer = stream_assets.writeStream.foreachBatch(_route).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
