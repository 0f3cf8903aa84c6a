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
- ``{prefix}_occ``: (band, bval, n, gen) — the band-bucket occupancy
  summary, maintained INCREMENTALLY (round 14): each append refreshes
  only the buckets the batch touched (bucket-pruned scan), so the
  skew health metric costs O(batch + touched buckets) instead of the
  O(corpus) groupBy it replaced. Bounded at ``bands * 2**band_w``
  rows regardless of corpus size. It is a health metric, not
  correctness data: a crash mid-occ-overwrite degrades the metric
  until the next append touching those buckets (or a gen mismatch /
  missing table, either of which triggers a full rebuild); the
  ``_bands`` table is never derived from it.

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
mass plus the 2^-band_w birthday floor. A FIXED geometry leaves that
floor linear in corpus size (measured: SCALE.md round-14), so past the
floor threshold the geometry must be SIZED for the corpus:
``ext_dedup.media_geometry_for_rows`` derives (bands, band_w) on the
occupancy ladder (band_w ~ log2 N, bands pinned by pigeonhole), and
signatures wider than the 62-bit BIGINT lane ride the wide
``array<bigint>``-per-band representation end-to-end (build, save,
append incl. repair, lookup — one shared banding/verify law in
ext_dedup). The fixture-floor geometry (7, 8) keeps every oracle
constant byte-identical. Candidate volume at the derived geometry is
~flat in corpus size (scaleprobe --media derived leg, SCALE.md
round-15);
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
    _is_wide_sig,
    banded_signatures,
    hamming_col,
)


def _check_sig_width(sigs: DataFrame, sig_col: str, bands: int, band_w: int):
    """A BIGINT signature lane holds at most 62 bits; a geometry wider
    than that (the derived tier — ext_dedup.media_geometry_for_rows)
    requires wide ``array<bigint>`` signatures, one word per band.
    Shift/mask past bit 62 would silently band garbage — refuse."""
    if not _is_wide_sig(sigs, sig_col) and bands * band_w > 62:
        raise ValueError(
            f"geometry bands={bands} x band_w={band_w} = "
            f"{bands * band_w} bits exceeds the 62-bit BIGINT signature "
            f"lane — supply wide array<bigint> signatures (one "
            f"{band_w}-bit word per band; operators/multimodal."
            "dhash_geom / afp_geom)"
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
    _check_sig_width(sigs, sig_col, bands, band_w)
    banded = banded_signatures(sigs, sig_col, bands, band_w).localCheckpoint()
    return MediaIndex(bands=banded, n_bands=bands, band_w=band_w, max_ham=max_ham)


def _meta_row(spark, table_prefix: str):
    if not spark.catalog.tableExists(f"{table_prefix}_meta"):
        # _bands exists but _meta was dropped out-of-band: the module's
        # refusal style is a descriptive ValueError, never a raw
        # AnalysisException (ADVICE r13)
        raise ValueError(
            f"media index at {table_prefix!r} has a _bands table but no "
            "_meta — the banding geometry is unrecoverable from data "
            "alone; re-run save_media_index to completion (fresh prefix "
            "if the old geometry is unknown)"
        )
    return spark.table(f"{table_prefix}_meta").collect()[0]


# The occupancy-summary protocol (snapshot at save, touched-bucket
# refresh at append, gen staleness, health-metric-only contract) is
# the ONE shared copy in streaming/occ.py — ann_lookup's IVF index
# runs the identical law keyed on cell_id.


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
    _check_sig_width(sigs, sig_col, bands, band_w)
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
    # occupancy summary last, read back from the committed table (one
    # extra columnar scan — save is already O(corpus); re-running the
    # sigs lineage could mean re-decoding payloads). Crash before this
    # write leaves a stale-gen occ that the next append fully rebuilds.
    from eventsgateway_spark.streaming.occ import write_occ_snapshot

    write_occ_snapshot(
        spark, table_prefix, spark.table(f"{table_prefix}_bands"),
        ["band", "bval"], gen,
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
    """Admit new signatures incrementally — per-doc IDEMPOTENT,
    banded with the SAVED geometry (never the caller's defaults),
    appended into the bucket layout. Returns ``{"n_new_docs": int,
    "n_repaired_docs": int, "n_torn_sig_docs": int,
    "bucket_skew": float}`` — torn docs hold >1 distinct stored
    signature (a write torn across attempts); they are reported, never
    repaired (delete + re-append to remediate). Skew is max/avg
    band-bucket occupancy, the rebuild-cadence signal (a viral
    near-dup cluster concentrates one bucket; candidate volume per
    lookup tracks that bucket).

    Admission shape (round 14): ONE corpus scan, semi-joined to the
    batch's doc_ids — the output is bounded by ``batch × bands``
    rows. NO forced broadcast of the batch side (the media_lookup /
    verify_pairs contract): AQE broadcasts it while it is genuinely
    small — the compaction-cadence norm, turning the previous
    corpus-side sort-merge exchange into a map-side semi — and a
    backfill-scale batch degrades to a shuffle join instead of dying
    on the broadcast size limit. Because the scan sees every band row
    of the batch's docs, it also detects PARTIAL docs — a crashed
    append's job commit can leave some of a doc's band files visible
    and others missing — and repairs them by appending exactly the
    missing (band, bval) rows rebuilt from the STORED signature
    (first-write-wins: the batch's signature is ignored for docs
    already present; ADVICE r13).

    The skew metric reads the ``_occ`` summary (module docstring),
    refreshed for ONLY the buckets this batch touched via a
    bucket-pruned scan — O(batch + touched-bucket rows), never
    O(corpus). A missing or stale-generation ``_occ`` (legacy index,
    or a crash between the ``_bands`` append and the ``_occ``
    overwrite followed by a geometry re-save) triggers one full
    rebuild; the touched set is derived from the batch BEFORE the
    idempotence filter, so a replayed batch re-refreshes the same
    buckets and self-heals the common crash window."""
    if not spark.catalog.tableExists(f"{table_prefix}_bands"):
        raise ValueError(
            f"no media index at {table_prefix!r} — save_media_index first"
        )
    cur_gen = _check_same_generation(spark, table_prefix)
    meta = _meta_row(spark, table_prefix)
    n_bands, band_w = int(meta["bands"]), int(meta["band_w"])
    from eventsgateway_spark.queries._util import released_checkpoints

    bands_tbl = spark.table(f"{table_prefix}_bands")
    has_gen = "gen" in bands_tbl.columns
    with released_checkpoints() as ckpt:
        batch = ckpt(new_sigs.dropDuplicates(["doc_id"]))
        # one corpus scan: every stored band row of the batch's docs
        present = ckpt(
            bands_tbl.join(batch.select("doc_id"), "doc_id", "semi")
            .groupBy("doc_id")
            .agg(
                F.collect_set("band").alias("have"),
                # all band rows of a doc share one signature — GUARDED
                # below, not assumed (ADVICE r14): a torn write across
                # attempts could leave band rows with different sigs,
                # and repairing from min(sig) would fabricate band rows
                # with no signal.
                F.min("sig").alias("sig"),
                F.countDistinct("sig").alias("n_sigs"),
            )
        )
        fresh = batch.join(present.select("doc_id"), "doc_id", "left_anti")
        n_new = fresh.count()
        to_append = banded_signatures(fresh, sig_col, n_bands, band_w)
        # torn docs (>1 stored signature) are REPORTED and excluded
        # from repair — first-write-wins can't tell which sig is the
        # first write, so fabricating rows from min(sig) would corrupt;
        # the operator remediation is delete-the-doc's-rows + re-append
        # (or a fresh save).
        n_torn = present.filter(F.col("n_sigs") > 1).count()
        # repair: docs present with missing bands → append only the
        # missing rows, rebuilt from the stored signature
        incomplete = ckpt(
            present.filter(
                (F.size("have") < n_bands) & (F.col("n_sigs") == 1)
            )
        )
        n_repaired = incomplete.count()
        if n_repaired:
            rep_all = banded_signatures(
                incomplete.select("doc_id", F.col("sig").alias(sig_col)),
                sig_col, n_bands, band_w,
            )
            have_rows = incomplete.select(
                "doc_id", F.explode("have").alias("band")
            )
            to_append = to_append.unionByName(
                rep_all.join(have_rows, ["doc_id", "band"], "left_anti")
            )
        if n_new or n_repaired:
            if has_gen:
                to_append = to_append.withColumn("gen", F.lit(cur_gen))
            (
                to_append.write.bucketBy(int(meta["buckets"]), "bval")
                .sortBy("bval")
                .mode("append")
                .saveAsTable(f"{table_prefix}_bands")
            )
        # --- occupancy summary refresh (streaming/occ.py — the ONE
        # protocol copy). Touched buckets: the batch's OWN banding
        # (covers what a crashed prior attempt of this batch appended)
        # plus the repair rows' buckets (stored-sig banding may differ).
        from eventsgateway_spark.streaming.occ import refresh_occ

        touched = banded_signatures(batch, sig_col, n_bands, band_w).select(
            "bval"
        )
        if n_repaired:
            touched = touched.unionByName(to_append.select("bval"))
        skew = refresh_occ(
            spark, table_prefix, spark.table(f"{table_prefix}_bands"),
            ["band", "bval"], "bval", touched, cur_gen, ckpt,
        )
    return {
        "n_new_docs": n_new,
        "n_repaired_docs": n_repaired,
        "n_torn_sig_docs": n_torn,
        "bucket_skew": skew,
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
    if _is_wide_sig(query_sigs, sig_col) != _is_wide_sig(index.bands, "sig"):
        # a BIGINT query banded against a wide index (or vice versa)
        # would compare band values from two different layouts —
        # near-zero recall with no error; refuse loudly instead
        raise ValueError(
            "query signature representation (wide array vs BIGINT lane) "
            "must match the index's — hash queries with the same "
            "geometry/hasher the index was built with"
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
    wide = _is_wide_sig(index.bands, "sig")
    return (
        cand.select(
            "qid",
            "doc_id",
            hamming_col("qsig", "sig", wide).alias("hamming"),
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
    quarantine_path: str | None = None,
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
    them on the compaction cadence with :func:`append_media_index`.

    UN-HASHABLE assets — rows the hasher emits no signature for (the
    default hashers drop NULL payloads: the zero-norm convention) —
    cannot be near-dup-checked at all. With ``quarantine_path`` set
    they route there (same batch_id idempotent-overwrite contract);
    left ``None`` they flow to the novel sink like any unmatched
    asset, so downstream admission must tolerate NULL payloads
    (ADVICE r13 — this default is now explicit, not accidental)."""
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
            checkable = batch
            if quarantine_path is not None:
                hashed_ids = sigs.select(F.col("doc_id").alias("asset_id"))
                unhashed = batch.join(
                    hashed_ids, "asset_id", "left_anti"
                ).select("asset_id", "media_type", "payload", "n_bytes")
                checkable = batch.join(hashed_ids, "asset_id", "semi")
                _idempotent_append(unhashed, batch_id, quarantine_path)
            novel = checkable.join(
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
