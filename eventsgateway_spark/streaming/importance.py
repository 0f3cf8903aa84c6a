"""Streaming importance scoring — the streaming form of q82 (DSIR).

Batch q82 scores the corpus against itself; the deployment shape at
100 TB is different: the importance model (per-term target-vs-corpus
log-ratio table + smoothing constants) is trained ONCE over a frozen
reference corpus, saved, and every arriving crawl micro-batch is
scored against it — the same frozen-model-vs-live-stream posture as
streaming/ann_lookup.py (frozen IVF centroids) and
streaming/near_dup.py (frozen corpus shingle index).

Per micro-batch (the 100 TB story):
- tokenize the batch once (``functions.text.tokens``, the engine-wide
  delimiter contract) and equi-join the token stream against the
  saved ``lr`` table on term — row volume is unchanged by the join;
  AQE broadcasts the lr table while the vocabulary is genuinely small
  and falls back to a shuffle join when it is not (no forced hint —
  a 100 TB-corpus vocabulary is NOT broadcastable);
- terms the frozen reference never saw score the model's OOV constant
  (``meta.oov_lr_u`` — the add-one-smoothed formula at zero counts,
  so streamed scores are exactly what batch q82 WOULD have assigned
  had the term been an in-vocabulary singleton-free entry);
- one (doc_id) hash aggregate reduces to per-doc integer micro-nat
  weights — all-integer cross-row math, so replaying a micro-batch
  reproduces byte-identical rows;
- outputs land as the batch's own ``batch_id`` partition with dynamic
  overwrite (``_idempotent_append``): at-least-once redelivery
  rewrites the same partition instead of duplicating rows.

Save protocol (two parquet tables under one root): both tables carry
the same monotonically-increasing ``gen`` stamp and ``meta`` is
written LAST — the commit point. A re-save that crashes between the
``lr`` and ``meta`` writes leaves mixed stamps, which
:func:`load_importance_model` REFUSES instead of silently serving a
new vocabulary with old constants (the ADVICE-r10 mixed-generation
class, same contract as ann_lookup's IVF stamps).

Parity: a stream scored against a model trained on corpus C, fed the
documents of C, reproduces batch q82 bit-for-bit
(tests/test_streaming.py::test_stream_importance_matches_batch_q82).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from eventsgateway_spark.queries.ext_sampling import (
    importance_model,
    score_importance,
)
from eventsgateway_spark.streaming.near_dup import _idempotent_append

LR = "lr"
META = "meta"


def _table_path(root: str, name: str) -> str:
    return os.path.join(root, name)


def _saved_gen(spark: SparkSession, path: str) -> int | None:
    if not os.path.exists(path):
        return None
    row = spark.read.parquet(path).select(F.max("gen").alias("g")).first()
    return None if row is None or row["g"] is None else int(row["g"])


def save_importance_model(
    docs: DataFrame, root: str, target_lang: str = "en"
) -> int:
    """Train and persist the importance model over a reference corpus.
    Returns the generation written. ``lr`` first, ``meta`` last (the
    commit point); both stamped with gen = previous meta gen + 1."""
    spark = docs.sparkSession
    prev = _saved_gen(spark, _table_path(root, META))
    gen = 0 if prev is None else prev + 1
    lr, meta = importance_model(docs, target_lang=target_lang)
    lr.withColumn("gen", F.lit(gen)).write.mode("overwrite").parquet(
        _table_path(root, LR)
    )
    meta.withColumn("gen", F.lit(gen)).write.mode("overwrite").parquet(
        _table_path(root, META)
    )
    return gen


def load_importance_model(spark: SparkSession, root: str) -> tuple[DataFrame, dict]:
    """(lr frame, meta dict) — refuses a mixed-generation save. The
    meta collect is ONE row of scalars (smoothing constants), the
    bounded metadata-collect class, not a data-path collect."""
    lr = spark.read.parquet(_table_path(root, LR))
    meta_df = spark.read.parquet(_table_path(root, META))
    meta_row = meta_df.first()
    if meta_row is None:
        raise ValueError(f"importance model at {root!r} has an empty meta table")
    lr_gens = [r["gen"] for r in lr.select("gen").distinct().collect()]
    if len(lr_gens) != 1 or lr_gens[0] != meta_row["gen"]:
        raise ValueError(
            f"mixed-generation importance model at {root!r} "
            f"(lr gens {sorted(lr_gens)} vs meta gen {meta_row['gen']}) — "
            "a re-save crashed between the lr and meta writes; re-run "
            "save_importance_model to completion"
        )
    return lr.select("term", "lr_u"), {
        "v": int(meta_row["v"]),
        "t_src": int(meta_row["t_src"]),
        "t_tgt": int(meta_row["t_tgt"]),
        "oov_lr_u": int(meta_row["oov_lr_u"]),
        "gen": int(meta_row["gen"]),
    }


def check_model_generation(
    spark: SparkSession, model_root: str, expected_gen: int
) -> None:
    """Raise if the saved model's generation moved past
    ``expected_gen`` — the per-micro-batch staleness guard of
    :func:`stream_importance_weights`, exposed for direct testing."""
    cur = spark.read.parquet(_table_path(model_root, META)).first()
    if cur is None or int(cur["gen"]) != expected_gen:
        raise ValueError(
            f"importance model at {model_root!r} was retrained "
            f"mid-stream (gen {expected_gen} -> "
            f"{None if cur is None else int(cur['gen'])}) — restart "
            "the stream to score against the new model"
        )


def stream_importance_weights(
    doc_stream: DataFrame,
    model_root: str,
    out_path: str,
    checkpoint: str,
    trigger_once: bool = False,
    metrics_path: str | None = None,
) -> StreamingQuery:
    """Score a document stream against the saved model; land
    (doc_id, lang, source, n_tok, wt_unats, tgt_like) per micro-batch
    under its own batch_id partition (idempotent replay).

    ``metrics_path`` (optional) additionally lands ONE row per batch —
    (n_tok, n_oov, oov_ppm) — the model-staleness signal: the frozen
    reference's vocabulary ages as the crawl's language drifts, every
    unseen term scores the flat OOV constant, and a rising OOV share
    means the weights are increasingly the constant rather than the
    model. Retrain (``save_importance_model`` over a fresh reference)
    when oov_ppm grows past the operator's threshold — the same
    report-drift/gate-rebuild contract as near_dup's hot-list drift
    and ann_lookup's cell-skew metrics. Integer ppm: exact, and safe
    from the pandas NULL-degradation class."""
    spark = doc_stream.sparkSession
    lr, meta = load_importance_model(spark, model_root)
    oov = meta["oov_lr_u"]
    gen0 = meta["gen"]

    def _score(batch_df: DataFrame, batch_id: int) -> None:
        # Re-verify the model generation EVERY batch (round-11b review
        # finding): the lazy ``lr`` frame re-reads the parquet files per
        # action, so a save_importance_model retrain mid-stream would
        # silently pair the NEW lr table with the OLD captured oov
        # constant — the exact mixed-generation state load exists to
        # refuse. One tiny meta-file read per batch; fail the stream
        # loudly so the operator restarts it against the new model.
        check_model_generation(spark, model_root, gen0)
        from eventsgateway_spark.queries._util import released_checkpoints

        with released_checkpoints() as ckpt:
            # ONE scoring pass feeds both sinks (the sibling
            # foreachBatch bodies' released_checkpoints discipline —
            # without it the tokenize + lr-join lineage runs once per
            # action when metrics are enabled)
            scored = score_importance(batch_df, lr, oov_lr_u=oov, mark_oov=True)
            if metrics_path is not None:
                scored = ckpt(scored)
            out = scored.select(
                "doc_id",
                "lang",
                "source",
                "n_tok",
                "wt_unats",
                F.when(F.col("wt_unats") >= 0, 1)
                .otherwise(0)
                .cast("int")
                .alias("tgt_like"),
            )
            _idempotent_append(out, batch_id, out_path)
            if metrics_path is not None:
                m = scored.agg(
                    F.coalesce(F.sum("n_tok"), F.lit(0))
                    .cast("bigint")
                    .alias("n_tok"),
                    F.coalesce(F.sum("n_oov"), F.lit(0))
                    .cast("bigint")
                    .alias("n_oov"),
                ).select(
                    "n_tok",
                    "n_oov",
                    (
                        F.col("n_oov") * 1_000_000
                        / F.greatest(F.col("n_tok"), F.lit(1))
                    )
                    .cast("bigint")
                    .alias("oov_ppm"),
                )
                _idempotent_append(m, batch_id, metrics_path)

    writer = doc_stream.writeStream.foreachBatch(_score).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
