"""Document-curation transforms: PII redaction + Gopher-style quality
gating as STATELESS column expressions, so the exact same code curates
a batch corpus (queries/ext_curation.py q66/q67) and a document stream
(plain projection/filter inside Structured Streaming — no state, no
watermark needed; tests/test_curation.py pins batch/stream parity).

Mirrors the ingest validate() pattern (operators/transforms.py P1/A4):
`curate()` splits into (kept, quarantine) with a tagged reject reason,
the quarantine side-output being what a 100 TB pipeline ships to a
review bucket instead of silently dropping.

Scale posture: all JVM built-ins (regex, array math) inside
whole-stage codegen; map-only — no shuffle is introduced by curation
itself. Rule comparisons are integer-scaled (sum_len >= 3*n rather
than float means) so results are exact and engine-independent.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eventsgateway_spark.functions.text import EN_STOPWORDS, count_in, tokens

# PII patterns restricted to the RE2-and-Java-common regex subset
# (char classes + bounded repeats + (?i) + \b; no lookaround/backrefs)
# so the same patterns run under Spark (java.util.regex) and any
# RE2-based engine. Case-insensitive and open-ended TLD so real-world
# addresses ('User@Example.COM', 'foo@bar.systems') are caught; the IP
# pattern is \b-anchored so it cannot fire inside longer digit runs
# ('v1.2.3.4567'). Octets are not range-checked (999.999.999.999 still
# redacts) — over-redaction is the safe failure mode for a scrubber.
EMAIL_RE = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
IP_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
PHONE_RE = "\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"

# Gopher-style rule bounds (Rae et al. 2021 §A1.1), re-bounded for the
# fixture's ~30-token documents.
MIN_TOKENS, MAX_TOKENS = 20, 10_000


def redact_pii(text: Column) -> Column:
    """Replace emails, phone numbers and IPv4s with typed placeholders.

    Order matters: emails first so the IP pattern cannot eat a numeric
    mail host, phones before IPs (specific before general)."""
    c = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, PHONE_RE, "<PHONE>")
    return F.regexp_replace(c, IP_RE, "<IP>")


def pii_count(text: Column) -> Column:
    """Total PII matches of all classes in ``text``."""
    return (
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0))
        + F.size(F.regexp_extract_all(text, F.lit(IP_RE), 0))
        + F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), 0))
    )


def quality_metrics(toks: Column) -> list[Column]:
    """Per-document metric columns the quality rules are built from:
    n_tok, n_uniq, sum_len, stop_hits.

    Takes a PRE-TOKENIZED column that the caller has PROJECTED to a
    real column (``.alias(...)`` in a prior select) — the four metrics
    each consume the token array, and an inlined ``tokens(text)``
    expression re-evaluates once per consuming alias (4× tokenization
    measured in q67/curate's plans; the same CollapseProject lesson as
    ext_text.decon_toks). A projected non-cheap alias with multiple
    references is never re-inlined."""
    return [
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda acc, x: acc + x
        ).alias("sum_len"),
        count_in(toks, EN_STOPWORDS).alias("stop_hits"),
    ]


def quality_flags() -> list[Column]:
    """Rule-failure flags (0 pass / 1 fail) over the metric columns.
    Integer-scaled: mean word length in [3,10] <=> 3n <= sum_len <= 10n;
    unique-token ratio >= 0.3 <=> 10*n_uniq >= 3*n_tok."""
    return [
        F.when(F.col("n_tok").between(MIN_TOKENS, MAX_TOKENS), 0)
        .otherwise(1)
        .alias("f_len"),
        F.when(
            (F.col("sum_len") >= 3 * F.col("n_tok"))
            & (F.col("sum_len") <= 10 * F.col("n_tok")),
            0,
        )
        .otherwise(1)
        .alias("f_word_len"),
        F.when(10 * F.col("n_uniq") >= 3 * F.col("n_tok"), 0)
        .otherwise(1)
        .alias("f_uniq"),
        F.when(F.col("stop_hits") >= 2, 0).otherwise(1).alias("f_stop"),
    ]


@dataclass
class CurationSplit:
    kept: DataFrame
    quarantine: DataFrame


def curate(df: DataFrame, text_col: str = "text") -> CurationSplit:
    """Redact PII, apply the quality rules, and split into
    (kept, quarantine); quarantined rows carry ``reject_reason`` =
    the first failing rule. Works unchanged on streaming frames.

    Redaction happens BEFORE the split (flags are computed from the
    pre-redaction metrics, which don't depend on PII placeholders), so
    the quarantine side-output shipped to a review bucket is scrubbed
    too — raw PII never leaves the curation stage.

    The metric/flag names below are RESERVED on the input frame — a
    pre-existing column of the same name would make the flag
    expressions ambiguous (or silently bind the caller's column), so
    collisions fail loudly here instead."""
    reserved = {
        "n_tok", "n_uniq", "sum_len", "stop_hits", "_q_toks",
        "f_len", "f_word_len", "f_uniq", "f_stop", "reject_reason",
    }
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"curate() reserves column names {sorted(clash)}; rename them "
            "on the input frame"
        )
    # tokens projected ONCE, then consumed by the four metric columns
    # (quality_metrics docstring) — the second select drops _q_toks
    toked = df.select(*df.columns, tokens(F.col(text_col)).alias("_q_toks"))
    flagged = (
        toked.select(*df.columns, *quality_metrics(F.col("_q_toks")))
        .select(*df.columns, *quality_flags())
        .withColumn(text_col, redact_pii(F.col(text_col)))
    )
    passes = (
        (F.col("f_len") + F.col("f_word_len") + F.col("f_uniq") + F.col("f_stop")) == 0
    )
    reason = (
        F.when(F.col("f_len") == 1, "bad_length")
        .when(F.col("f_word_len") == 1, "bad_word_length")
        .when(F.col("f_uniq") == 1, "low_unique_ratio")
        .otherwise("no_stopwords")
    )
    kept = flagged.filter(passes).drop("f_len", "f_word_len", "f_uniq", "f_stop")
    quarantine = (
        flagged.filter(~passes)
        .withColumn("reject_reason", reason)
        .drop("f_len", "f_word_len", "f_uniq", "f_stop")
    )
    return CurationSplit(kept=kept, quarantine=quarantine)
