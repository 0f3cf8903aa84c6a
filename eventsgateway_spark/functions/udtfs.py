"""Python UDTFs — the table-function tier of the Q16 UDF surface.

Spark's UDF ladder, slowest-but-most-flexible first: Python UDTF (rows
out per row in, arbitrary Python) → pandas_udf / applyInPandas (Arrow
batches) → built-in functions (JVM codegen). The engine keeps hot-path
operators JVM-side (q51 chunks with posexplode+slice); this module is
the escape hatch for semantics Spark can't express — e.g. chunking on
a REAL tokenizer (BPE merges are stateful and not column-algebra).

``ChunkDocUDTF`` mirrors q51's whitespace chunking exactly so the
parity test can pin UDTF output to the JVM plan; swap ``_tokenize``
for a real tokenizer to get the production variant.

Scale posture: a UDTF runs per input partition with rows streamed
through a Python worker — linear, no shuffle of its own, but pays
serde per row. Use it only where the per-row logic truly needs Python;
otherwise stay with the JVM chunker (q51).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

from eventsgateway_spark.functions.text import CHUNK_STRIDE, CHUNK_TOKENS


def _tokenize(text: str | None) -> list[str]:
    """Whitespace tokens, empties dropped — mirror of functions.text.tokens."""
    return [t for t in (text or "").split(" ") if t]


@udtf(returnType="doc_id bigint, chunk_id bigint, n_tokens bigint, chunk_text string")
class ChunkDocUDTF:
    """(doc_id, text) → one row per overlapping token window."""

    def eval(self, doc_id: int, text: str):  # noqa: D102 — UDTF contract
        toks = _tokenize(text)
        for chunk_id, start in enumerate(range(0, len(toks), CHUNK_STRIDE)):
            window = toks[start : start + CHUNK_TOKENS]
            yield doc_id, chunk_id, len(window), " ".join(window)


def register_udtfs(spark) -> None:
    """Make the UDTFs callable from SQL (FROM-clause / LATERAL)."""
    from eventsgateway_spark.shipping import ship_package

    ship_package(spark)  # UDTF classes pickle by module reference
    spark.udtf.register("chunk_doc", ChunkDocUDTF)
