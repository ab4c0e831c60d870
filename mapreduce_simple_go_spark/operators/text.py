"""Reference-parity text queries (the reference's application suite).

These reproduce the query semantics of the eight MapReduce apps in
/root/reference/src/mrapps/ as declarative DataFrame plans:

- word count            — wc.go:22-44        -> :func:`word_count`
- inverted index        — indexer.go:20-39   -> :func:`inverted_index`
- per-file metrics      — crash.go:34-55     -> :func:`per_file_metrics`
- count-per-key         — early_exit.go:21-40-> :func:`count_per_key`

Where the reference ships every ``(word,"1")`` pair through the shuffle with
no combiner (worker.go:92-94), these plans use DataFrame aggregation and get
map-side partial aggregation for free — the single biggest scale win over the
reference design (a 100 TB word count shuffles per-partition partial counts,
not one row per word occurrence).

Each query has a DuckDB oracle (same semantics in ANSI-ish SQL) used by the
driver's differential check — the same methodology as the reference's
sequential-golden diff (test-mr.sh:66-98).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import tokens

DUCK_TOKENS = (
    "list_filter(regexp_split_to_array({col}, '[^\\p{{L}}]+'), w -> w <> '')"
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def doc_tokens(docs: DataFrame) -> DataFrame:
    """One row per token occurrence: (doc_id, word).

    The scan only needs (doc_id, text); selecting before exploding keeps
    column pruning effective at the parquet reader.
    """
    return docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("word"))


def word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count over the corpus (reference wc app).

    groupBy().count() compiles to partial+final hash aggregation — the
    shuffle carries one row per (partition, word), not per occurrence.
    """
    return (
        doc_tokens(_docs(spark, sf_dir))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


WORD_COUNT_SQL = f"""
SELECT word, COUNT(*) AS cnt
FROM (
  SELECT unnest({DUCK_TOKENS.format(col='text')}) AS word
  FROM documents
)
GROUP BY word
"""


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index (reference indexer app): word -> sorted posting list.

    The reference dedups (word, doc) map-side with a hash set
    (indexer.go:21-25); ``.distinct()`` is the declarative equivalent and
    Catalyst plans it as a partial-dedup aggregate before the shuffle.
    Output format parity: ``"<ndocs> <doc1>,<doc2>,..."`` (indexer.go:36-39)
    split into typed columns plus the formatted string.
    """
    toks = doc_tokens(_docs(spark, sf_dir)).select(
        "word", F.col("doc_id").cast("string").alias("doc")
    )
    # collect_set dedups during partial aggregation, so one shuffle covers
    # both the reference's map-side dedup and the final grouping (a
    # distinct + groupBy formulation costs two shuffles for the same plan).
    return (
        toks.groupBy("word")
        .agg(F.sort_array(F.collect_set("doc")).alias("docs_arr"))
        .select(
            "word",
            F.size("docs_arr").cast("long").alias("n_docs"),
            F.array_join(F.col("docs_arr"), ",").alias("docs"),
        )
        .withColumn("posting", F.concat_ws(" ", F.col("n_docs"), F.col("docs")))
    )


INVERTED_INDEX_SQL = f"""
WITH t AS (
  SELECT DISTINCT word, doc
  FROM (
    SELECT unnest({DUCK_TOKENS.format(col='text')}) AS word,
           CAST(doc_id AS VARCHAR) AS doc
    FROM documents
  )
)
SELECT word,
       COUNT(*) AS n_docs,
       string_agg(doc, ',' ORDER BY doc) AS docs,
       CAST(COUNT(*) AS VARCHAR) || ' ' || string_agg(doc, ',' ORDER BY doc) AS posting
FROM t
GROUP BY word
"""


def per_file_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file scalar projection + sorted-concat aggregate (crash/nocrash apps).

    Map side emits four KV rows per document — ("a", doc_id), ("b",
    len(doc_id)), ("c", byte-len(text)), ("d", "xyzzy") (crash.go:34-43);
    reduce sorts values and joins with spaces (crash.go:45-55). The
    ``sort_array`` is what makes the result deterministic under any
    partitioning — same trick the reference apps use.
    """
    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("doc"),
        F.octet_length("text").alias("blen"),
    )
    kv = docs.select(
        F.expr(
            "stack(4, 'a', doc, 'b', cast(length(doc) as string), "
            "'c', cast(blen as string), 'd', 'xyzzy') as (key, value)"
        )
    )
    return kv.groupBy("key").agg(
        F.array_join(F.sort_array(F.collect_list("value")), " ").alias("merged")
    )


PER_FILE_METRICS_SQL = """
WITH kv AS (
  SELECT 'a' AS key, CAST(doc_id AS VARCHAR) AS value FROM documents
  UNION ALL
  SELECT 'b', CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR) FROM documents
  UNION ALL
  SELECT 'c', CAST(strlen(text) AS VARCHAR) FROM documents
  UNION ALL
  SELECT 'd', 'xyzzy' FROM documents
)
SELECT key, string_agg(value, ' ' ORDER BY value) AS merged
FROM kv
GROUP BY key
"""


def count_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-per-key (early_exit app semantics: group by input name, count).

    Grouped on ``source`` (the fixture's many-docs-per-key column) so the
    aggregation actually reduces; on doc_id every count would be 1.
    """
    return (
        _docs(spark, sf_dir)
        .groupBy(F.col("source").alias("key"))
        .agg(F.count("*").alias("cnt"))
    )


COUNT_PER_KEY_SQL = """
SELECT source AS key, COUNT(*) AS cnt FROM documents GROUP BY source
"""


QUERIES = {
    "wc": word_count,
    "inverted_index": inverted_index,
    "per_file_metrics": per_file_metrics,
    "count_per_key": count_per_key,
}

ORACLES = {
    "wc": WORD_COUNT_SQL,
    "inverted_index": INVERTED_INDEX_SQL,
    "per_file_metrics": PER_FILE_METRICS_SQL,
    "count_per_key": COUNT_PER_KEY_SQL,
}


# -- Python UDTF surface: document chunking -----------------------------------

CHUNK_SIZE = 50
CHUNK_STRIDE = 40  # 10-word overlap


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping word-window chunks per document via a Python UDTF.

    The standard training-data chunking op (fixed-size windows, fixed
    overlap), implemented as a real arrow-optimized Python UDTF (1 row ->
    N rows) to exercise that API surface — the reference's Map contract is
    exactly this shape (SURVEY.md E2). Lateral join keeps doc_id attached.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_no int, n_words int, chunk string")
    class Chunker:
        def eval(self, text: str):
            import regex

            toks = [w for w in regex.split(r"[^\p{L}]+", text or "") if w]
            for i, start in enumerate(range(0, len(toks), CHUNK_STRIDE)):
                piece = toks[start : start + CHUNK_SIZE]
                yield i, len(piece), " ".join(piece)

    spark.udtf.register("doc_chunker", Chunker)
    _docs(spark, sf_dir).createOrReplaceTempView("documents_v")
    return spark.sql(
        "SELECT d.doc_id, c.chunk_no, c.n_words, c.chunk "
        "FROM documents_v d, LATERAL doc_chunker(d.text) c"
    )


DOC_CHUNKS_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[^\\p{{L}}]+'), w -> w <> '') AS t
  FROM documents
),
starts AS (
  SELECT doc_id, t, unnest(range(0, len(t), {CHUNK_STRIDE})) AS s
  FROM toks WHERE len(t) > 0
)
SELECT doc_id,
       CAST(s // {CHUNK_STRIDE} AS INT) AS chunk_no,
       CAST(least({CHUNK_SIZE}, len(t) - s) AS INT) AS n_words,
       array_to_string(t[s + 1 : s + {CHUNK_SIZE}], ' ') AS chunk
FROM starts
"""

QUERIES["doc_chunks"] = doc_chunks
ORACLES["doc_chunks"] = DOC_CHUNKS_SQL
