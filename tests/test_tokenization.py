"""Unicode tokenization parity — the A1 contract (SURVEY.md §2.2).

The reference splits on Go's unicode.IsLetter (wc.go:22-26): digits and
punctuation are separators, any Unicode letter is a word character. Our
engine pins [^\\p{L}]+ against a pure-Python `regex` oracle on adversarial
inputs the fixture may not contain (combining forms, CJK, empty-ish docs).
"""

from __future__ import annotations

import regex

from pyspark.sql import functions as F

from mapreduce_simple_go_spark.functions import tokens

CASES = [
    "plain ascii words",
    "café Müller κόσμος",           # accented latin, greek
    "汉字 мир עברית",                # CJK, cyrillic, hebrew
    "digits42separate7words",        # digits are separators
    "punct!,.;:-_()[]{}only",
    "",                              # empty doc
    "   \n\t  ",                     # whitespace-only
    "...!!!???",                     # punctuation-only
    "x",                             # single letter
    "word-with-hyphens and_under",   # '-' and '_' are separators
]


def py_tokens(text: str) -> list[str]:
    return [w for w in regex.split(r"[^\p{L}]+", text) if w]


def test_spark_tokens_match_python_oracle(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)], "i int, text string")
    got = {
        r.i: list(r.toks)
        for r in df.select("i", tokens(F.col("text")).alias("toks")).collect()
    }
    for i, t in enumerate(CASES):
        assert got[i] == py_tokens(t), f"case {i}: {t!r}"


def test_wc_counts_match_python_counter(spark):
    from collections import Counter

    df = spark.createDataFrame([(t,) for t in CASES], "text string")
    got = {
        r.word: r.cnt
        for r in df.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    want = Counter(w for t in CASES for w in py_tokens(t))
    assert got == dict(want)


def test_pii_scrub_redacts_everything(spark):
    """After scrubbing, no email/phone/IP pattern may survive, and each row
    must have redacted at least the injected email+phone+IP."""
    import re

    from mapreduce_simple_go_spark.operators.textstats import (
        _PII_EMAIL,
        _PII_IP,
        _PII_PHONE,
        pii_scrub,
    )
    from .conftest import SF_DIR

    rows = pii_scrub(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert not re.search(_PII_EMAIL, r.scrubbed), r.scrubbed[-120:]
        assert not re.search(_PII_PHONE, r.scrubbed)
        assert not re.search(_PII_IP, r.scrubbed)
        assert r.n_emails >= 1 and r.n_phones >= 1 and r.n_ips >= 1


def test_pagerank_matches_sequential_replay(spark):
    """The distributed integer PageRank must equal a sequential Python
    replay of the same integer iteration (same edges, scale, floor divs)."""
    from collections import defaultdict

    from mapreduce_simple_go_spark.operators.textstats import (
        PAGERANK_ITERS,
        PAGERANK_SCALE,
        _bigram_edges,
        word_pagerank,
    )
    from .conftest import SF_DIR

    got = {r.word: r.rank for r in word_pagerank(spark, SF_DIR).collect()}
    edges = [(r.a, r.b, r.w) for r in _bigram_edges(spark, SF_DIR).collect()]
    nodes = {a for a, _, _ in edges} | {b for _, b, _ in edges}
    outw = defaultdict(int)
    for a, _, w in edges:
        outw[a] += w
    rank = {n: PAGERANK_SCALE for n in nodes}
    for _ in range(PAGERANK_ITERS):
        s = defaultdict(int)
        for a, b, w in edges:
            s[b] += (rank[a] * w) // outw[a]
        rank = {n: 15 * PAGERANK_SCALE // 100 + (85 * s[n]) // 100 for n in nodes}
    assert got == rank
    assert all(v >= 15 * PAGERANK_SCALE // 100 for v in got.values())
