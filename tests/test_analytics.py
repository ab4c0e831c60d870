"""Python-replay and invariant tests for the round-5 analytics additions.

Same discipline as the numpy/dict replays elsewhere (test_similarity's
k-means replay, test_kv_python_oracle): an independent reimplementation in
plain Python must agree with the distributed operator exactly — catching
errors a SQL oracle could share with the Spark plan.
"""

from __future__ import annotations

from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

from .conftest import SF_DIR, rows_key


def test_pareto_orders_matches_bruteforce(spark):
    """O(n²) dominance check over the full sf0.001 orders table: the
    operator's front must be exactly the non-dominated set."""
    import os

    from mapreduce_simple_go_spark.operators.relational import pareto_orders

    rows = (
        spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .collect()
    )
    pts = [(r.o_orderkey, r.o_orderdate, Decimal(str(r.o_totalprice)).quantize(Decimal("0.01"))) for r in rows]
    front = set()
    for k, d, p in pts:
        dominated = any(
            (d2 <= d and p2 >= p and (d2 < d or p2 > p)) for _, d2, p2 in pts
        )
        if not dominated:
            front.add(k)
    got = {r.o_orderkey for r in pareto_orders(spark, SF_DIR).collect()}
    assert got == front and len(front) > 0


def test_ewma_matches_python_replay(spark):
    """Trailing-window EWMA replayed with an explicit per-user loop (exact
    int64 arithmetic, same micro-scaling) — must agree to the last bit."""
    from mapreduce_simple_go_spark.operators.events import EWMA_K, ewma_user_value
    from mapreduce_simple_go_spark.sources import load_events

    ev = load_events(spark, SF_DIR).select("user_id", "event_id", "ts", "value").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    want = {}
    for u, rs in by_user.items():
        rs.sort(key=lambda r: (r.ts, r.event_id))
        # Decimal HALF_UP matches the operator's F.round micro-scaling;
        # Python's round() is half-even and would diverge on a fixture
        # value landing exactly on a .5 micro-unit tie.
        scaled = [
            int(
                (Decimal(str(r.value)) * 1_000_000).quantize(
                    Decimal("1"), rounding=ROUND_HALF_UP
                )
            )
            for r in rs
        ]
        for i, r in enumerate(rs):
            frame = scaled[max(0, i - EWMA_K + 1) : i + 1]
            num = sum(v << j for j, v in enumerate(frame))
            den = (1 << len(frame)) - 1
            want[r.event_id] = round(num / den / 1e6, 9)
    got = {r.event_id: r.ewma for r in ewma_user_value(spark, SF_DIR).collect()}
    assert got == want


def test_anomaly_zscore_matches_decimal_replay(spark):
    """Moments replayed with exact Decimal sums (the decimal(18,6) cast) —
    the flagged event set must match exactly."""
    from mapreduce_simple_go_spark.operators.events import ANOMALY_Z, anomaly_zscore
    from mapreduce_simple_go_spark.sources import load_events

    ev = load_events(spark, SF_DIR).select("event_id", "event_type", "value").collect()
    s1, s2, n = defaultdict(Decimal), defaultdict(Decimal), defaultdict(int)
    q = Decimal("0.000001")
    for r in ev:
        v = Decimal(str(r.value)).quantize(q)
        s1[r.event_type] += v
        s2[r.event_type] += v * v
        n[r.event_type] += 1
    want = set()
    for r in ev:
        mu = float(s1[r.event_type]) / n[r.event_type]
        var = float(s2[r.event_type]) / n[r.event_type] - mu * mu
        z = round((r.value - mu) / var**0.5, 9)
        if abs(z) > ANOMALY_Z:
            want.add(r.event_id)
    got = {r.event_id for r in anomaly_zscore(spark, SF_DIR).collect()}
    assert got == want and len(got) > 0


def test_line_dedup_rewrite_matches_python_replay(spark):
    """Full replay: re-cut every doc into 10-token spans, elect global first
    occurrences by (doc_id, span_no), restitch — clean_text and span counts
    must match the distributed rewrite for every doc."""
    import os

    import regex

    from mapreduce_simple_go_spark.operators.dedup import (
        REWRITE_SPAN_W,
        line_dedup_rewrite,
    )

    docs = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("doc_id", "text")
        .collect()
    )
    spans_all = []
    for r in sorted(docs, key=lambda r: r.doc_id):
        toks = [w for w in regex.split(r"[^\p{L}]+", r.text or "") if w]
        for i in range(0, (len(toks) + REWRITE_SPAN_W - 1) // REWRITE_SPAN_W):
            spans_all.append(
                (r.doc_id, i, " ".join(toks[i * REWRITE_SPAN_W : (i + 1) * REWRITE_SPAN_W]))
            )
    seen = set()
    kept = set()
    for doc_id, span_no, span in sorted(spans_all):
        if span not in seen:
            seen.add(span)
            kept.add((doc_id, span_no))
    want = {}
    for r in docs:
        mine = [(sn, sp) for d, sn, sp in spans_all if d == r.doc_id]
        ksp = [sp for sn, sp in sorted(mine) if (r.doc_id, sn) in kept]
        want[r.doc_id] = (len(mine), len(ksp), " ".join(ksp))
    got = {
        r.doc_id: (r.n_spans, r.n_spans_kept, r.clean_text)
        for r in line_dedup_rewrite(spark, SF_DIR).collect()
    }
    assert got == want


def test_session_window_native_consistent_with_lag_sessionization(spark):
    """Same split rule (gap > threshold) ⇒ identical session partitioning on
    the fixture: (user, start, n_events, total_value) sets must be equal,
    and every native session_end must be its max event ts + gap."""
    from mapreduce_simple_go_spark.operators.events import (
        session_window_native,
        sessionization,
    )

    native = session_window_native(spark, SF_DIR).collect()
    lag = sessionization(spark, SF_DIR).collect()
    key = lambda r: (r.user_id, r.session_start, r.n_events, r.total_value)
    assert sorted(map(key, native)) == sorted(map(key, lag))
    import datetime as dt

    lag_end = {(r.user_id, r.session_start): r.session_end for r in lag}
    gap = dt.timedelta(minutes=30)
    for r in native:
        assert r.session_end == lag_end[(r.user_id, r.session_start)] + gap


def test_domain_mix_weights_invariants(spark):
    """Shares sum to 1 and weight × share = 1/n_sources (up to the output
    rounding)."""
    from mapreduce_simple_go_spark.operators.sampling import domain_mix_weights

    rows = domain_mix_weights(spark, SF_DIR).collect()
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-6
    n = len(rows)
    for r in rows:
        assert abs(r.mix_weight * r.token_share - 1.0 / n) < 1e-6


def test_data_profile_invariants(spark):
    """Row count constant across columns; the key column is unique and
    null-free on the fixture."""
    from mapreduce_simple_go_spark.operators.relational import data_profile_orders

    rows = {r.col_name: r for r in data_profile_orders(spark, SF_DIR).collect()}
    n_rows = {r.n_rows for r in rows.values()}
    assert len(n_rows) == 1
    key = rows["o_orderkey"]
    assert key.n_nulls == 0 and key.n_distinct == key.n_rows
