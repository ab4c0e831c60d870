"""Similarity-search quality tests beyond oracle parity.

The IVF cell-probe search is approximate by design; these tests pin its
recall against the exact brute-force baseline, the standard ANN evaluation.
Also pins MinHash estimate quality against exact Jaccard on the planted
near-duplicate pairs.
"""

from __future__ import annotations

import pytest

from mapreduce_simple_go_spark.operators.dedup import (
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
)
from mapreduce_simple_go_spark.operators.similarity import (
    TOP_K,
    ann_cosine_topk,
    ann_ivf_topk,
)

from .conftest import SF_DIR


def test_ivf_recall_vs_brute_force(spark):
    exact = ann_cosine_topk(spark, SF_DIR).collect()
    approx = ann_ivf_topk(spark, SF_DIR).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.vec_id)
    assert set(approx_sets) == set(exact_sets)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / TOP_K for q in exact_sets
    ]
    mean_recall = sum(recalls) / len(recalls)
    # nprobe=3 over ~n/25 cells; recall well above random is the contract
    assert mean_recall >= 0.3, f"IVF mean recall {mean_recall:.2f} too low"


def test_ivf_recall_rises_with_nprobe(spark):
    """The nprobe knob must behave like one: wider probes may only add
    candidate cells, so recall is monotone non-decreasing in nprobe and
    the registered multiprobe form dominates the default. Measured curve
    lives in SCALE.md (scripts/ann_recall.py)."""
    from mapreduce_simple_go_spark.operators.similarity import NPROBE_WIDE

    exact_sets = {}
    for r in ann_cosine_topk(spark, SF_DIR).collect():
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)

    def mean_recall(nprobe):
        approx = {}
        for r in ann_ivf_topk(spark, SF_DIR, nprobe=nprobe).collect():
            approx.setdefault(r.query_id, set()).add(r.vec_id)
        return sum(
            len(exact_sets[q] & approx.get(q, set())) / TOP_K for q in exact_sets
        ) / len(exact_sets)

    r1, r3, r_wide = mean_recall(1), mean_recall(3), mean_recall(NPROBE_WIDE)
    assert r1 <= r3 <= r_wide, (r1, r3, r_wide)
    # measured curve (SCALE.md): 0.68 at sf0.001, 0.56 at sf0.01 — the two
    # 500-vector fixtures differ by generation seed; floor must clear both
    assert r_wide >= 0.5, f"multiprobe recall {r_wide:.2f} below floor"


def test_minhash_finds_planted_near_dups(spark):
    """Every high-Jaccard pair (>=0.9 exact) must appear as a MinHash
    candidate, and the estimate must be within 0.35 of exact."""
    exact = {
        (r.doc_a, r.doc_b): r.capped_jaccard
        for r in dedup_ngram_jaccard(spark, SF_DIR, threshold=0.9).collect()
    }
    est = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in dedup_minhash_lsh(spark, SF_DIR).collect()
    }
    if not exact:
        pytest.skip("fixture has no pairs with exact jaccard >= 0.9 at this SF")
    missed = [p for p in exact if p not in est]
    assert not missed, f"MinHash-LSH missed planted near-dups: {missed}"
    for p, j in exact.items():
        assert abs(est[p] - j) <= 0.35, (p, est[p], j)


def test_simhash_parameterized_matches_brute_force(spark):
    """At a second (bits, blocks) parameterization — 60-bit signatures, 5
    blocks of 12 — the block-LSH candidate join must find EXACTLY the pairs
    a brute-force hamming scan finds (pigeonhole guarantees completeness
    for max_dist <= blocks - 1), and the default contract still validates
    its parameters."""
    import pytest as _pytest

    from mapreduce_simple_go_spark.operators.dedup import (
        dedup_simhash,
        simhash_signatures,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sigs = {r.doc_id: r.simhash for r in simhash_signatures(docs, bits=60).collect()}
    ids = sorted(sigs)
    want = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sigs[a] ^ sigs[b]).count("1") <= 4
    }
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup_simhash(spark, SF_DIR, bits=60, blocks=5, max_dist=4).collect()
    }
    assert got == want
    with _pytest.raises(ValueError, match="pigeonhole"):
        dedup_simhash(spark, SF_DIR, bits=48, blocks=4, max_dist=4)
    with _pytest.raises(ValueError, match="divide"):
        dedup_simhash(spark, SF_DIR, bits=48, blocks=5)


def test_brute_near_dup_size_gate_delegates_to_ivf(spark):
    """Above max_brute_rows the brute path must NOT collect the base table —
    it delegates to the IVF cell-restricted scan (the scale path)."""
    from mapreduce_simple_go_spark.operators.similarity import (
        embedding_near_dup,
        embedding_near_dup_ivf,
    )

    gated = embedding_near_dup(spark, SF_DIR, max_brute_rows=1)
    ivf = embedding_near_dup_ivf(spark, SF_DIR)
    assert sorted(map(tuple, gated.collect())) == sorted(map(tuple, ivf.collect()))


def test_brute_near_dup_gate_boundary_and_measured_default(spark):
    """The gate flips exactly AT max_brute_rows (<= stays brute, n-1
    delegates), and the default is the scripts/ann_crossover.py MEASURED
    brute/IVF time crossover (~3.6k rows on local[32]), not the old 200k
    broadcast-memory heuristic — see SCALE.md's crossover table."""
    from mapreduce_simple_go_spark.operators.similarity import (
        MAX_BRUTE_ROWS,
        _emb,
        embedding_near_dup,
        embedding_near_dup_ivf,
    )

    assert MAX_BRUTE_ROWS == 3_500

    n = _emb(spark, SF_DIR).count()
    at_boundary = embedding_near_dup(spark, SF_DIR, max_brute_rows=n)
    below = embedding_near_dup(spark, SF_DIR, max_brute_rows=n - 1)
    brute = embedding_near_dup(spark, SF_DIR, max_brute_rows=10**12)
    ivf = embedding_near_dup_ivf(spark, SF_DIR)

    rows = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert rows(at_boundary) == rows(brute)  # n <= gate: brute path
    assert rows(below) == rows(ivf)  # n > gate: delegate to IVF
    # the sf0.001 fixture's vectors are near-uniform: the cell restriction
    # genuinely drops cross-cell pairs here, so the two paths differing
    # proves the boundary actually switched implementations
    assert rows(brute) != rows(ivf)


def test_srp_recall_vs_brute_force(spark):
    """SRP-LSH candidate buckets must carry genuine angular signal on the
    near-uniform fixture — the adversarial case for any LSH family, where
    the exact top-5 sit at cos ~0.4, barely above random pairs. The floor
    is therefore RELATIVE to chance: a random candidate set of the same
    size would land exact-top-k members with probability ~cand/n (the 8x8
    layout keeps cand/query near n/32, so chance recall ~3%); the SRP
    buckets must beat that several-fold. The absolute-recall contract for
    the regime the operator exists for (high-cosine retrieval) is pinned
    separately by test_srp_recall_planted_neighbors."""
    from mapreduce_simple_go_spark.operators.similarity import ann_srp_topk

    exact = ann_cosine_topk(spark, SF_DIR).collect()
    approx = ann_srp_topk(spark, SF_DIR).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / TOP_K for q in exact_sets
    ]
    mean_recall = sum(recalls) / len(recalls)
    # ~3% chance recall at n/32 candidates; the floor must clear the
    # measured values at BOTH 500-vector fixtures (scripts/srp_tune.py
    # table in SCALE.md): 0.20 at sf0.001, 0.08 at sf0.01 — each >=2.5x
    # over chance
    assert mean_recall >= 0.06, f"SRP mean recall {mean_recall:.2f} at chance level"


def test_srp_recall_planted_neighbors(spark, tmp_path):
    """The contract that matters at scale: for HIGH-cosine neighbors (the
    near-dup / retrieval regime LSH exists for), the 8x8 band layout must
    recover nearly all of them. Analytic bound at cos 0.95: p_bit = 1 -
    theta/pi = 0.90, per-band 0.90^8 = 0.43, across 8 bands 98.8%. Planted
    construction: 20 query vectors, each with one perturbed copy at
    cos >= 0.93, in a 400-vector sea of seeded uniform noise."""
    import numpy as np

    from mapreduce_simple_go_spark.operators.similarity import (
        EMBED_DIM,
        QUERY_MOD,
        ann_srp_topk,
    )

    rng = np.random.default_rng(7)
    n_noise, n_q = 400, 20
    rows = []
    for i in range(n_noise):
        # non-query ids (never % QUERY_MOD == 0)
        rows.append((i * QUERY_MOD + 1, rng.standard_normal(EMBED_DIM)))
    planted = {}
    for j in range(n_q):
        q_id = (j + 1) * QUERY_MOD  # query: vec_id % QUERY_MOD == 0
        v = rng.standard_normal(EMBED_DIM)
        eps = 0.25 * rng.standard_normal(EMBED_DIM)  # cos(v, v+eps) ~ 0.97
        dup_id = q_id + 3
        rows.append((q_id, v))
        rows.append((dup_id, v + eps))
        cos = float(
            np.dot(v, v + eps) / (np.linalg.norm(v) * np.linalg.norm(v + eps))
        )
        assert cos >= 0.93, cos
        planted[q_id] = dup_id
    sdf = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    fix = str(tmp_path / "fix")
    sdf.coalesce(1).write.parquet(f"{fix}/embeddings.parquet")
    got = {}
    for r in ann_srp_topk(spark, fix).collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    hit = sum(1 for q, d in planted.items() if d in got.get(q, set()))
    assert hit >= int(0.9 * n_q), f"planted-neighbor recall {hit}/{n_q}"


def test_kmeans_matches_numpy_reference(spark):
    """The distributed integer k-means must equal a sequential numpy replay
    of the same algorithm (same quantization, seeding, tie-breaks)."""
    import numpy as np

    from mapreduce_simple_go_spark.operators.similarity import (
        KMEANS_ITERS,
        KMEANS_K,
        KMEANS_OFFSET,
        KMEANS_SCALE,
        _emb,
        kmeans_clusters,
    )

    got = {
        r.vec_id: r.cluster for r in kmeans_clusters(spark, SF_DIR).collect()
    }
    rows = sorted(
        (r.vec_id, r.embedding) for r in _emb(spark, SF_DIR).collect()
    )
    ids = [v for v, _ in rows]
    q = (
        np.floor(np.array([e for _, e in rows], dtype=np.float64) * KMEANS_SCALE)
        .astype(np.int64)
        + KMEANS_OFFSET
    )
    cents = q[: KMEANS_K].copy()

    def assign(c):
        d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)  # int64 exact
        return d.argmin(axis=1)  # argmin takes first on ties = lowest cid

    a = assign(cents)
    for _ in range(KMEANS_ITERS - 1):
        cents = np.stack(
            [
                q[a == c].sum(axis=0) // max((a == c).sum(), 1)
                for c in range(KMEANS_K)
            ]
        )
        a = assign(cents)
    want = dict(zip(ids, a.tolist()))
    assert got == want
    assert set(got.values()) <= set(range(KMEANS_K))


def test_ivf_nprobe_wider_than_cells_probes_all(spark):
    """nprobe > n_cells must degrade to probing every cell (== exact
    search restricted to assigned cells), not crash: a 16-vector table has
    ceil(sqrt(16)) = 4 cells, far fewer than nprobe=12."""
    from mapreduce_simple_go_spark.operators.similarity import assign_cells

    rng = [(int(i), [float((i * 7 + d * 3) % 13) for d in range(8)]) for i in range(16)]
    base = spark.createDataFrame(rng, "vec_id long, embedding array<float>")
    rows = assign_cells(spark, base, nprobe=12).collect()
    per_vec = {}
    for r in rows:
        per_vec.setdefault(r.vec_id, []).append(r.crank)
    # every vector probes exactly n_cells = 4 cells with ranks 1..4
    assert all(sorted(v) == [1, 2, 3, 4] for v in per_vec.values()), per_vec


def test_streaming_assignment_equals_window_form():
    """The r7 oracle rewrite (duck_assign_ctes) must be row-identical to
    the window formulation it replaced — ROW_NUMBER() OVER (PARTITION BY
    vec_id ORDER BY cos DESC, cent_id ASC) = 1 — including under total
    tie degeneracy (every cosine equal), where both must break to the
    LOWEST cent_id. Pure-DuckDB property test; the window form is kept
    here as the executable spec."""
    import duckdb
    import numpy as np
    import pandas as pd

    from mapreduce_simple_go_spark.operators.similarity import (
        CENTS_SQL,
        duck_assign_ctes,
        duck_cosine_raw,
    )

    cos = duck_cosine_raw("e.embedding", "c.c_emb")
    window_sql = f"""
WITH cents AS (
{CENTS_SQL}
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cent_id AS cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos} DESC, c.cent_id ASC) AS r
    FROM embeddings e CROSS JOIN cents c
  ) WHERE r = 1
)
SELECT vec_id, cell FROM assign ORDER BY vec_id
"""
    streaming_sql = f"""
WITH cents AS (
{CENTS_SQL}
),
{duck_assign_ctes('embeddings')}
SELECT vec_id, cell FROM assign ORDER BY vec_id
"""
    from mapreduce_simple_go_spark.operators.similarity import EMBED_DIM

    rng = np.random.default_rng(11)
    cases = {
        # generic random vectors (ties only where duplicates collide)
        "random": [
            (i, [float(x) for x in rng.standard_normal(EMBED_DIM)])
            for i in range(300)
        ],
        # total degeneracy: every vector identical -> every centroid ties;
        # both forms must assign everyone to the lowest sampled cent_id
        "all_ties": [(i, [float(d + 1) for d in range(EMBED_DIM)]) for i in range(300)],
    }
    for name, rows in cases.items():
        pdf = pd.DataFrame({"vec_id": [r[0] for r in rows],
                            "embedding": [r[1] for r in rows]})
        con = duckdb.connect()
        con.register("embeddings", pdf)
        win = con.execute(window_sql).fetchall()
        stream = con.execute(streaming_sql).fetchall()
        assert win == stream, name
        assert len(win) == len(rows), name
        if name == "all_ties":
            cents = {c for _, c in win}
            assert len(cents) == 1, cents  # everyone at the lowest cent_id
        con.close()


def test_srp_recall_mid_cosine_tiers(spark, tmp_path):
    """Mid-cosine recall frontier (r9, per r8 verdict #5): the planted pin
    at cos >= 0.93 covers the near-dup regime, but real embedding retrieval
    lives at cos 0.7-0.9. Plant EXACT-cosine neighbors (dup = cos*v_hat +
    sqrt(1-cos^2)*orthonormal noise) and bound the 8x8 layout's recall per
    tier against the analytic collision curve 1-(1-p^8)^8, p = 1-theta/pi:
    0.652 @ cos 0.75, 0.850 @ cos 0.85 (measured 0.675 / 0.825 with this
    seed — scripts/srp_tune.py --planted records the frontier, including
    multiprobe-IVF on the same fixtures: 0.875 / 0.925, the measured
    reason SCALE.md routes mid-cosine retrieval to IVF and keeps SRP for
    the high-cosine near-dup regime)."""
    import importlib.util
    import os as _os

    from mapreduce_simple_go_spark.operators.similarity import ann_srp_topk

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "srp_tune", _os.path.join(repo, "scripts", "srp_tune.py")
    )
    srp_tune = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(srp_tune)

    floors = {0.75: 0.55, 0.85: 0.70}
    for cos_t, floor in floors.items():
        fix = str(tmp_path / f"fix{int(cos_t * 100)}")
        planted = srp_tune.make_planted_fixture(spark, fix, cos_t)
        rec = srp_tune.planted_recall(spark, ann_srp_topk, fix, planted)
        assert rec >= floor, f"SRP recall {rec:.3f} below {floor} at cos {cos_t}"


def test_exact_blocked_topk_bit_identical_to_brute(spark):
    """r10 (r9 verdict #3): the blocked-scan exact top-k must be
    BIT-identical to the join brute — same IEEE scoring sequence, same
    9-dp rounding, same (cosine DESC, vec_id ASC) tie-break — because the
    registry entry's size gate must never change results, only the plan."""
    from mapreduce_simple_go_spark.operators.similarity import (
        QUERY_MOD,
        _ann_exact_blocked,
        _emb,
        ann_cosine_topk_brute,
    )
    from pyspark.sql import functions as F

    base = _emb(spark, SF_DIR)
    queries = base.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    blocked = sorted(map(tuple, _ann_exact_blocked(spark, base, queries).collect()))
    brute = sorted(map(tuple, ann_cosine_topk_brute(spark, SF_DIR).collect()))
    assert blocked == brute and len(blocked) > 0


def test_exact_blocked_topk_tie_margin_survives_tiny_blocks(spark):
    """Repartitioning the base into many tiny blocks (every block smaller
    than k, plus uneven ones) exercises both emit branches of the blocked
    scan and the per-block sufficiency argument: the union of per-block
    keeps must still contain every global top-k row."""
    from mapreduce_simple_go_spark.operators.similarity import (
        QUERY_MOD,
        _ann_exact_blocked,
        _emb,
        ann_cosine_topk_brute,
    )
    from pyspark.sql import functions as F

    base = _emb(spark, SF_DIR).repartition(64)
    queries = base.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    blocked = sorted(map(tuple, _ann_exact_blocked(spark, base, queries).collect()))
    brute = sorted(map(tuple, ann_cosine_topk_brute(spark, SF_DIR).collect()))
    assert blocked == brute


def test_blocked_topk_sliced_path_hash_identical(spark, monkeypatch):
    """r11 (r10 verdict #4): the query-side collect is hard-gated at
    _BLOCKED_QUERY_SLICE_ROWS — above it the query set splits into
    contiguous query_id ranges, each an independent one-pass scan.
    Forcing a tiny slice bound (several slices, at least one uneven) must
    produce EXACTLY the unsliced rows: ranges partition the query set, so
    no query's candidate generation ever sees a different matrix."""
    import mapreduce_simple_go_spark.operators.similarity as S
    from pyspark.sql import functions as F

    base = S._emb(spark, SF_DIR)
    queries = base.filter(F.col("vec_id") % S.QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    q_count = queries.count()
    assert q_count > 3
    unsliced = sorted(
        map(tuple, S._ann_exact_blocked(spark, base, queries).collect())
    )
    # ceil(q/3)-row slices -> 3 modulus groups (uneven unless q % 3 == 0)
    monkeypatch.setattr(S, "_BLOCKED_QUERY_SLICE_ROWS", -(-q_count // 3))
    sliced = sorted(
        map(tuple, S._ann_exact_blocked(spark, base, queries).collect())
    )
    # slice bound of 1 query -> one slice (and one base scan) per query,
    # the maximal-slicing degenerate case
    monkeypatch.setattr(S, "_BLOCKED_QUERY_SLICE_ROWS", 1)
    single = sorted(
        map(tuple, S._ann_exact_blocked(spark, base, queries).collect())
    )
    assert sliced == unsliced and single == unsliced and len(unsliced) > 0


def test_ann_topk_gate_boundary(spark, monkeypatch):
    """The registry entry's gate flips exactly AT MAX_BRUTE_TOPK_ROWS and
    both sides return identical rows (the gate is a plan choice, not a
    semantics choice)."""
    import mapreduce_simple_go_spark.operators.similarity as S

    n = S._emb(spark, SF_DIR).count()
    monkeypatch.setattr(S, "MAX_BRUTE_TOPK_ROWS", n)
    at_boundary = sorted(map(tuple, S.ann_cosine_topk(spark, SF_DIR).collect()))
    monkeypatch.setattr(S, "MAX_BRUTE_TOPK_ROWS", n - 1)
    above = sorted(map(tuple, S.ann_cosine_topk(spark, SF_DIR).collect()))
    brute = sorted(map(tuple, S.ann_cosine_topk_brute(spark, SF_DIR).collect()))
    assert at_boundary == brute
    assert above == brute


def test_exact_blocked_topk_cross_block_exact_ties(spark):
    """Adversarial tie case for the blocked scan: many IDENTICAL vectors
    (cosine vs the query exactly equal, bit-for-bit) scattered across 64
    tiny blocks. The global tie-break is vec_id ASC, so the true top-k is
    the k LOWEST vec_ids among the tied copies — which forces every block
    to surface its tied rows (the margin keeps raw-equal rows) and the
    re-rank to order them purely by vec_id across blocks."""
    import numpy as np

    from mapreduce_simple_go_spark.operators.similarity import (
        TOP_K,
        _ann_exact_blocked,
    )
    from pyspark.sql import functions as F

    rng = np.random.RandomState(7)
    q = rng.rand(64).astype("float32")
    x = rng.rand(64).astype("float32")  # the tied candidate, 50 copies
    rows = [(0, [float(v) for v in q])]
    tied_ids = [3, 7, 11, 19, 23, 31, 41, 53, 67, 71][:10] + list(
        range(101, 141)
    )
    for vid in tied_ids:
        rows.append((vid, [float(v) for v in x]))
    # noise sea, far from both q and x in expectation
    for vid in range(500, 600):
        rows.append((vid, [float(v) for v in rng.rand(64)]))
    base = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(64)
    queries = base.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    got = (
        _ann_exact_blocked(spark, base, queries)
        .orderBy("rank")
        .select("vec_id", "rank")
        .collect()
    )
    # identical vectors share one cosine; whether it beats the noise sea is
    # data-dependent, but sorted tied ids must head the ranking if their
    # cosine is the max — verify against a numpy oracle instead of assuming
    M = {vid: np.array(emb, dtype=np.float64) for vid, emb in rows}
    qv = M.pop(0)

    def cos(a, b):
        acc = na = nb = 0.0
        for i in range(64):
            acc += a[i] * b[i]
            na += a[i] * a[i]
            nb += b[i] * b[i]
        return round(acc / (np.sqrt(na) * np.sqrt(nb)), 9)

    want = sorted(((-cos(qv, v), vid) for vid, v in M.items()))[:TOP_K]
    assert [r.vec_id for r in got] == [vid for _, vid in want]
    assert [r.rank for r in got] == list(range(1, TOP_K + 1))


def test_proportional_oracle_sql_unchanged():
    """The r13 fixed-q refactor (query-set selection behind
    _query_vectors/_q_where) must leave the PROPORTIONAL entries' oracle
    SQL byte-identical to the pre-refactor literals — this pins that the
    default (fixed_q=None) path is the same query the r10-r12 driver
    verdicts covered (window capacity-rule exemption evidence,
    operators/__init__._WINDOW_EXEMPT_R13)."""
    from mapreduce_simple_go_spark.operators.similarity import (
        ANN_SRP_SQL,
        ANN_TOPK_SQL,
        FIXED_Q,
        NPROBE,
        _q_where,
        ann_ivf_sql,
        ann_srp_sql,
        ann_topk_sql,
    )

    assert _q_where() == "vec_id % 100 = 0"
    assert _q_where(FIXED_Q) == f"vec_id < {FIXED_Q}"
    # default-arg builders == explicit proportional predicate == the
    # literal the old f-string constants embedded
    assert ANN_TOPK_SQL == ann_topk_sql("vec_id % 100 = 0")
    assert ANN_SRP_SQL == ann_srp_sql("vec_id % 100 = 0")
    assert ann_ivf_sql(NPROBE) == ann_ivf_sql(NPROBE, "vec_id % 100 = 0")
    assert "vec_id % 100 = 0" in ANN_TOPK_SQL
    assert f"vec_id < {FIXED_Q}" not in ANN_TOPK_SQL


def test_fixedq_registry_wiring():
    """The three fixed-q twins are registered with oracles whose query
    predicate is the workload-constant one."""
    from mapreduce_simple_go_spark.operators import all_oracles, all_queries
    from mapreduce_simple_go_spark.operators.similarity import FIXED_Q

    q, o = all_queries(), all_oracles()
    for name in (
        "ann_cosine_topk_fixedq",
        "ann_ivf_topk_fixedq",
        "ann_srp_topk_fixedq",
    ):
        assert name in q and name in o
        assert f"vec_id < {FIXED_Q}" in o[name]
        assert "% 100 = 0" not in o[name]
