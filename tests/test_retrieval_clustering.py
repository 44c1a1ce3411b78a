"""Python-replay and invariant tests for the round-5 operators:
BM25 ranked retrieval, exact-substring span coverage, SemDeDup k-means.

Each test recomputes the operator's exact integer semantics in plain
Python/numpy from the raw parquet and compares bit-for-bit — the same
independence standard as the DuckDB oracles, but through a third
implementation path.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest

from adv_big_data_indexing_spark.contract import registry
from tests.conftest import SF_CORRECTNESS


def _ilog2_q4(x: int) -> int:
    s = max(x.bit_length() - 15, 0)
    y = x >> s
    return 4 * s + (y * y * y * y).bit_length() - 1


def _docs(spark):
    return {
        d.doc_id: d.text.split()
        for d in spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }


def test_bm25_topk_replay(spark):
    from adv_big_data_indexing_spark.operators.retrieval import (
        BM25_QUERY,
        BM25_TOP_N,
        _SCALE,
    )

    rows = registry()["ns_bm25_topk"].fn(spark, SF_CORRECTNESS).collect()
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == list(
        range(1, BM25_TOP_N + 1)
    )
    docs = _docs(spark)
    n_docs = len(docs)
    t_tok = sum(len(t) for t in docs.values())
    df = {t: sum(1 for toks in docs.values() if t in toks) for t in BM25_QUERY}
    scored = []
    for doc_id, toks in docs.items():
        tf = Counter(toks)
        if not any(tf[t] for t in BM25_QUERY):
            continue
        score = 0
        for t in BM25_QUERY:
            idf = _ilog2_q4(2 * n_docs + 2) - _ilog2_q4(2 * df[t] + 1)
            ratio = (10 * _SCALE * t_tok * tf[t]) // (
                4 * t_tok * tf[t] + 3 * t_tok + 3 * len(toks) * n_docs
            )
            score += idf * ratio
        scored.append((doc_id, sum(1 for t in BM25_QUERY if tf[t]), score))
    scored.sort(key=lambda r: (-r[2], r[0]))
    want = [
        (doc_id, m, s, i + 1) for i, (doc_id, m, s) in enumerate(scored[:BM25_TOP_N])
    ]
    got = [
        (r.doc_id, r.n_matched, r.score_q4, r.rank)
        for r in sorted(rows, key=lambda r: r.rank)
    ]
    assert got == want
    # scores strictly ordered (desc, ties broken by doc_id upstream)
    assert all(a[2] >= b[2] for a, b in zip(got, got[1:]))


def test_span_coverage_replay(spark):
    from adv_big_data_indexing_spark.operators.dedup import SPAN_W

    rows = registry()["ns_dedup_span_coverage"].fn(spark, SF_CORRECTNESS).collect()
    docs = _docs(spark)
    gram_docs: dict[tuple, set] = {}
    for doc_id, toks in docs.items():
        for p in range(len(toks) - SPAN_W + 1):
            gram_docs.setdefault(tuple(toks[p : p + SPAN_W]), set()).add(doc_id)
    want = {}
    for doc_id, toks in docs.items():
        pos = [
            p
            for p in range(len(toks) - SPAN_W + 1)
            if len(gram_docs[tuple(toks[p : p + SPAN_W])]) >= 2
        ]
        if not pos:
            continue
        covered = sum(
            min(SPAN_W, p - q) for p, q in zip(pos[1:], pos)
        ) + SPAN_W
        want[doc_id] = (len(pos), covered, 1000 * covered // len(toks))
    got = {r.doc_id: (r.n_dup_spans, r.covered_tokens, r.coverage_permille) for r in rows}
    assert got == want
    # coverage is a fraction: never exceeds the whole document
    assert all(v[2] <= 1000 for v in want.values())


def test_semdedup_kmeans_replay(spark):
    from adv_big_data_indexing_spark.operators.clustering import (
        _OFFSET,
        DIM,
        K_CLUSTERS,
        KMEANS_ITERS,
        SEMDEDUP_TAU,
    )

    rows = registry()["ns_semdedup_kmeans"].fn(spark, SF_CORRECTNESS).collect()
    emb = (
        spark.read.parquet(f"{SF_CORRECTNESS}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in emb], dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    q = np.floor(
        np.array([emb[i].embedding for i in order], dtype=np.float64) * 1_000_000.0
    ).astype(np.int64)

    cent = q[ids < K_CLUSTERS][np.argsort(ids[ids < K_CLUSTERS])].copy()

    def assign(c):
        # (n, k) exact int64 distances
        d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        cl = d.argmin(axis=1)  # numpy argmin takes first minimum == lowest j
        return cl, d[np.arange(len(q)), cl]

    for _ in range(KMEANS_ITERS):
        cl, _d = assign(cent)
        for j in range(K_CLUSTERS):
            m = cl == j
            if m.any():
                n = int(m.sum())
                s = q[m].sum(axis=0)
                cent[j] = (s + _OFFSET * n) // n - _OFFSET
    cl, d = assign(cent)

    want = {}
    for j in range(K_CLUSTERS):
        m = cl == j
        if not m.any():
            continue
        sub = q[m]
        n2 = (sub * sub).sum(axis=1)
        sub_ids = ids[m]
        mx, ndup = None, 0
        for a in range(len(sub)):
            for b in range(a + 1, len(sub)):
                if sub_ids[a] < sub_ids[b]:
                    dot, na, nb = int(sub[a] @ sub[b]), int(n2[a]), int(n2[b])
                else:
                    dot, na, nb = int(sub[b] @ sub[a]), int(n2[b]), int(n2[a])
                cos = float(dot) / math.sqrt(float(na)) / math.sqrt(float(nb))
                mx = cos if mx is None or cos > mx else mx
                ndup += cos >= SEMDEDUP_TAU
        want[j] = (int(m.sum()), int(d[m].sum()), mx, ndup)

    got = {
        r.cluster: (r.n_members, r.inertia_q, r.max_intra_cosine, r.n_dup_pairs)
        for r in rows
    }
    assert set(got) == set(want)
    for j in want:
        assert got[j][0] == want[j][0], j
        assert got[j][1] == want[j][1], j
        assert got[j][3] == want[j][3], j
        if want[j][2] is None:
            assert got[j][2] is None
        else:
            assert got[j][2] == pytest.approx(want[j][2], abs=0.0), j
    # every vector is in exactly one cluster
    assert sum(v[0] for v in want.values()) == len(ids)


def test_pagerank_replay(spark):
    """Integer PageRank replayed in pure Python from the raw parquet."""
    import duckdb

    from adv_big_data_indexing_spark.operators.graph import (
        _DAMP_DEN,
        _DAMP_NUM,
        PAGERANK_ITERS,
        RANK_SCALE,
    )

    rows = registry()["ns_graph_pagerank"].fn(spark, SF_CORRECTNESS).collect()
    con = duckdb.connect()
    edges = con.sql(f"""
        SELECT c.c_nationkey, s.s_nationkey, count(*) AS w
        FROM '{SF_CORRECTNESS}/lineitem.parquet' l
        JOIN '{SF_CORRECTNESS}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
        JOIN '{SF_CORRECTNESS}/customer.parquet' c ON o.o_custkey = c.c_custkey
        JOIN '{SF_CORRECTNESS}/supplier.parquet' s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
    """).fetchall()
    nodes = sorted(
        r[0] for r in con.sql(f"SELECT n_nationkey FROM '{SF_CORRECTNESS}/nation.parquet'").fetchall()
    )
    n = len(nodes)
    wout = Counter()
    for src, _dst, w in edges:
        wout[src] += w
    r = {v: RANK_SCALE // n for v in nodes}
    for _ in range(PAGERANK_ITERS):
        inbound = Counter()
        for src, dst, w in edges:
            inbound[dst] += (_DAMP_NUM * r[src] * w) // (_DAMP_DEN * wout[src])
        tele = (_DAMP_DEN - _DAMP_NUM) * RANK_SCALE // (_DAMP_DEN * n)
        r = {v: tele + inbound[v] for v in nodes}
    got = {row.nationkey: row.rank_q for row in rows}
    assert got == r
    # probability-mass sanity: floor losses only ever shrink the total
    assert sum(r.values()) <= RANK_SCALE


def test_semdedup_prune_replay(spark):
    """Prune verdicts replayed in numpy on top of the replayed assignment
    (shares the greedy lowest-id-representative rule with the oracle)."""
    from adv_big_data_indexing_spark.operators.clustering import (
        _OFFSET,
        K_CLUSTERS,
        KMEANS_ITERS,
        SEMDEDUP_TAU,
    )

    rows = registry()["ns_semdedup_prune"].fn(spark, SF_CORRECTNESS).collect()
    emb = (
        spark.read.parquet(f"{SF_CORRECTNESS}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array(sorted(r.vec_id for r in emb), dtype=np.int64)
    by_id = {r.vec_id: r.embedding for r in emb}
    q = np.floor(
        np.array([by_id[i] for i in ids], dtype=np.float64) * 1_000_000.0
    ).astype(np.int64)
    cent = q[ids < K_CLUSTERS].copy()

    def assign(c):
        d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1)

    for _ in range(KMEANS_ITERS):
        cl = assign(cent)
        for j in range(K_CLUSTERS):
            m = cl == j
            if m.any():
                n = int(m.sum())
                cent[j] = (q[m].sum(axis=0) + _OFFSET * n) // n - _OFFSET
    cl = assign(cent)

    want = {}
    for j in range(K_CLUSTERS):
        m = cl == j
        sub, sub_ids = q[m], ids[m]
        sq = np.sqrt((sub * sub).sum(axis=1).astype(np.float64))
        for b in range(len(sub)):
            dup = None
            for a in range(b):
                cos = (float(sub[a] @ sub[b]) / sq[a]) / sq[b]
                if cos >= SEMDEDUP_TAU:
                    dup = int(sub_ids[a])
                    break  # ids ascending → first hit is the min
            want[int(sub_ids[b])] = (int(j), dup is None, dup)
    got = {r.vec_id: (r.cluster, r.keep, r.dup_of) for r in rows}
    assert got == want
    # at least one drop on this corpus, and every dup_of is a kept row
    dropped = [v for v in got.values() if not v[1]]
    assert dropped
    assert all(got[v[2]][1] for v in dropped)


def test_lttb_replay(spark):
    """LTTB downsampling replayed in pure Python integers: same bucket
    formula, same scaled integer areas, same earliest-wins tie-break."""
    from adv_big_data_indexing_spark.operators.timeseries import _LTTB_B, LTTB_T

    rows = registry()["ts_downsample_lttb"].fn(spark, SF_CORRECTNESS).collect()
    ev = (
        spark.read.parquet(f"{SF_CORRECTNESS}/events.parquet")
        .selectExpr(
            "user_id",
            "event_id",
            "ts",
            "value",
            "CAST(floor(value * 1000) AS BIGINT) AS y",
            "unix_micros(CAST(ts AS TIMESTAMP)) div 1000000 AS x",
        )
        .collect()
    )
    series: dict[int, list] = {}
    for r in ev:
        series.setdefault(r.user_id, []).append(r)
    want = {}
    for uid, pts in series.items():
        pts.sort(key=lambda r: (r.ts, r.event_id))
        n = len(pts)
        if n <= LTTB_T:
            for i, r in enumerate(pts):
                want[(uid, i)] = r.event_id
            continue
        buckets = [[] for _ in range(_LTTB_B)]
        for idx in range(1, n - 1):
            buckets[(idx - 1) * _LTTB_B // (n - 2)].append(idx)
        sel = [0]
        for b in range(_LTTB_B):
            if b < _LTTB_B - 1:
                nb = buckets[b + 1]
                sx = sum(pts[i].x for i in nb)
                sy = sum(pts[i].y for i in nb)
                m = len(nb)
            else:
                sx, sy, m = pts[n - 1].x, pts[n - 1].y, 1
            a = sel[-1]
            best, best_area = None, -1
            for c in buckets[b]:
                xa, ya, xc, yc = pts[a].x, pts[a].y, pts[c].x, pts[c].y
                area = abs((xa * m - sx) * (yc - ya) - (xa - xc) * (sy - ya * m))
                if area > best_area:
                    best, best_area = c, area
            sel.append(best)
        sel.append(n - 1)
        for bkt, idx in enumerate(sel):
            want[(uid, bkt)] = pts[idx].event_id
    got = {(r.user_id, r.bucket): r.event_id for r in rows}
    assert got == want
    # structural invariants: first/last kept, buckets are 0..T-1 per series
    for uid, pts in series.items():
        t = min(LTTB_T, len(pts))
        assert sorted(b for (u, b) in got if u == uid) == list(range(t))


def test_cusum_replay(spark):
    """CUSUM alarms replayed in pure Python integers."""
    from adv_big_data_indexing_spark.operators.timeseries import (
        CUSUM_HMUL,
        CUSUM_KDIV,
    )

    rows = registry()["ts_cusum_alarm"].fn(spark, SF_CORRECTNESS).collect()
    ev = (
        spark.read.parquet(f"{SF_CORRECTNESS}/events.parquet")
        .selectExpr(
            "user_id", "event_id", "ts", "CAST(floor(value * 1000) AS BIGINT) AS x"
        )
        .collect()
    )
    series: dict[int, list] = {}
    for r in ev:
        series.setdefault(r.user_id, []).append(r)
    want = {}
    for uid, pts in series.items():
        pts.sort(key=lambda r: (r.ts, r.event_id))
        xs = [r.x for r in pts]
        mu = sum(xs) // len(xs)
        k, h = mu // CUSUM_KDIV, CUSUM_HMUL * mu
        s = 0
        for r, x in zip(pts, xs):
            s = max(0, s + x - mu - k)
            if s > h:
                want[(uid, r.event_id)] = s
                s = 0
    got = {(r.user_id, r.event_id): r.s_q for r in rows}
    assert got == want
    assert len(want) > 0  # calibrated to actually fire on this corpus


def test_cosine_row_blocks_matches_unblocked(monkeypatch):
    """r9 (VERDICT r8 item 4): the blocked within-cluster pairwise kernel
    must reproduce the whole-matrix results exactly — max cosine, ≥τ pair
    count, AND the greedy min-id dup_of rule — including with the block
    width forced to ONE ROW, and on the int64 fallback path when a
    pathological magnitude breaks the float64-exactness bound."""
    import numpy as np

    from adv_big_data_indexing_spark.operators import clustering as C

    rng = np.random.RandomState(7)

    def naive(mat):
        sq = np.sqrt((mat * mat).sum(axis=1).astype(np.float64))
        cos = ((mat @ mat.T).astype(np.float64) / sq[:, None]) / sq[None, :]
        n = len(mat)
        iu = np.triu_indices(n, k=1)
        vals = cos[iu]
        dup_of = np.full(n, -1, dtype=np.int64)
        for j in range(1, n):
            hits = np.nonzero(cos[:j, j] >= C.SEMDEDUP_TAU)[0]
            if len(hits):
                dup_of[j] = hits[0]
        return float(vals.max()), int((vals >= C.SEMDEDUP_TAU).sum()), dup_of

    def blocked(mat):
        sq = np.sqrt((mat * mat).sum(axis=1).astype(np.float64))
        n = len(mat)
        cols = np.arange(n)
        best, n_dup = -np.inf, 0
        dup_of = np.full(n, -1, dtype=np.int64)
        for i0, i1, cos in C._cosine_row_blocks(mat, sq):
            upper = cols[None, :] > np.arange(i0, i1)[:, None]
            vals = cos[upper]
            if len(vals):
                best = max(best, float(vals.max()))
                n_dup += int((vals >= C.SEMDEDUP_TAU).sum())
            hit = (cos >= C.SEMDEDUP_TAU) & upper
            cand = np.nonzero(hit.any(axis=0) & (dup_of < 0))[0]
            for j in cand:
                dup_of[j] = i0 + int(hit[:, j].argmax())
        return best, n_dup, dup_of

    monkeypatch.setattr(C, "_PAIRWISE_BLOCK_ELEMS", 64)  # b=1 at n=50

    # near-duplicate-heavy matrix so τ-hits and dup chains exist
    base = rng.randint(-1000, 1000, size=(10, 8)).astype(np.int64)
    mat = np.repeat(base, 5, axis=0) + rng.randint(-2, 3, size=(50, 8))
    exp, got = naive(mat), blocked(mat)
    assert got[0] == exp[0] and got[1] == exp[1]
    assert (got[2] == exp[2]).all()

    # int64 fallback window: dim·max² between 2^53 (float64 stops being
    # exact → guard fires) and 2^63 (int64 itself would wrap)
    big = mat * (1 << 18)
    assert 2.0**53 <= big.shape[1] * float(np.abs(big).max()) ** 2 < 2.0**63
    exp_b, got_b = naive(big), blocked(big)
    assert got_b[0] == exp_b[0] and got_b[1] == exp_b[1]
    assert (got_b[2] == exp_b[2]).all()
