"""Round-14 property battery: brute-force replays for the r14 operator
batch —

- q_graph_lcc: per-node triangle counts and the floor-form clustering
  coefficient vs explicit neighborhood sets (including degree-1 nodes,
  whose lcc must be NULL, never a /0);
- q_graph_degree_dist: the power-of-two degree histogram vs
  int.bit_length() bucketing with integer-shift bounds;
- q_seq_markov_session: session-bounded transition counts vs a sorted
  stream replay that applies the same 30-minute break rule (gaps big
  enough to split, NULL event types, boundary rows dropped);
- q_embed_pq_eval: the full PQ pipeline — subspace argmin encode,
  m-ordered reconstruction, micro-unit distortion, ADC-vs-exact
  recall@k — vs a pure-Python replay using the identical left-fold
  dot products, (score, centroid_id) argmin, NULLS-LAST cosine
  ranking, and truncating-integer mean.

As in the r10-r13 batteries, every replay drives the REAL registered
query end-to-end: each example writes a random parquet fixture and the
query reads it through load_table/load_vectors, so the finite-or-null
ingest contract is part of the replayed semantics."""

from __future__ import annotations

import datetime as dt
import math
import shutil
import tempfile
from collections import defaultdict
from itertools import combinations

from hypothesis import given, settings, strategies as st

_TS0 = dt.datetime(2024, 1, 1)


def _write_lineitem(spark, d, items):
    spark.createDataFrame(
        [
            (ok, pk, 1, i + 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
             _TS0 + dt.timedelta(days=1))
            for i, (ok, pk) in enumerate(items)
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")


def _thinned_edges(items):
    per_order = defaultdict(set)
    for ok, pk in items:
        per_order[ok].add(pk)
    pair_orders = defaultdict(int)
    for parts in per_order.values():
        for u, v in combinations(sorted(parts), 2):
            pair_orders[(u, v)] += 1
    return {p for p, n in pair_orders.items() if n >= 2}


graph_lineitems = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 11)),  # (order, part)
    min_size=1,
    max_size=60,
)


@settings(max_examples=10, deadline=None)
@given(graph_lineitems)
def test_graph_lcc_matches_neighbor_sets(spark, items):
    """Per-node (deg, n_tri, lcc) must equal values from explicit
    neighborhood sets: T(n) = #{(a,b) in nbr(n)^2, a<b, (a,b) an edge},
    lcc = floor(2*T*1e6/(d*(d-1)) + 0.5)/1e6 for d >= 2 else None."""
    from spring_and_kafka_spark.operators.graph import q_graph_lcc

    edges = _thinned_edges(items)
    nbr = defaultdict(set)
    for u, v in edges:
        nbr[u].add(v)
        nbr[v].add(u)
    expected = {}
    for n, ns in nbr.items():
        t = sum(
            1 for a, b in combinations(sorted(ns), 2) if (a, b) in edges
        )
        d = len(ns)
        lcc = (
            math.floor(2 * t * 1e6 / (d * (d - 1)) + 0.5) / 1e6
            if d >= 2
            else None
        )
        expected[n] = (d, t, lcc)

    d = tempfile.mkdtemp(prefix="lcc-prop-")
    try:
        _write_lineitem(spark, d, items)
        got = {
            r.node: (r.deg, r.n_tri, r.lcc)
            for r in q_graph_lcc(spark, d).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(graph_lineitems)
def test_graph_degree_dist_matches_bitlength_replay(spark, items):
    """Bucketing must be exact int.bit_length()-1 with shift bounds and
    the floor-form share over the node total."""
    from spring_and_kafka_spark.operators.graph import q_graph_degree_dist

    edges = _thinned_edges(items)
    nbr = defaultdict(set)
    for u, v in edges:
        nbr[u].add(v)
        nbr[v].add(u)
    hist = defaultdict(int)
    for ns in nbr.values():
        hist[len(ns).bit_length() - 1] += 1
    total = sum(hist.values())
    expected = {
        b: (1 << b, (1 << (b + 1)) - 1, n,
            math.floor(n * 1e6 / total + 0.5) / 1e6)
        for b, n in hist.items()
    }

    d = tempfile.mkdtemp(prefix="degdist-prop-")
    try:
        _write_lineitem(spark, d, items)
        got = {
            r.bucket: (r.lo, r.hi, r.n_nodes, r.share)
            for r in q_graph_degree_dist(spark, d).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert got == expected


session_events = st.lists(
    st.tuples(
        st.integers(0, 3),  # user
        st.integers(0, 7_200_000_000),  # microsecond offset (0..2 h —
        # gaps routinely exceed the 30-minute session break)
        st.sampled_from(["a", "b", "c", None]),  # event_type incl NULL
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None)
@given(session_events)
def test_seq_markov_session_matches_python_replay(spark, evs):
    """Session-bounded transition counts vs a direct replay over the
    (ts, event_id)-sorted stream applying the same 30-minute break:
    a transition is kept iff the current row is NOT a session start
    and prev_type is not NULL (the q_seq_markov boundary trade)."""
    from spring_and_kafka_spark.operators.analytics import (
        _MARKOV_SESSION_GAP_US,
        q_seq_markov_session,
    )

    rows = [
        (i, _TS0 + dt.timedelta(microseconds=us), u, typ, 1.0)
        for i, (u, us, typ) in enumerate(evs)
    ]
    per_user = defaultdict(list)
    for eid, ts, u, typ, _ in rows:
        per_user[u].append((ts, eid, typ))
    trans = defaultdict(int)
    for seq in per_user.values():
        seq.sort(key=lambda r: (r[0], r[1]))
        for (pts, _, prev), (cts, _, curr) in zip(seq, seq[1:]):
            gap_us = (cts - pts) // dt.timedelta(microseconds=1)
            if gap_us > _MARKOV_SESSION_GAP_US:
                continue  # current row starts a new session
            if prev is not None:
                trans[(prev, curr)] += 1
    row_tot = defaultdict(int)
    for (prev, _), n in trans.items():
        row_tot[prev] += n
    expected = {
        k: (n, math.floor(n * 1e6 / row_tot[k[0]] + 0.5) / 1e6)
        for k, n in trans.items()
    }

    d = tempfile.mkdtemp(prefix="markovsess-prop-")
    try:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double",
        ).write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = {
            (r.prev_type, r.curr_type): (r.n, r.p)
            for r in q_seq_markov_session(spark, d).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert got == expected


# PQ replay: float32-exact coordinate values so the parquet round-trip
# is lossless and every double op replays bit-for-bit in Python
_F32_EXACT = [0.0, 0.5, 1.0, -1.0, 1.5, 2.0, -0.25]

pq_vectors = st.lists(
    st.one_of(
        st.none(),  # NULL embedding — must vanish at the scan
        st.lists(st.sampled_from(_F32_EXACT), min_size=64, max_size=64),
    ),
    min_size=1,
    max_size=20,
)


def _dotf(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _cos(a, b):
    den = math.sqrt(_dotf(a, a)) * math.sqrt(_dotf(b, b))
    return None if den == 0 else _dotf(a, b) / den


def _topk(cands, k=10):
    # (sim DESC NULLS LAST, vec_id) — the registry ranking rule
    ranked = sorted(
        cands, key=lambda r: (r[1] is None, -(r[1] or 0.0), r[0])
    )
    return [vid for vid, _ in ranked[:k]]


@settings(max_examples=8, deadline=None)
@given(pq_vectors)
def test_embed_pq_eval_matches_python_replay(spark, vecs):
    """Full-pipeline replay: subspace codes via min((score, cid)) with
    score = dot(c,c) - 2*dot(s,c) over identical left folds, recon by
    m-order concat, distortion floor(d2*1e6+0.5) summed then
    truncating-divided, ADC recall with NULLS-LAST cosine ranking.
    Zero-norm vectors (all-0.0 draws happen) and NULL embeddings ride
    through the same replay."""
    from spring_and_kafka_spark.llm.similarity import q_embed_pq_eval

    e = [(i, v) for i, v in enumerate(vecs) if v is not None]
    cb = {}  # (m, cid) -> csub
    for cid, v in e:
        if cid < 16:
            for m in range(4):
                cb[(m, cid)] = v[m * 16:(m + 1) * 16]
    recon = {}
    for vid, v in e:
        parts = []
        for m in range(4):
            sub = v[m * 16:(m + 1) * 16]
            best = min(
                ((c, cid) for (mm, cid), c in cb.items() if mm == m),
                key=lambda t: (
                    _dotf(t[0], t[0]) - 2 * _dotf(sub, t[0]),
                    t[1],
                ),
            )[0]
            parts.extend(best)
        recon[vid] = parts
    qerr = {
        vid: math.floor(
            ((_dotf(v, v) - 2 * _dotf(v, recon[vid]))
             + _dotf(recon[vid], recon[vid])) * 1e6 + 0.5
        )
        for vid, v in e
    }
    n_vec = len(e)
    mean_err = sum(qerr.values()) // n_vec if n_vec else None
    expected = {}
    for qid, qv in e:
        if qid >= 8:
            continue
        exact = _topk(
            [(vid, _cos(v, qv)) for vid, v in e if vid != qid]
        )
        pq = _topk(
            [(vid, _cos(recon[vid], qv)) for vid, v in e if vid != qid]
        )
        hits = len(set(exact) & set(pq))
        n_true = len(exact)
        recall = (
            math.floor(hits * 1e6 / n_true + 0.5) / 1e6 if n_true else None
        )
        expected[qid] = (n_true, len(pq), hits, recall, n_vec, mean_err)

    import pyarrow as pa
    import pyarrow.parquet as pq_  # noqa: N813

    d = tempfile.mkdtemp(prefix="pq-prop-")
    try:
        pq_.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(len(vecs)), pa.int64()),
                    "embedding": pa.array(vecs, pa.list_(pa.float32())),
                    "label": pa.array([0] * len(vecs), pa.int32()),
                }
            ),
            f"{d}/embeddings.parquet",
        )
        got = {
            r.qid: (
                r.n_true, r.n_pq, r.hits, r.recall, r.n_vec,
                r.mean_sq_err_micros,
            )
            for r in q_embed_pq_eval(spark, d).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert got == expected
