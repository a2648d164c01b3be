"""Round-17 property battery: brute-force replays for the r17 operator
batch —

- q_dedup_span_align: the content-defined-anchor span alignment vs a
  direct Python replay (sha2-prefix hash sampling, min-pos anchor
  dedup, delta grouping, best-alignment tie order, floor-form span
  fraction) over random small-vocab corpora, plus a planted
  shifted-passage fixture that q_dedup_substring is structurally
  blind to (offset coprime to the tumbling segment width);
- q_sim_rerank_grid: the multi-query recall-vs-shortlist-length grid
  vs a Python float replay (per-qid Hamming heaps, per-(qid, L) exact
  rerank, mean recall), grid shrunk so the shortlist edges are live.

As in the earlier batteries, every replay drives the REAL registered
query end-to-end through a random parquet fixture and load_table, so
the ingest contract is part of the replayed semantics."""

from __future__ import annotations

import hashlib
import math
import shutil
import tempfile
from collections import defaultdict

from hypothesis import given, settings, strategies as st

_K = 4  # mirror of llm.dedup._ALIGN_K
_MOD = 8  # mirror of llm.dedup._ALIGN_MOD
_SHIFT = 3  # mirror of llm.dedup._ALIGN_SHIFT
_MIN_A = 2  # mirror of llm.dedup._ALIGN_MIN_ANCHORS


def _hv(seg: str) -> int:
    """Python twin of llm.dedup._span_hash (48-bit sha2-256 prefix)."""
    return int(hashlib.sha256(seg.encode()).hexdigest()[:12], 16)


def _span_align_replay(docs):
    """Python replay of the full q_dedup_span_align pipeline: planted
    shifted corpus -> sliding {_K}-gram anchors (hash mod {_MOD}
    sampled, min-pos per (doc, hash)) -> delta-grouped pair alignment
    -> best alignment per pair -> floor-form span fraction."""
    base = [
        (i, t) for i, t in docs if i is not None and t is not None and t != ""
    ]
    corpus = list(base)
    for i, t in base:
        t2 = " ".join(t.split(" ")[_SHIFT:])
        if t2 != "":
            corpus.append((i + 200000, t2))
    anchors: dict[tuple[int, int], int] = {}
    sizes: dict[int, int] = {}
    for did, t in corpus:
        toks = t.split(" ")
        sizes[did] = len(toks)
        for p in range(max(len(toks) - _K, 0) + 1):
            h = _hv(" ".join(toks[p : p + _K]))
            if h % _MOD == 0:
                k = (did, h)
                if k not in anchors or p < anchors[k]:
                    anchors[k] = p
    byhv = defaultdict(list)
    for (did, h), p in anchors.items():
        byhv[h].append((did, p))
    matches = defaultdict(list)
    for h, lst in byhv.items():
        # _ALIGN_DF_CAP (1000) is inert at test size
        for da, pa in lst:
            for db, pb in lst:
                if da < db:
                    matches[(da, db, pb - pa)].append(pa)
    per_pair = defaultdict(list)
    for (a, b, delta), pos in matches.items():
        if len(pos) >= _MIN_A:
            per_pair[(a, b)].append(
                (len(pos), max(pos) - min(pos), delta)
            )
    want = {}
    for (a, b), aligns in per_pair.items():
        aligns.sort(key=lambda t: (-t[0], -t[1], t[2]))
        n_anchors, width, delta = aligns[0]
        span_tokens = width + _K
        frac = math.floor(span_tokens * 1e6 / sizes[a] + 0.5) / 1e6
        want[(a, b)] = (delta, n_anchors, span_tokens, frac)
    return want


def _write_documents(spark, d, docs):
    spark.createDataFrame(
        [(i, t, "en", "s", 0) for i, t in docs],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")


span_corpora = st.lists(
    st.tuples(
        st.booleans(),  # doc_id present?
        st.one_of(
            st.none(),
            st.just(""),
            st.lists(
                st.sampled_from(["a", "b", "c", "d"]),
                min_size=1,
                max_size=20,
            ).map(" ".join),
        ),
    ),
    min_size=0,
    max_size=14,
)


@settings(max_examples=12, deadline=None)
@given(span_corpora)
def test_dedup_span_align_matches_python_replay(spark, docs):
    """The registered span-align query must equal the direct Python
    replay — per surviving pair: best-alignment delta, anchor count,
    token span and floor-form span fraction — on random small-vocab
    corpora whose repetition makes anchor collisions, multi-delta
    alignments and tie-breaks live, with NULL-id/NULL-text/empty-text
    exclusions part of the replayed contract."""
    from spring_and_kafka_spark.llm.dedup import q_dedup_span_align

    rows = [
        (i if has_id else None, text)
        for i, (has_id, text) in enumerate(docs)
    ]
    want = _span_align_replay(
        [(i, t) for i, t in rows if i is not None]
    )
    d = tempfile.mkdtemp(prefix="span-prop-")
    try:
        _write_documents(spark, d, rows)
        got = {
            (r.a_id, r.b_id): (
                r.delta,
                r.n_anchors,
                r.span_tokens,
                r.span_frac,
            )
            for r in q_dedup_span_align(spark, d).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert got == want


def test_span_align_finds_shifted_passage_segment_dedup_misses(spark):
    """The r16 verdict's planted gap fixture: a 64-token passage shared
    by two documents at offsets 5 and 12 (delta 7, coprime to the
    8-word tumbling segment width). q_dedup_substring must report ZERO
    duplicated segments (the passage never aligns to a segment
    boundary the same way in both docs — precomputed: the tumbling
    segment sets are disjoint), while q_dedup_span_align must find the
    pair at exactly delta = +7 with the full passage span (precomputed
    from the fixed sha2 sampling: 8 shared anchors, anchor width 51,
    span 51 + K = 55 tokens)."""
    from spring_and_kafka_spark.llm.dedup import (
        q_dedup_span_align,
        q_dedup_substring,
    )

    passage = [f"p{i}" for i in range(64)]
    doc_a = [f"a{i}" for i in range(5)] + passage + [f"z{i}" for i in range(7)]
    doc_b = [f"b{i}" for i in range(12)] + passage + [f"y{i}" for i in range(3)]
    rows = [(1, " ".join(doc_a)), (2, " ".join(doc_b))]
    d = tempfile.mkdtemp(prefix="span-planted-")
    try:
        _write_documents(spark, d, rows)
        # detection half: segment dedup is blind to the shifted copy
        sub = {r.doc_id: r.n_dup for r in q_dedup_substring(spark, d).collect()}
        assert sub == {1: 0, 2: 0}
        got = {
            (r.a_id, r.b_id): (r.delta, r.n_anchors, r.span_tokens)
            for r in q_dedup_span_align(spark, d).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
    # the cross-doc alignment: delta = 12 - 5 = +7, 8 sampled anchors,
    # 51 + K = 55 tokens of doc 1 covered
    assert got[(1, 2)] == (7, 8, 55)
    # and the operator's own planted shifted copies land at -SHIFT
    assert got[(1, 200001)][0] == -_SHIFT
    assert got[(2, 200002)][0] == -_SHIFT
    # replay agreement on the whole fixture (ties, secondary pairs)
    want = {
        k: v[:3] for k, v in _span_align_replay(rows).items()
    }
    assert {k: v for k, v in got.items()} == want
