"""Round-11 property battery (VERDICT r10 item 6): brute-force replays
for the remaining un-replayed boundary-logic families —

- q_skyline: the bucketed two-phase Pareto prune vs O(n²) dominance,
  with prices deliberately placed ON bucket edges (multiples of the
  100.0 bucket width, negatives, sub-unit values) and heavy
  equal-(price,size) ties;
- q_heavy_hitters / q_pareto_abc: cumulative-share boundary rows on
  random skews — revenue menus chosen so cum·10 == tot·5 / tot·8 land
  EXACTLY on the integer-cross-product class boundaries;
- q_benford: first-digit extraction on boundary magnitudes (exact
  powers of ten, one-ulp-below values, the >= 1 filter edge).

As in test_property_r10.py, every replay drives the REAL registered
query end-to-end: each example writes a random parquet fixture and the
query reads it through load_table, so the finite-or-null ingest
contract (sources/tables.py) is part of the replayed semantics —
NaN/±Inf are injected and expected to behave exactly as NULL."""

from __future__ import annotations

import math
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings, strategies as st


def _contract(x):
    """The ingest boundary: finite-or-null."""
    if x is None or math.isnan(x) or math.isinf(x):
        return None
    return x


def _r(x, places):
    """Spark round(): decimal HALF_UP — floor(x·10^p + 0.5)/10^p for
    the non-negative magnitudes these queries round."""
    if x is None:
        return None
    s = 10.0**places
    return math.floor(x * s + 0.5) / s


# ---------------------------------------------------------- q_skyline

# prices sit on/next to the 100.0 bucket-width edges of the two-phase
# prune, plus sub-unit, negative, and non-finite injections; sizes are
# tiny ints so equal-(price,size) frontier ties are common
_price = st.one_of(
    st.sampled_from(
        [
            -100.0,
            -0.5,
            0.0,
            99.99,
            100.0,
            100.01,
            150.0,
            199.99,
            200.0,
            300.0,
        ]
    ),
    st.floats(min_value=-250.0, max_value=450.0, allow_nan=False),
    st.none(),
    st.sampled_from([float("nan"), float("inf"), float("-inf")]),
)

skyline_rows = st.lists(
    st.tuples(_price, st.integers(0, 4)), min_size=0, max_size=25
)


def _write_part(rows, dst):
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(len(rows)), pa.int64()),
                "p_size": pa.array([s for _, s in rows], pa.int32()),
                "p_retailprice": pa.array(
                    [p for p, _ in rows], pa.float64()
                ),
            }
        ),
        f"{dst}/part.parquet",
    )


@settings(max_examples=25, deadline=None)
@given(skyline_rows)
def test_skyline_matches_brute_force_dominance(spark, rows):
    """a dominates b ⟺ a.price ≤ b.price ∧ a.size ≥ b.size ∧ strict on
    one; the frontier keeps every non-dominated row including exact
    (price, size) twins. NULL-price rows (incl. contract-nulled NaN/Inf)
    vanish: both engines' equi-join on the price key drops them."""
    from spring_and_kafka_spark.operators.analytics import q_skyline

    dst = tempfile.mkdtemp(prefix="skyprop-")
    _write_part(rows, dst)

    pts = [
        (k, p, s)
        for k, (praw, s) in enumerate(rows)
        if (p := _contract(praw)) is not None
    ]
    expected = sorted(
        (
            (k, p, s)
            for (k, p, s) in pts
            if not any(
                p2 <= p and s2 >= s and (p2 < p or s2 > s)
                for (_, p2, s2) in pts
            )
        ),
        key=lambda t: (t[1], t[0]),
    )
    got = [
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in q_skyline(spark, dst).collect()
    ]
    assert got == expected  # query orders by (price, partkey) already


# ---------------------------------------------------- q_heavy_hitters

hh_keys = st.lists(
    # zipf-ish menu: a few hot keys + a long tail, so top-20 boundaries
    # and (cnt, key) tie-breaks both get exercised
    st.one_of(st.integers(0, 3), st.integers(0, 40)),
    min_size=0,
    max_size=120,
)


def _write_lineitem_keys(keys, dst):
    pq.write_table(
        pa.table({"l_partkey": pa.array(keys, pa.int64())}),
        f"{dst}/lineitem.parquet",
    )


@settings(max_examples=25, deadline=None)
@given(hh_keys)
def test_heavy_hitters_matches_brute_force(spark, keys):
    from spring_and_kafka_spark.operators.profiling import q_heavy_hitters

    dst = tempfile.mkdtemp(prefix="hhprop-")
    _write_lineitem_keys(keys, dst)

    cnt: dict[int, int] = {}
    for k in keys:
        cnt[k] = cnt.get(k, 0) + 1
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = len(keys)
    expected, cum = [], 0
    for rnk, (k, c) in enumerate(ordered[:20], start=1):
        cum += c
        expected.append(
            (rnk, k, c, _r(c / total, 6), _r(cum / total, 6))
        )
    got = [
        (r.rnk, r.key, r.cnt, r.share, r.cum_share)
        for r in q_heavy_hitters(spark, dst)
        .orderBy("rnk")
        .collect()
    ]
    assert got == expected


# ------------------------------------------------------ q_pareto_abc

# integer cents from a tiny menu force EXACT boundary hits: e.g. ten
# equal-revenue customers put the 5th row precisely on cum·10 == tot·5
abc_orders = st.lists(
    st.tuples(
        st.integers(0, 9),  # o_custkey
        st.one_of(
            st.sampled_from([100, 200, 1000]).map(lambda c: c / 100.0),
            st.floats(min_value=0.0, max_value=50.0, allow_nan=False),
            st.none(),
            st.sampled_from([float("nan"), float("inf"), float("-inf")]),
        ),
    ),
    min_size=0,
    max_size=40,
)


def _write_orders(rows, dst):
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(len(rows)), pa.int64()),
                "o_custkey": pa.array([c for c, _ in rows], pa.int64()),
                "o_totalprice": pa.array(
                    [p for _, p in rows], pa.float64()
                ),
            }
        ),
        f"{dst}/orders.parquet",
    )


def _cents(p):
    # ex_cents: floor(x*100 + 0.5) per row, NULL passes through
    return None if p is None else math.floor(p * 100 + 0.5)


@settings(max_examples=25, deadline=None)
@given(abc_orders)
def test_pareto_abc_matches_brute_force(spark, rows):
    """Replays the exact integer-cross-product boundary (cum·10 ≤ tot·5
    / ≤ tot·8) over the deterministic (cents desc, custkey) order,
    including the all-NULL-revenue customer (sorted last, classed 'C'
    via the null-comparison→otherwise branch in both engines)."""
    from spring_and_kafka_spark.operators.profiling import q_pareto_abc

    dst = tempfile.mkdtemp(prefix="abcprop-")
    _write_orders(rows, dst)

    per_cust: dict[int, list] = {}
    for c, praw in rows:
        per_cust.setdefault(c, []).append(_cents(_contract(praw)))
    rev = {
        c: (sum(v for v in vals if v is not None)
            if any(v is not None for v in vals) else None)
        for c, vals in per_cust.items()
    }
    # (cents desc NULLS LAST, custkey) — Spark's desc default; pinned
    # cross-engine by the committed oracle
    ranked = sorted(
        rev.items(),
        key=lambda kv: (kv[1] is None, -(kv[1] or 0), kv[0]),
    )
    tot = (
        sum(v for _, v in ranked if v is not None)
        if any(v is not None for _, v in ranked)
        else None
    )
    agg: dict[str, list] = {}
    cum = 0
    seen_non_null = False
    for c, cents in ranked:
        if cents is not None:
            cum += cents
            seen_non_null = True
        # window sum ignores NULLs; all-NULL prefix ⇒ cum is NULL
        cum_val = cum if seen_non_null else None
        if tot is None or cum_val is None:
            cls = "C"
        elif cum_val * 10 <= tot * 5:
            cls = "A"
        elif cum_val * 10 <= tot * 8:
            cls = "B"
        else:
            cls = "C"
        agg.setdefault(cls, []).append(cents)
    expected = {}
    for cls, vals in agg.items():
        non_null = [v for v in vals if v is not None]
        revenue = sum(non_null) / 100.0 if non_null else None
        share = (
            sum(non_null) * 1.0 / tot
            if non_null and tot not in (None, 0)
            else None
        )
        expected[cls] = (len(vals), revenue, share)
    got = {
        r.abc_class: (r.n_customers, r.revenue, r.revenue_share)
        for r in q_pareto_abc(spark, dst).collect()
    }
    assert got == expected


# -------------------------------------------------------- q_benford

_magnitude = st.one_of(
    # exact powers of ten and one-ulp-style neighbours: the digit
    # extraction must never misclassify 10^k, and the >= 1 filter edge
    st.sampled_from(
        [
            0.0,
            0.5,
            0.999,
            1.0,
            1.0000001,
            9.999,
            10.0,
            99.999,
            100.0,
            1000.0,
            999999.99,
            1e12,
            -5.0,
        ]
    ),
    st.floats(min_value=0.0, max_value=1e6, allow_nan=False),
    st.none(),
    st.sampled_from([float("nan"), float("inf"), float("-inf")]),
)

benford_prices = st.lists(_magnitude, min_size=0, max_size=60)


@settings(max_examples=25, deadline=None)
@given(benford_prices)
def test_benford_matches_brute_force(spark, prices):
    """First significant digit via floor→int→string, replayed in pure
    Python; NULL/NaN/±Inf and sub-1 magnitudes all fall out of the
    o_totalprice >= 1 filter."""
    from spring_and_kafka_spark.operators.quality import q_benford

    dst = tempfile.mkdtemp(prefix="benprop-")
    _write_orders(list(enumerate(prices)), dst)

    kept = [
        p for praw in prices if (p := _contract(praw)) is not None and p >= 1
    ]
    counts: dict[int, int] = {}
    for p in kept:
        d = int(str(int(math.floor(p)))[0])
        counts[d] = counts.get(d, 0) + 1
    total = sum(counts.values())
    expected = {}
    for d, n in counts.items():
        frac_raw = n * 1.0 / total
        ben_raw = math.log10(1.0 + 1.0 / float(d))
        expected[d] = (
            n,
            _r(frac_raw, 4),
            _r(ben_raw, 4),
            _r(abs(frac_raw - ben_raw), 4),
        )
    got = {
        r.digit: (r.n, r.frac, r.benford, r.abs_dev)
        for r in q_benford(spark, dst).collect()
    }
    assert got == expected
