"""Scalar functions: string/regex/math/date/cast (SURVEY.md §2.7).

Reference anchor: the reference's only scalar ops are the serde lambdas
String::getBytes / String::new and string concat "#" + i
(reference: src/main/java/jc/DemoApplication.java:97,115,148). Everything
here is a built-in pyspark.sql.functions expression — JVM-side, inside
whole-stage codegen; no Python in the hot path.

Cross-engine casts normalized per registry conventions (DuckDB
ceil→double vs Spark→long; DuckDB year()→BIGINT vs Spark→int; DuckDB
CAST(double AS BIGINT) rounds vs Spark truncates → use explicit floor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spring_and_kafka_spark.registry import register
from spring_and_kafka_spark.sources.tables import load_table


@register(
    "q_fn_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS up,
           lower(c_name) AS lo,
           substr(c_name, 1, 8) AS s8,
           CAST(length(c_name) AS INT) AS len,
           replace(c_name, 'Customer', 'Cust') AS rep,
           trim('  ' || c_name || ' ') AS trimmed,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS pad,
           -- || not concat(): DuckDB's concat() IGNORES NULL arguments
           -- while Spark's concat NULL-propagates; || propagates in both
           c_mktsegment || ':' || c_name AS tagged
    FROM customer
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: upper/lower/substr/length/replace/trim/lpad/concat.
    (The "#" + i concat of the reference generalized.)"""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_name").alias("lo"),
        F.substring("c_name", 1, 8).alias("s8"),
        F.length("c_name").alias("len"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("rep"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("pad"),
        F.concat("c_mktsegment", F.lit(":"), "c_name").alias("tagged"),
    )


@register(
    "q_fn_regex",
    oracle=r"""
    SELECT c_custkey,
           regexp_extract(c_name, '(\d+)', 1) AS digits,
           regexp_matches(c_name, '0{3,}') AS has_zeros
    FROM customer WHERE regexp_matches(c_name, '[0-9]7$')
    """,
)
def q_fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extract + match (rlike)."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_name").rlike("[0-9]7$")).select(
        "c_custkey",
        F.regexp_extract("c_name", r"(\d+)", 1).alias("digits"),
        F.col("c_name").rlike("0{3,}").alias("has_zeros"),
    )


@register(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS r1,
           round(abs(l_discount - 0.05), 6) AS ab,
           CAST(ceil(l_quantity) AS BIGINT) AS ce,
           CAST(floor(l_quantity) AS BIGINT) AS fl,
           round(pow(l_quantity, 2), 4) AS p2,
           round(ln(l_extendedprice), 6) AS lg,
           round(sqrt(l_quantity), 6) AS sq,
           CAST(l_orderkey % 7 AS BIGINT) AS md
    FROM lineitem WHERE l_orderkey <= 300
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: round/abs/ceil/floor/pow/ln/sqrt/mod."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("r1"),
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("ab"),
        F.ceil("l_quantity").cast("long").alias("ce"),
        F.floor("l_quantity").cast("long").alias("fl"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("p2"),
        F.round(F.log("l_extendedprice"), 6).alias("lg"),
        F.round(F.sqrt("l_quantity"), 6).alias("sq"),
        (F.col("l_orderkey") % 7).cast("long").alias("md"),
    )


@register(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)  AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT)   AS dy,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon_start,
           o_orderdate + INTERVAL 7 DAY AS plus7,
           CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT) AS days_since,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
    FROM orders WHERE o_orderkey <= 500
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extract/trunc/add/diff/epoch."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.date_trunc("month", "o_orderdate").alias("mon_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("plus7"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).alias("days_since"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@register(
    "q_fn_editdist",
    oracle="""
    SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist,
           CAST(levenshtein(a.c_mktsegment, b.c_mktsegment) AS INT) AS seg_dist
    FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 1
    WHERE a.c_custkey < 200
    """,
)
def q_fn_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance (levenshtein) between adjacent customer records — the
    character-level similarity primitive under fuzzy matching/dedup."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_custkey") < 200).alias("a")
    b = c.alias("b")
    return a.join(b, F.col("b.c_custkey") == F.col("a.c_custkey") + 1).select(
        F.col("a.c_custkey").alias("a_key"),
        F.col("b.c_custkey").alias("b_key"),
        F.levenshtein(F.col("a.c_name"), F.col("b.c_name")).alias("dist"),
        F.levenshtein(F.col("a.c_mktsegment"), F.col("b.c_mktsegment")).alias(
            "seg_dist"
        ),
    )


@register(
    "q_fn_condexpr",
    oracle="""
    SELECT s_suppkey,
           greatest(s_acctbal, 5000.0) AS floor5k,
           least(s_acctbal, 5000.0) AS cap5k,
           coalesce(nullif(s_name, 'Supplier#000000003'), 'REDACTED') AS masked,
           ifnull(nullif(s_suppkey, 7), -1) AS key_or_neg1
    FROM supplier
    """,
)
def q_fn_condexpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-expression family: greatest/least/coalesce/nullif/ifnull."""
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.greatest("s_acctbal", F.lit(5000.0)).alias("floor5k"),
        F.least("s_acctbal", F.lit(5000.0)).alias("cap5k"),
        F.coalesce(
            F.nullif("s_name", F.lit("Supplier#000000003")), F.lit("REDACTED")
        ).alias("masked"),
        F.ifnull(F.nullif("s_suppkey", F.lit(7)), F.lit(-1)).alias("key_or_neg1"),
    )


@register(
    "q_fn_bits",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS band,
           o_orderkey | 1 AS odd,
           xor(o_orderkey, 21845) AS x,
           CAST(o_orderkey // 16 AS BIGINT) AS shifted,
           CAST(bit_count(o_orderkey) AS INT) AS ones
    FROM orders WHERE o_orderkey <= 500
    """,
)
def q_fn_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor/shift/popcount (the substrate of the
    SimHash/LSH operators, exposed as scalar surface)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(1)).alias("odd"),
        k.bitwiseXOR(F.lit(21845)).alias("x"),
        F.shiftright(k, 4).alias("shifted"),
        F.bit_count(k).alias("ones"),
    )


@register(
    "q_fn_hash",
    oracle="""
    SELECT o_orderkey,
           md5(CAST(o_orderkey AS VARCHAR)) AS key_md5,
           sha256(o_orderstatus) AS status_sha
    FROM orders WHERE o_orderkey <= 300
    """,
)
def q_fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized cryptographic digests (md5/sha256 agree across engines,
    unlike xxhash/murmur which are engine-internal)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 300)
    return o.select(
        "o_orderkey",
        F.md5(F.col("o_orderkey").cast("string")).alias("key_md5"),
        F.sha2("o_orderstatus", 256).alias("status_sha"),
    )


@register(
    "q_fn_trig",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sin(l_quantity / 10), 6) AS s,
           round(cos(l_discount), 6) AS c,
           round(atan2(l_quantity, l_extendedprice), 6) AS a2,
           round(exp(l_discount), 6) AS e,
           round(degrees(atan(l_tax)), 4) AS deg
    FROM lineitem WHERE l_orderkey <= 200
    """,
)
def q_fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trig/exponential family (rounded to 6 — libm implementations agree
    well past that)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin(F.col("l_quantity") / 10), 6).alias("s"),
        F.round(F.cos("l_discount"), 6).alias("c"),
        F.round(F.atan2(F.col("l_quantity"), F.col("l_extendedprice")), 6).alias("a2"),
        F.round(F.exp("l_discount"), 6).alias("e"),
        F.round(F.degrees(F.atan("l_tax")), 4).alias("deg"),
    )


@register(
    "q_fn_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(floor(o_totalprice) AS BIGINT) AS price_int,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(o_orderdate AS DATE) AS order_date,
           decode(encode(o_orderstatus)) AS status_roundtrip,
           CAST(o_totalprice AS VARCHAR) LIKE '%.%' AS has_frac
    FROM orders WHERE o_orderkey <= 500
    """,
)
def q_fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast family incl. the reference's serde analog: string↔bytes
    round-trip (String::getBytes / String::new,
    reference: src/main/java/jc/DemoApplication.java:115,148)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.floor("o_totalprice").cast("long").alias("price_int"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.decode(F.encode("o_orderstatus", "UTF-8"), "UTF-8").alias(
            "status_roundtrip"
        ),
        F.col("o_totalprice").cast("string").like("%.%").alias("has_frac"),
    )


@register(
    "q_fn_url",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || doc_id
               || '?lang=' || lang || '&v=1' AS url
      FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, 'https://([^/]+)/', 1) AS host,
           regexp_extract(url, '://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, 'lang=([^&]+)', 1) AS lang_param
    FROM u
    """,
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL synthesis + structured parse-back (host / path / query param)
    with regexp_extract — the crawl-processing scalar surface. The three
    patterns stay in the RE2 ∩ Java-regex common subset so both engines
    extract identical groups; everything is a pure projection (no
    shuffle, full pushdown of the two source columns)."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id"), F.lit("?lang="), F.col("lang"), F.lit("&v=1"),
    )
    return d.select(
        "doc_id",
        url.alias("url"),
        F.regexp_extract(url, r"https://([^/]+)/", 1).alias("host"),
        F.regexp_extract(url, r"://[^/]+(/[^?]*)", 1).alias("path"),
        F.regexp_extract(url, r"lang=([^&]+)", 1).alias("lang_param"),
    )
