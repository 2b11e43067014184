"""Group B6 — scalar function families (SURVEY.md §2.B6).

One contract query per family, each exercising the family's functions over
testdata.  Cross-engine alignment notes (probed against DuckDB 1.0):

- DuckDB ``dayofweek`` is 0=Sunday, Spark is 1=Sunday → oracle adds 1.
- DuckDB ``date_trunc`` returns DATE for month granularity → oracle casts
  back to TIMESTAMP.
- DuckDB CAST(double AS INT) rounds; Spark truncates → oracle uses
  CAST(TRUNC(x) AS ...).
- int-returning functions differ in width (Spark INT vs DuckDB BIGINT) →
  Spark side casts to bigint.
- transcendentals (ln/log10/sqrt) can differ in the last ulp between libm
  and the JVM → rounded to 6 dp on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from postpy_spark.io import load_table
from postpy_spark.registry import query


@query(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name)                                        AS up_name,
           LOWER(c_mktsegment)                                  AS lo_seg,
           LENGTH(c_name)                                       AS name_len,
           TRIM('  pad  ')                                      AS trimmed,
           SUBSTRING(c_name, 1, 8)                              AS name_prefix,
           CONCAT_WS('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_tag,
           REPLACE(c_name, 'Customer#', 'C')                    AS short_name,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0')            AS padded_key,
           SPLIT_PART(c_name, '#', 2)                           AS num_part,
           INSTR(c_name, '#')                                   AS hash_pos
    FROM customer
    """,
    group="B6",
)
def fn_string_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up_name"),
        F.lower("c_mktsegment").alias("lo_seg"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("-", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")).alias(
            "seg_tag"
        ),
        F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("C")).alias("short_name"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("num_part"),
        F.instr(F.col("c_name"), "#").cast("bigint").alias("hash_pos"),
    )


@query(
    "fn_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '^(\\w+)', 1)          AS first_word,
           regexp_replace(p_name, '[aeiou]', '*', 'g')   AS starred,
           regexp_extract(p_brand, '(\\d+)', 1)          AS brand_num
    FROM part
    WHERE regexp_matches(p_name, '(widget|bolt)$')
    """,
    group="B6",
)
def fn_regex_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / regexp_replace / rlike.  Spark's regexp_replace is
    global by default; the oracle passes the 'g' flag explicitly."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").rlike("(widget|bolt)$")).select(
        "p_partkey",
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("starred"),
        F.regexp_extract("p_brand", r"(\d+)", 1).alias("brand_num"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           YEAR(o_orderdate)                                    AS yr,
           MONTH(o_orderdate)                                   AS mon,
           DAY(o_orderdate)                                     AS dom,
           QUARTER(o_orderdate)                                 AS qtr,
           DAYOFWEEK(o_orderdate) + 1                           AS dow,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP)  AS month_start,
           o_orderdate + INTERVAL 30 DAY                        AS plus_30d,
           DATE_DIFF('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS days_to_ref,
           LAST_DAY(o_orderdate)                                AS eom,
           CAST(o_orderdate AS DATE)                            AS odate,
           DATE_DIFF('second', TIMESTAMP '1970-01-01 00:00:00', o_orderdate) AS epoch_s
    FROM orders
    """,
    group="B6",
)
def fn_date_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("bigint").alias("yr"),
        F.month(d).cast("bigint").alias("mon"),
        F.dayofmonth(d).cast("bigint").alias("dom"),
        F.quarter(d).cast("bigint").alias("qtr"),
        F.dayofweek(d).cast("bigint").alias("dow"),
        F.date_trunc("month", d).alias("month_start"),
        (d + F.expr("INTERVAL 30 DAY")).alias("plus_30d"),
        F.datediff(F.lit("2002-01-01").cast("date"), d.cast("date"))
        .cast("bigint")
        .alias("days_to_ref"),
        F.last_day(d).alias("eom"),
        d.cast("date").alias("odate"),
        d.cast("timestamp").cast("bigint").alias("epoch_s"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT p_partkey,
           ROUND(p_retailprice / 3, 4)                 AS third,
           CAST(FLOOR(p_retailprice) AS BIGINT)        AS fl,
           CAST(CEIL(p_retailprice) AS BIGINT)         AS cl,
           ABS(p_retailprice - 500)                    AS dist500,
           ROUND(POW(p_size, 2), 4)                    AS size_sq,
           ROUND(SQRT(p_retailprice), 6)               AS root,
           ROUND(LN(p_retailprice), 6)                 AS log_e,
           ROUND(LOG10(p_retailprice), 6)              AS log_10,
           MOD(p_partkey, 7)                           AS m7,
           CAST(SIGN(p_retailprice - 500) AS BIGINT)   AS sg,
           GREATEST(p_size, 25)                        AS gr,
           LEAST(p_size, 25)                           AS ls
    FROM part
    """,
    group="B6",
)
def fn_math_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    price = F.col("p_retailprice")
    return p.select(
        "p_partkey",
        F.round(price / 3, 4).alias("third"),
        F.floor(price).alias("fl"),
        F.ceil(price).alias("cl"),
        F.abs(price - 500).alias("dist500"),
        F.round(F.pow(F.col("p_size"), 2), 4).alias("size_sq"),
        F.round(F.sqrt(price), 6).alias("root"),
        F.round(F.log(price), 6).alias("log_e"),
        F.round(F.log10(price), 6).alias("log_10"),
        (F.col("p_partkey") % 7).alias("m7"),
        F.signum(price - 500).cast("bigint").alias("sg"),
        F.greatest(F.col("p_size"), F.lit(25)).alias("gr"),
        F.least(F.col("p_size"), F.lit(25)).alias("ls"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END                                   AS band,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER')    AS seg_or_other,
           NULLIF(c_nationkey, 0)                                 AS nk_or_null,
           CASE WHEN c_acctbal > 0 THEN 'pos' ELSE 'nonpos' END   AS sign_band
    FROM customer
    """,
    group="B6",
)
def fn_conditional_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal < 0, "neg").when(bal < 5000, "mid").otherwise("high").alias("band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.nullif(F.col("c_nationkey"), F.lit(0)).alias("nk_or_null"),
        F.when(bal > 0, "pos").otherwise("nonpos").alias("sign_band"),
    )


@query(
    "fn_cast",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(TRUNC(l_quantity) AS INTEGER)          AS qty_int,
           CAST(l_linenumber AS VARCHAR)               AS line_str,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
           CAST(l_shipdate AS DATE)                    AS ship_date,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR)   AS ship_str,
           CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip
    FROM lineitem
    """,
    group="B6",
)
def fn_cast_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts across numeric/string/date/decimal.  double→int goes through
    TRUNC in the oracle because DuckDB's direct cast rounds while Spark
    (non-ANSI) truncates.

    ``price_dec`` exercises the DECIMAL(12,2) cast but is surfaced as DOUBLE
    on BOTH engines: round-1 driver hash-mismatched on the decimal column
    (``Decimal('123.40')`` textualizes differently across result paths even
    when values are equal), so the output representation is canonicalized
    while the cast under test is preserved."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_linenumber").cast("string").alias("line_str"),
        F.col("l_extendedprice").cast(T.DecimalType(12, 2)).cast("double").alias("price_dec"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_str"),
        F.col("l_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
    )


@query(
    "fn_array",
    oracle="""
    SELECT doc_id,
           LEN(string_split(text, ' '))                                   AS n_toks,
           array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS first3,
           LEN(list_distinct(string_split(text, ' ')))                    AS n_uniq,
           list_contains(string_split(text, ' '), 'spark')                AS has_spark
    FROM documents
    """,
    group="B6",
)
def fn_array_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_toks"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_uniq"),
        F.array_contains(toks, "spark").alias("has_spark"),
    )


@query(
    "fn_array_hof",
    oracle="""
    SELECT vec_id,
           LEN(embedding)                                                  AS dim,
           ROUND(SQRT(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6)         AS l2_norm,
           list_max(embedding)                                             AS max_val,
           LEN(list_filter(embedding, x -> x > 0))                         AS n_pos
    FROM embeddings
    """,
    group="B6",
)
def fn_array_hof_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform/filter/aggregate) on the
    embedding vectors — JVM-side lambda expressions, no Python UDF."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    sum_sq = F.aggregate(
        emb, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return e.select(
        "vec_id",
        F.size(emb).cast("bigint").alias("dim"),
        F.round(F.sqrt(sum_sq), 6).alias("l2_norm"),
        F.array_max(emb).alias("max_val"),
        F.size(F.filter(emb, lambda x: x > 0)).cast("bigint").alias("n_pos"),
    )


@query(
    "fn_map",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT)     AS k_val,
           array_to_string(json_keys(props), ',')                AS key_list,
           LEN(json_keys(props))                                 AS n_keys
    FROM events
    """,
    group="B6",
)
def fn_map_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """props JSON → MapType, then map_keys/element_at (map functions over
    semi-structured data; the oracle works in JSON space)."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), T.MapType(T.StringType(), T.LongType()))
    return e.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.array_join(F.map_keys(m), ",").alias("key_list"),
        F.size(F.map_keys(m)).cast("bigint").alias("n_keys"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_type,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))           AS max_k,
           COUNT(*)                                                         AS n
    FROM events
    GROUP BY event_type
    """,
    group="B6",
)
def fn_json_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255                         AS band,
           l_orderkey | 15                          AS bor,
           xor(l_orderkey, l_linenumber)            AS bxor,
           CAST(l_linenumber AS BIGINT) << 3        AS shl,
           l_orderkey >> 4                          AS shr,
           CAST(bit_count(l_orderkey) AS BIGINT)    AS popcount
    FROM lineitem
    """,
    group="B6",
)
def fn_bitwise_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    k, n = F.col("l_orderkey"), F.col("l_linenumber")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(15)).alias("bor"),
        k.bitwiseXOR(n).alias("bxor"),
        F.shiftleft(n.cast("bigint"), 3).alias("shl"),
        F.shiftright(k, 4).alias("shr"),
        F.bit_count(k).cast("bigint").alias("popcount"),
    )


@query(
    "fn_hash",
    oracle="""
    SELECT c_custkey,
           md5(c_name)    AS name_md5,
           sha256(c_name) AS name_sha256
    FROM customer
    """,
    group="B6",
)
def fn_hash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable cryptographic digests (pgcrypto parity — the
    extension registry maps 'pgcrypto' to these builtins)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
    )


@query(
    "fn_string_extra",
    oracle="""
    SELECT p_partkey,
           translate(p_name, 'aeiou', '_____')  AS devoweled,
           repeat(p_brand, 2)                   AS brand2,
           reverse(p_name)                      AS rev,
           left(p_name, 3)                      AS l3,
           right(p_name, 3)                     AS r3,
           contains(p_name, 'widget')           AS has_widget,
           starts_with(p_name, 'red')           AS is_red,
           ends_with(p_name, 'bolt')            AS is_bolt
    FROM part
    """,
    group="B6",
)
def fn_string_extra_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    n = F.col("p_name")
    return p.select(
        "p_partkey",
        F.translate(n, "aeiou", "_____").alias("devoweled"),
        F.repeat(F.col("p_brand"), 2).alias("brand2"),
        F.reverse(n).alias("rev"),
        F.substring(n, 1, 3).alias("l3"),
        F.substring(n, -3, 3).alias("r3"),
        F.contains(n, F.lit("widget")).alias("has_widget"),
        F.startswith(n, F.lit("red")).alias("is_red"),
        F.endswith(n, F.lit("bolt")).alias("is_bolt"),
    )


@query(
    "agg_median_mode",
    oracle="""
    SELECT l_returnflag,
           ROUND(MEDIAN(l_extendedprice), 4)            AS med_price,
           CAST(MODE(l_linenumber) AS BIGINT)           AS common_line,
           ROUND(MEDIAN(l_quantity), 4)                 AS med_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    group="B3",
)
def agg_median_mode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median (interpolated for even counts in both engines) and mode
    (l_linenumber has strictly decreasing frequencies, so the mode is
    tie-free — mode is engine-arbitrary under ties)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.median("l_extendedprice"), 4).alias("med_price"),
        F.mode("l_linenumber").cast("bigint").alias("common_line"),
        F.round(F.median("l_quantity"), 4).alias("med_qty"),
    )


@query(
    "agg_bool",
    oracle="""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000)   AS all_over_1k,
           bool_or(o_totalprice > 400000)  AS any_over_400k,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
    group="B3",
)
def agg_bool_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_regr",
    oracle="""
    SELECT ROUND(regr_slope(l_extendedprice, l_quantity), 6)     AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           regr_count(l_extendedprice, l_quantity)               AS n,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6)        AS r2
    FROM lineitem
    """,
    group="B3",
)
def agg_regr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (PostgreSQL's regr_* family)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("intercept"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
    )


@query(
    "fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           json_extract_string(props, '$.k')                 AS k_str,
           json_extract_string(props, '$.missing') IS NULL   AS missing_is_null
    FROM events
    """,
    group="B6",
)
def fn_variant_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type for semi-structured data: parse once, typed
    extraction via path expressions (the modern jsonb analog; DuckDB's
    JSON type is the oracle's equivalent)."""
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k_val"),
        F.try_variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "string").isNull().alias("missing_is_null"),
    )


@query(
    "fn_datetime_extra",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE)          AS plus_3m,
           CAST(WEEKOFYEAR(o_orderdate) AS BIGINT)               AS iso_week,
           CAST(DAYOFYEAR(o_orderdate) AS BIGINT)                AS doy,
           MAKE_DATE(CAST(YEAR(o_orderdate) AS INT), 1, 1)       AS year_start,
           CAST(CAST(o_orderdate AS DATE)
             + INTERVAL ((7 + 1 - ISODOW(o_orderdate) - 1) % 7 + 1) DAY
             AS DATE)                                            AS next_monday,
           STRFTIME(o_orderdate, '%Y-%m')                        AS ym_label
    FROM orders
    """,
    group="B6",
)
def fn_datetime_extra_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second datetime family: calendar arithmetic beyond fn_date —
    add_months (month-end clamped on both engines), ISO week, day-of-year,
    make_date, next_day (DuckDB lacks it: oracle emulates with ISODOW
    arithmetic), and date_format/strftime labels."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.add_months(d, 3).alias("plus_3m"),
        F.weekofyear(d).cast("bigint").alias("iso_week"),
        F.dayofyear(d).cast("bigint").alias("doy"),
        F.make_date(F.year(d), F.lit(1), F.lit(1)).alias("year_start"),
        F.next_day(d, "Mon").alias("next_monday"),
        F.date_format(d, "yyyy-MM").alias("ym_label"),
    )


@query(
    "fn_url",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               concat('https://ex', doc_id % 5, '.example.com/p/', doc_id,
                      '?q=', lang, '&id=', doc_id) AS url
        FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, 'https?://([^/?#]+)', 1)  AS host,
           regexp_extract(url, 'https?://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]q=([^&#]*)', 1)      AS q_param
    FROM u
    """,
    group="B6",
)
def fn_url_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing (web-corpus provenance handling): Spark's native
    parse_url vs a regexp oracle (DuckDB has no URL functions) over
    deterministically constructed URLs."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://ex"), (F.col("doc_id") % 5).cast("string"),
        F.lit(".example.com/p/"), F.col("doc_id").cast("string"),
        F.lit("?q="), F.col("lang"), F.lit("&id="), F.col("doc_id").cast("string"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("q")).alias("q_param"),
    )


@query(
    "fn_struct_nested",
    oracle="""
    WITH s AS (
        SELECT o_orderkey,
               {'status': o_orderstatus,
                'money': {'total': o_totalprice,
                          'band': CASE WHEN o_totalprice > 200000
                                       THEN 'big' ELSE 'small' END}} AS info,
               [{'pos': 1, 'amt': o_totalprice},
                {'pos': 2, 'amt': o_totalprice / 2}] AS parts
        FROM orders
    )
    SELECT o_orderkey,
           info.status                                   AS status,
           info.money.band                               AS band,
           ROUND(info.money.total, 2)                    AS total,
           CAST(LEN(parts) AS INT)                       AS n_parts,
           ROUND(list_sum(list_transform(parts, p -> p.amt)), 4) AS parts_sum
    FROM s
    """,
    group="B6",
)
def fn_struct_nested_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested struct construction + dotted-path navigation + arrays of
    structs with field-projection lambdas — the JSON-ish shaped-data
    surface, all JVM expressions."""
    o = load_table(spark, sf_dir, "orders")
    info = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.struct(
            F.col("o_totalprice").alias("total"),
            F.when(F.col("o_totalprice") > 200000, "big").otherwise("small").alias(
                "band"
            ),
        ).alias("money"),
    )
    parts = F.array(
        F.struct(F.lit(1).alias("pos"), F.col("o_totalprice").alias("amt")),
        F.struct(F.lit(2).alias("pos"), (F.col("o_totalprice") / 2).alias("amt")),
    )
    s = o.select("o_orderkey", info.alias("info"), parts.alias("parts"))
    return s.select(
        "o_orderkey",
        F.col("info.status").alias("status"),
        F.col("info.money.band").alias("band"),
        F.round(F.col("info.money.total"), 2).alias("total"),
        F.size("parts").alias("n_parts"),
        F.round(
            F.aggregate(
                F.transform("parts", lambda p: p["amt"]),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            4,
        ).alias("parts_sum"),
    )


@query("agg_approx_topk", oracle=None, group="B3")
def agg_approx_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in approx_top_k sketch (Spark 4) over order priorities —
    the one-expression flavor of the Misra-Gries pipeline in
    text_heavy_hitters.  Rows-only (sketch internals are engine-specific);
    pytest asserts exact agreement with the true top-k on this data, where
    every priority clears the sketch capacity."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.agg(F.expr("approx_top_k(o_orderpriority, 3)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("item"),
            F.col("e.count").cast("bigint").alias("cnt"),
        )
    )


@query(
    "agg_topk_planted",
    oracle="""
    SELECT CASE WHEN o_orderkey % 10 < 6 THEN 'alpha'
                WHEN o_orderkey % 10 < 9 THEN 'beta'
                ELSE 'gamma' END            AS item,
           CAST(COUNT(*) AS BIGINT)         AS cnt
    FROM orders WHERE o_orderkey <= 500
    GROUP BY 1
    """,
    group="B3",
)
def agg_topk_planted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-oracle attestation of the approx_top_k sketch path
    (agg_approx_topk is rows-only — sketch internals are engine-specific):
    the plant has exactly THREE distinct items over a FIXED key range
    (o_orderkey <= 500, so the input is byte-identical at every sf tier),
    and approx_top_k tracks every item exactly whenever the distinct
    count clears the sketch capacity (3 << default maxItemsTracked) — the
    sketch degenerates to the exact frequency table, independent of
    partitioning or merge order, so the closed form IS GROUP BY count.
    k = 3 over 3 items also makes membership tie-proof: whatever the
    counts, all three items are returned.  The pytest exactness gate on
    the production query covers the priority-domain flavor; this pins the
    same expression through the sql-hash gate."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    item = (
        F.when(F.col("o_orderkey") % 10 < 6, "alpha")
        .when(F.col("o_orderkey") % 10 < 9, "beta")
        .otherwise("gamma")
    )
    return (
        o.select(item.alias("item"))
        .agg(F.expr("approx_top_k(item, 3)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("item"),
            F.col("e.count").cast("bigint").alias("cnt"),
        )
    )


@query(
    "fn_trig",
    oracle="""
    SELECT p_partkey,
           ROUND(SIN(p_size / 10.0), 6)              AS sn,
           ROUND(COS(p_size / 10.0), 6)              AS cs,
           ROUND(ATAN2(p_size, 7), 6)                AS at2,
           ROUND(DEGREES(ATAN(p_size / 25.0)), 6)    AS deg,
           ROUND(RADIANS(p_size), 6)                 AS rad,
           ROUND(EXP(p_size / 50.0), 6)              AS ex
    FROM part
    """,
    group="B6",
)
def fn_trig_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric / transcendental family, rounded at 6 dp (libm vs JVM
    last-ulp divergence)."""
    p = load_table(spark, sf_dir, "part")
    sz = F.col("p_size")
    return p.select(
        "p_partkey",
        F.round(F.sin(sz / 10.0), 6).alias("sn"),
        F.round(F.cos(sz / 10.0), 6).alias("cs"),
        F.round(F.atan2(sz.cast("double"), F.lit(7.0)), 6).alias("at2"),
        F.round(F.degrees(F.atan(sz / 25.0)), 6).alias("deg"),
        F.round(F.radians(sz), 6).alias("rad"),
        F.round(F.exp(sz / 50.0), 6).alias("ex"),
    )


@query(
    "fn_binary",
    oracle="""
    SELECT c_custkey,
           to_base64(CAST(c_name AS BLOB))           AS b64,
           lower(to_hex(CAST(c_mktsegment AS BLOB))) AS hx,
           CAST(octet_length(CAST(c_name AS BLOB)) AS BIGINT) AS n_bytes,
           CAST(CAST(to_base64(CAST(c_name AS BLOB)) AS VARCHAR) =
                to_base64(CAST(c_name AS BLOB)) AS BOOLEAN)   AS roundtrip_ok
    FROM customer
    """,
    group="B6",
)
def fn_binary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary encodings: base64 / hex / byte length over UTF-8 payloads —
    the wire-format helpers for opaque columns."""
    c = load_table(spark, sf_dir, "customer")
    payload = F.encode(F.col("c_name"), "UTF-8")
    return c.select(
        "c_custkey",
        F.base64(payload).alias("b64"),
        F.lower(F.hex(F.encode(F.col("c_mktsegment"), "UTF-8"))).alias("hx"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        (F.encode(F.unbase64(F.base64(payload)), "UTF-8") == payload).alias(
            "roundtrip_ok"
        ),
    )


@query(
    "fn_collation",
    oracle="""
    WITH m AS (
        SELECT CASE WHEN c_custkey % 2 = 0 THEN UPPER(c_mktsegment)
                    ELSE LOWER(c_mktsegment) END AS seg,
               c_acctbal
        FROM customer
    )
    SELECT LOWER(seg) AS segment,
           COUNT(*) AS n,
           ROUND(SUM(c_acctbal), 4) AS total_bal
    FROM m GROUP BY LOWER(seg)
    """,
    group="B6",
)
def fn_collation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 collation surface (postgres COLLATE analog): market segments
    mixed-cased by key parity, then grouped under the UTF8_LCASE collation
    — the engine folds case in the GROUP BY itself (hash/compare happen on
    collation keys JVM-side), no pre-lowering of the data.  Output is
    canonicalized to lower + plain string so the result is deterministic
    (a collated group's representative string is first-seen-arbitrary)."""
    c = load_table(spark, sf_dir, "customer")
    seg = F.when(
        F.col("c_custkey") % 2 == 0, F.upper(F.col("c_mktsegment"))
    ).otherwise(F.lower(F.col("c_mktsegment")))
    return (
        c.select(seg.alias("seg"), "c_acctbal")
        .groupBy(F.collate(F.col("seg"), "UTF8_LCASE").alias("cseg"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("c_acctbal"), 4).alias("total_bal"),
        )
        .select(
            F.lower(F.col("cseg")).cast("string").alias("segment"), "n", "total_bal"
        )
    )


@query(
    "fn_generator_explode",
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS BIGINT)
             AS pos,
           unnest(string_split(text, ' ')) AS tok
    FROM documents WHERE doc_id < 20
    """,
    group="B6",
)
def fn_generator_explode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator surface: positional explode (LATERAL VIEW posexplode /
    UNNEST WITH ORDINALITY).  One narrow generate node — rows fan out
    inside the stage, no shuffle; the 0-based position column is the
    contract (DuckDB's generate_subscripts is 1-based, adjusted in the
    oracle)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    out = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok")
    )
    return out.withColumn("pos", F.col("pos").cast("bigint"))


@query("agg_cms_estimate", oracle=None, group="B3")
def agg_cms_estimate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch point-frequency estimates for the 20 lowest user
    ids over the events stream — the sketch is a DISTRIBUTED depth×width
    counter frame (operators/sketch.py), probed with a bucket equi-join +
    MIN, never a driver-side object.  Rows-only (xxhash64 bucketing is
    engine-specific); pytest pins the CMS contract — estimates never
    undercount, overshoot bounded by colliding mass — and exact
    mergeability (shard sketches sum to the full sketch)."""
    from postpy_spark.operators import sketch as SK

    e = load_table(spark, sf_dir, "events")
    cms = SK.cms_build(e, "user_id", depth=4, width=256)
    probes = e.select("user_id").distinct().orderBy("user_id").limit(20)
    return SK.cms_estimate(cms, probes, "user_id", depth=4, width=256).select(
        F.col("key").alias("user_id"), F.col("est").cast("bigint").alias("est")
    )


@query(
    "agg_cms_planted",
    oracle="""
    SELECT CAST(o_orderkey % 20 AS BIGINT) AS key20,
           CAST(COUNT(*) AS BIGINT)        AS est
    FROM orders WHERE o_orderkey <= 400
    GROUP BY 1
    """,
    group="B3",
)
def agg_cms_planted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-oracle attestation of the count-min sketch path
    (operators/sketch.py::cms_build/cms_estimate; agg_cms_estimate is
    rows-only because xxhash64 bucketing is engine-specific): with 20
    planted keys in a depth=4 x width=256 sketch over a FIXED key range
    (o_orderkey <= 400 — input byte-identical at every sf tier), every
    probe key has at least one hash row where it collides with nothing,
    so MIN over the probed counters returns the key's true frequency and
    the closed form is the exact GROUP BY count.  The collision structure
    is a deterministic function of xxhash64 on this fixed 20-key domain
    (pinned by tests/test_functions_ops.py::test_cms_planted_collision_free
    — each key provably owns a private bucket in >= 1 of the 4 rows), so
    the exactness is stable, not sampled luck.  The overshoot-bound pytest
    on agg_cms_estimate covers the colliding regime this closed form
    cannot."""
    from postpy_spark.operators import sketch as SK

    pk = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 400)
        .select((F.col("o_orderkey") % 20).alias("key20"))
    )
    cms = SK.cms_build(pk, "key20", depth=4, width=256)
    probes = pk.select("key20").distinct()
    return SK.cms_estimate(cms, probes, "key20", depth=4, width=256).select(
        F.col("key").alias("key20"), F.col("est").cast("bigint").alias("est")
    )


@query("agg_kll_quantiles", oracle=None, group="B3")
def agg_kll_quantiles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL-style mergeable QUANTILE sketch over lineitem extendedprice
    (operators/kll.py) — the quantile member of the shard-addable sketch
    kit (HLL/KMV cardinality, CMS frequency, bitmap exact): one
    constant-memory mapInPandas sweep emits a bounded sketch row per
    partition; quantiles come from the driver-side merge of those rows,
    never from re-reading data.  Unlike approx_percentile the per-shard
    sketch rows are persistable artifacts — day-over-day rollups merge
    sketches.  Rows-only (compaction is seeded-random by nature); pytest
    pins the rank-error bound vs exact quantiles, mergeability (union
    sketch ~= sketch of union), and the small-input exact branch.

    Reproducibility note: one seeded sketch is built per input PARTITION
    and merged in collect order, so the exact estimate values depend on
    the physical partitioning of the scan (spark.sql.files.* settings,
    file layout).  Row count is always len(qs); the rank-ERROR bound
    holds under any partitioning — never pin exact estimate values in
    tests or oracles.  (agg_kll_planted is the layout-INDEPENDENT exact
    twin: with total n <= k no compaction can occur under any
    partitioning, so the same operator path becomes hash-checkable.)"""
    from postpy_spark.operators import kll as KLL

    li = load_table(spark, sf_dir, "lineitem")
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    sketches = KLL.kll_build(li, "l_extendedprice", k=200)
    est, n = KLL.kll_merge_quantiles(sketches, qs, k=200)
    return spark.createDataFrame(
        [(float(q), float(v), int(n)) for q, v in zip(qs, est)],
        "q double, est double, n_total bigint",
    )


@query(
    "agg_kll_planted",
    oracle="""
    WITH v AS (
        SELECT CAST((o_orderkey * 37) % 997 AS DOUBLE) AS val
        FROM orders WHERE o_orderkey < 151
    ),
    r AS (SELECT val, ROW_NUMBER() OVER (ORDER BY val) AS rn FROM v),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM v),
    qs AS (SELECT CAST(q AS DOUBLE) AS q
           FROM (VALUES (0.1), (0.25), (0.5), (0.75), (0.9), (0.99)) t(q))
    SELECT qs.q AS q, MIN(r.val) AS est, MAX(n.n_total) AS n_total
    FROM qs CROSS JOIN n JOIN r ON r.rn >= qs.q * n.n_total
    GROUP BY qs.q
    """,
    group="B3",
)
def agg_kll_planted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-oracle attestation of the KLL quantile-sketch path
    (operators/kll.py: per-partition mapInPandas compactor -> driver-side
    sketch merge -> weighted-rank quantiles): agg_kll_quantiles is
    rows-only AND layout-dependent (seeded compaction per physical
    partition), but with total n = 151 <= k = 200 NO compaction can
    trigger in any partition or in the merge — every sketch is its raw
    level-0 values under ANY physical layout, so the estimator's
    smallest-rank-with-cum-weight >= q*n answer is the closed form the
    oracle states (a lower-quantile over 151 distinct planted values;
    (o_orderkey*37) % 997 is a bijection below the prime).  n = 151 keeps
    every q*n at least 0.1 away from an integer so float noise in q*n
    cannot flip a rank on either engine.  This pins the sketch's insert,
    merge, and query logic exactly — the error-bound pytest then covers
    the compacting regime the closed form cannot."""
    from postpy_spark.operators import kll as KLL

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 151)
    vals = o.select(
        ((F.col("o_orderkey") * 37) % 997).cast("double").alias("val")
    )
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    sketches = KLL.kll_build(vals, "val", k=200)
    est, n = KLL.kll_merge_quantiles(sketches, qs, k=200)
    return spark.createDataFrame(
        [(float(q), float(v), int(n)) for q, v in zip(qs, est)],
        "q double, est double, n_total bigint",
    )


@query("agg_kmv_distinct", oracle=None, group="B3")
def agg_kmv_distinct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch over event users —
    the third mergeable cardinality sketch next to HLL
    (agg_hll_mergeable) and exact bitmaps (agg_bitmap_distinct), and the
    one whose sketches also support UNION estimates by construction.
    The global k-min is TakeOrderedAndProject (no one-task window).
    Rows-only (xxhash64 is engine-specific); pytest pins the exact-below-k
    branch, a ±3σ accuracy band, and exact mergeability."""
    from postpy_spark.operators import sketch as SK

    e = load_table(spark, sf_dir, "events")
    return SK.kmv_estimate(SK.kmv_build(e, "user_id", k=64), k=64)


@query(
    "agg_kmv_planted",
    oracle="""
    SELECT CAST(COUNT(DISTINCT o_orderkey % 40) AS BIGINT) AS est,
           CAST(COUNT(DISTINCT o_orderkey % 40) AS BIGINT) AS n_hashes
    FROM orders
    """,
    group="B3",
)
def agg_kmv_planted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-oracle attestation of the KMV sketch's exact-below-k branch
    (operators/sketch.py::kmv_build/kmv_estimate): agg_kmv_distinct is
    rows-only (the (k-1)/u_(k) estimator depends on xxhash64 values),
    but with 40 planted distinct keys < k = 64 the sketch provably holds
    EVERY distinct hash, so the estimator returns the sketch size itself
    — the exact distinct count, independent of hash values, partitioning,
    or collision behavior (n_hashes counts rows, not distinct hashes).
    Pins the distinct shuffle, the TakeOrdered k-min, and the branch
    select exactly; the ±3σ band pytest covers the estimating regime."""
    from postpy_spark.operators import sketch as SK

    o = load_table(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 40).alias("key40")
    )
    return SK.kmv_estimate(SK.kmv_build(o, "key40", k=64), k=64)


@query(
    "fn_try_safe",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / NULLIF(l_discount, 0.0)          AS price_per_disc,
           TRY_CAST(CASE WHEN l_linenumber <= 3
                         THEN CAST(l_linenumber AS VARCHAR)
                         ELSE 'n/a' END AS BIGINT)            AS parsed_line,
           CASE WHEN l_quantity > 0
                THEN CAST(FLOOR(l_extendedprice / l_quantity) AS BIGINT)
           END                                                AS unit_floor
    FROM lineitem WHERE l_orderkey < 300
    """,
    group="B6",
)
def fn_try_safe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic surface (ANSI-mode survival kit): Spark 4
    runs under ANSI SQL where division-by-zero and bad casts THROW —
    `try_divide` / `try_cast` return NULL instead, which is what a
    pipeline over dirty data needs (postpy parity: PostgreSQL NULLIF /
    safe-cast idioms, spelled on the oracle side exactly that way).
    Pure projection, codegen'd, filter pushed to the scan."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_extendedprice"), F.nullif(F.col("l_discount"), F.lit(0.0))
        ).alias("price_per_disc"),
        F.try_to_number(
            F.when(
                F.col("l_linenumber") <= 3, F.col("l_linenumber").cast("string")
            ).otherwise(F.lit("n/a")),
            F.lit("9"),
        )
        .cast("bigint")
        .alias("parsed_line"),
        F.when(
            F.col("l_quantity") > 0,
            F.floor(F.try_divide(F.col("l_extendedprice"), F.col("l_quantity")))
            .cast("bigint"),
        ).alias("unit_floor"),
    )
