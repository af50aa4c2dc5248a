"""Scalar function / expression coverage (SURVEY.md §2.2, §2.8).

Mirrors the reference's function inventory (tajo-core/.../engine/function/:
string/ 36 classes, math/ 26, datetime/ 13, json/ 5) and its expression
test suites (TestStringOperatorsAndFunctions, TestMathFunctions,
TestDateTimeFunctions, TestJsonFunctions, TestPredicates).

Dialect notes baked into the oracles:
  * Spark ceil/floor(double) return BIGINT; DuckDB return DOUBLE —
    both sides cast explicitly.
  * year()/extract() return INT in Spark, BIGINT in DuckDB — Spark side
    casts to long.
  * double→int CAST rounds in DuckDB but truncates in Spark — avoided.
All functions run over full tables (distributed expression eval, not
driver-side constants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tajo_spark.catalog import load_table
from tajo_spark.queries.registry import query


@query(
    "fn_string_basic",
    "function",
    doc="upper/lower/length/substr/trim/lpad/rpad/reverse/repeat/initcap/"
    "concat/concat_ws/|| — ref engine/function/string/ (36 classes).",
    oracle="""
        SELECT c_custkey,
               upper(c_name)                  AS up,
               lower(c_mktsegment)            AS lo,
               length(c_name)                 AS len,
               substr(c_name, 1, 8)           AS sub,
               lpad(c_mktsegment, 12, '*')    AS lpadded,
               rpad(c_mktsegment, 12, '-')    AS rpadded,
               reverse(c_mktsegment)          AS rev,
               repeat('ab', 3)                AS rep,
               upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2))
                                              AS icap,
               concat(c_name, '/', c_mktsegment) AS cat,
               concat_ws('-', c_name, c_mktsegment) AS catws,
               c_name || '!' AS bang
        FROM customer WHERE c_custkey < 50
    """,
)
def fn_string_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 50)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.length("c_name").alias("len"),
        F.substring("c_name", 1, 8).alias("sub"),
        F.lpad("c_mktsegment", 12, "*").alias("lpadded"),
        F.rpad("c_mktsegment", 12, "-").alias("rpadded"),
        F.reverse("c_mktsegment").alias("rev"),
        F.repeat(F.lit("ab"), 3).alias("rep"),
        F.initcap(F.lower("c_mktsegment")).alias("icap"),
        F.concat("c_name", F.lit("/"), "c_mktsegment").alias("cat"),
        F.concat_ws("-", "c_name", "c_mktsegment").alias("catws"),
        F.concat("c_name", F.lit("!")).alias("bang"),
    )


@query(
    "fn_string_regex",
    "function",
    doc="regexp_replace/split_part/strpos/ascii/chr/md5/btrim/ltrim/rtrim — "
    "ref string/RegexpReplace.java, SplitPart.java, StrPos.java, Md5.java.",
    oracle="""
        SELECT p_partkey,
               regexp_replace(p_type, '[AEIOU]', '_', 'g') AS devoweled,
               split_part(p_brand, '#', 2)      AS brand_num,
               strpos(p_type, 'O')              AS o_pos,
               ascii(p_brand)                   AS first_ascii,
               chr(65 + CAST(p_size % 26 AS INT)) AS size_chr,
               md5(p_name)                      AS name_md5,
               trim('  pad  ')                  AS btrimmed,
               ltrim('  pad  ')                 AS ltrimmed,
               rtrim('  pad  ')                 AS rtrimmed
        FROM part WHERE p_partkey < 60
    """,
)
def fn_string_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 60)
    return p.select(
        "p_partkey",
        F.regexp_replace("p_type", "[AEIOU]", "_").alias("devoweled"),
        F.split_part(F.col("p_brand"), F.lit("#"), F.lit(2)).alias("brand_num"),
        F.instr(F.col("p_type"), "O").alias("o_pos"),
        F.ascii("p_brand").alias("first_ascii"),
        F.chr(F.lit(65) + (F.col("p_size") % 26).cast("int")).alias("size_chr"),
        F.md5(F.col("p_name").cast("binary")).alias("name_md5"),
        F.trim(F.lit("  pad  ")).alias("btrimmed"),
        F.ltrim(F.lit("  pad  ")).alias("ltrimmed"),
        F.rtrim(F.lit("  pad  ")).alias("rtrimmed"),
    )


@query(
    "fn_math",
    "function",
    doc="abs/ceil/floor/round/sqrt/cbrt/exp/pow/mod/sign/trig/degrees/"
    "radians/pi — ref engine/function/math/ (26 classes).",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               abs(l_discount - 0.05)                    AS absd,
               CAST(ceil(l_extendedprice) AS BIGINT)     AS ceilp,
               CAST(floor(l_extendedprice) AS BIGINT)    AS floorp,
               round(l_extendedprice, 1)                 AS round1,
               round(sqrt(l_quantity), 6)                AS sqrtq,
               round(cbrt(l_quantity), 6)                AS cbrtq,
               round(exp(l_discount), 6)                 AS expd,
               round(pow(l_quantity, 2), 2)              AS qty_sq,
               CAST(l_orderkey % 7 AS BIGINT)            AS mod7,
               CAST(sign(l_discount - 0.05) AS DOUBLE)   AS sgn,
               round(sin(l_quantity) + cos(l_quantity) + atan(l_quantity), 6)
                                                         AS trig,
               round(degrees(l_discount), 6)             AS deg,
               round(radians(l_quantity), 6)             AS rad,
               round(pi(), 6)                            AS pi_val
        FROM lineitem WHERE l_orderkey < 30
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 30)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("absd"),
        F.ceil("l_extendedprice").cast("long").alias("ceilp"),
        F.floor("l_extendedprice").cast("long").alias("floorp"),
        F.round("l_extendedprice", 1).alias("round1"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrtq"),
        F.round(F.cbrt("l_quantity"), 6).alias("cbrtq"),
        F.round(F.exp("l_discount"), 6).alias("expd"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        (F.col("l_orderkey") % 7).cast("long").alias("mod7"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("sgn"),
        F.round(
            F.sin("l_quantity") + F.cos("l_quantity") + F.atan("l_quantity"), 6
        ).alias("trig"),
        F.round(F.degrees("l_discount"), 6).alias("deg"),
        F.round(F.radians("l_quantity"), 6).alias("rad"),
        F.round(F.lit(3.141592653589793), 6).alias("pi_val"),
    )


@query(
    "fn_datetime",
    "function",
    doc="year/month/day/hour/minute extraction, date_trunc, interval "
    "arithmetic, to_char→date_format — ref engine/function/datetime/ "
    "(13 classes) + time_zone.rst semantics (session TZ pinned UTC).",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS BIGINT)   AS y,
               CAST(month(o_orderdate) AS BIGINT)  AS m,
               CAST(day(o_orderdate) AS BIGINT)    AS d,
               date_trunc('month', o_orderdate)    AS month_start,
               o_orderdate + INTERVAL 10 DAY       AS plus10d,
               o_orderdate + INTERVAL 2 MONTH      AS plus2m,
               strftime(o_orderdate, '%Y-%m-%d')   AS ymd,
               CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS as_date
        FROM orders WHERE o_orderkey < 40
    """,
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 40)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 10 DAY")).alias("plus10d"),
        (F.col("o_orderdate") + F.expr("INTERVAL 2 MONTH")).alias("plus2m"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("ymd"),
        F.col("o_orderdate").cast("date").cast("string").alias("as_date"),
    )


@query(
    "fn_json",
    "function",
    doc="JSON path extraction over events.props — ref engine/function/json/ "
    "(json_extract_path_text ≈ get_json_object).",
    oracle="""
        SELECT event_id,
               json_extract_string(props, '$.k')            AS k_text,
               CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
               CAST(json_extract_string(props, '$.k') AS INT) * 2 AS k_doubled
        FROM events WHERE event_id < 100
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.alias("k_text"),
        k.cast("int").alias("k_int"),
        (k.cast("int") * 2).alias("k_doubled"),
    )


@query(
    "fn_conditional",
    "function",
    doc="CASE / IF / COALESCE / NULLIF / IN-list / BETWEEN / LIKE / ILIKE / "
    "SIMILAR TO→rlike / IS NULL — ref expr/EvalType.java:21-70 inventory "
    "(CaseWhenEval, LikePredicateEval, SimilarToPredicateEval, "
    "BetweenPredicateEval).",
    oracle="""
        SELECT p_partkey,
               CASE WHEN p_size < 10 THEN 'small'
                    WHEN p_size < 30 THEN 'medium'
                    ELSE 'large' END                    AS size_class,
               coalesce(nullif(p_brand, 'Brand#12'), 'TWELVE') AS brand_or,
               p_type IN ('PROMO', 'ECONOMY')           AS is_cheap_type,
               p_size BETWEEN 5 AND 15                  AS mid_size,
               p_name LIKE '%a%'                        AS has_a,
               p_type ILIKE 'promo%'                    AS is_promo_i,
               p_brand SIMILAR TO 'Brand#(1|2)[0-9]'    AS brand_1x_2x,
               nullif(p_type, 'PROMO') IS NULL          AS type_was_promo
        FROM part WHERE p_partkey < 80
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 80)
    return p.select(
        "p_partkey",
        F.when(F.col("p_size") < 10, "small")
        .when(F.col("p_size") < 30, "medium")
        .otherwise("large")
        .alias("size_class"),
        F.coalesce(F.nullif(F.col("p_brand"), F.lit("Brand#12")), F.lit("TWELVE"))
        .alias("brand_or"),
        F.col("p_type").isin("PROMO", "ECONOMY").alias("is_cheap_type"),
        F.col("p_size").between(5, 15).alias("mid_size"),
        F.col("p_name").like("%a%").alias("has_a"),
        F.col("p_type").ilike("promo%").alias("is_promo_i"),
        F.col("p_brand").rlike("^(?:Brand#(1|2)[0-9])$").alias("brand_1x_2x"),
        F.nullif(F.col("p_type"), F.lit("PROMO")).isNull().alias("type_was_promo"),
    )


@query(
    "fn_cast",
    "function",
    doc="CAST matrix: int→double, bigint→string, string→double round-trip, "
    "boolean→string — ref expr CastEval + DataTypes.proto type lattice.",
    oracle="""
        SELECT n_nationkey,
               CAST(n_nationkey AS DOUBLE)            AS as_double,
               CAST(n_regionkey AS VARCHAR)           AS as_text,
               CAST(CAST(n_nationkey AS VARCHAR) AS INT) AS roundtrip,
               CAST(n_nationkey >= 10 AS VARCHAR)     AS bool_text
        FROM nation
    """,
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.col("n_nationkey").cast("double").alias("as_double"),
        F.col("n_regionkey").cast("string").alias("as_text"),
        F.col("n_nationkey").cast("string").cast("int").alias("roundtrip"),
        (F.col("n_nationkey") >= 10).cast("string").alias("bool_text"),
    )


@query(
    "fn_tajo_registry",
    "function",
    doc="Tajo-name function registry through the SQL path (Engine): "
    "strposb (byte offsets), quote_ident, digest, json_extract_path_text "
    "over events.props, div — all SQL UDFs inlined by Catalyst "
    "(FunctionLoader.java:50 parity, zero Python overhead).",
    oracle="""
        SELECT event_id,
               CASE WHEN strpos(props, 'k') = 0 THEN 0
                    ELSE octet_length(encode(substr(props, 1, strpos(props, 'k') - 1))) + 1
               END AS k_bpos,
               CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k_val,
               md5(event_type) AS et_digest,
               CASE WHEN regexp_matches(event_type, '^[a-z_][a-z0-9_]*$')
                    THEN event_type
                    ELSE '"' || replace(event_type, '"', '""') || '"'
               END AS et_ident,
               CAST(event_id // 7 AS BIGINT) AS id_div7
        FROM events
    """,
)
def fn_tajo_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tajo_spark.catalog import register_tables
    from tajo_spark.functions.registry import register_all

    register_all(spark)
    register_tables(spark, sf_dir, ("events",))
    return spark.sql(
        """
        SELECT event_id,
               strposb(props, 'k') AS k_bpos,
               json_extract_path_text(props, 'k') AS k_val,
               digest(event_type, 'md5') AS et_digest,
               quote_ident(event_type) AS et_ident,
               div(event_id, 7) AS id_div7
        FROM events
        """
    )


@query(
    "fn_similar_to_dialect",
    "function",
    doc="SIMILAR TO through the dialect shim (SimilarToPredicateEval.java "
    "parity): SQL-regex translated to Java regex, full-anchored.",
    oracle="""
        SELECT p_partkey, p_name FROM part
        WHERE regexp_full_match(p_name, '(large|small) .*')
    """,
)
def fn_similar_to_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tajo_spark.catalog import register_tables
    from tajo_spark.plans import dialect

    register_tables(spark, sf_dir, ("part",))
    return spark.sql(
        dialect.translate(
            "SELECT p_partkey, p_name FROM part "
            "WHERE p_name SIMILAR TO '(large|small) %'"
        )
    )


@query(
    "fn_to_char_pg_formats",
    "function",
    doc="to_char with PostgreSQL format codes through the dialect shim "
    "(ToCharTimestamp.java parity) over order dates.",
    oracle="""
        SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS od
        FROM orders WHERE o_orderkey < 100
    """,
)
def fn_to_char_pg_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tajo_spark.catalog import register_tables
    from tajo_spark.plans import dialect

    register_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        dialect.translate(
            "SELECT o_orderkey, "
            "to_char(o_orderdate, 'YYYY-MM-DD HH24:MI:SS') AS od "
            "FROM orders WHERE o_orderkey < 100"
        )
    )


@query(
    "fn_string_math_extended",
    "function",
    doc="Remaining §2.8 scalar-function sweep: find_in_set, left/right, "
    "strpos(locate), btrim, bit_length, to_hex, mod, atan2, tan, "
    "asin/acos — all native Spark built-ins "
    "(engine/function/string/*, math/* parity).",
    oracle="""
        SELECT p_partkey,
               CAST(coalesce(list_position(string_split('bolt,widget,rod', ','),
                             split_part(p_name, ' ', 2)), 0) AS INT)
                 AS in_set,
               left(p_name, 3) AS l3,
               right(p_name, 3) AS r3,
               CAST(strpos(p_name, 'o') AS INT) AS o_pos,
               trim(p_name, 'dl') AS btrimmed,
               CAST(bit_length(p_name) AS INT) AS bits,
               upper(to_hex(p_partkey)) AS hexkey,
               CAST(mod(p_partkey, 7) AS BIGINT) AS m7,
               round(atan2(p_size, 10), 6) AS at2,
               round(tan(p_size / 100.0), 6) AS tn,
               round(asin(least(p_size / 50.0, 1.0)), 6) AS asn,
               round(acos(least(p_size / 50.0, 1.0)), 6) AS acs
        FROM part
    """,
)
def fn_string_math_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    name, size, key = F.col("p_name"), F.col("p_size"), F.col("p_partkey")
    return part.select(
        "p_partkey",
        F.find_in_set(F.split_part(name, F.lit(" "), F.lit(2)),
                      F.lit("bolt,widget,rod")).alias("in_set"),
        F.left(name, F.lit(3)).alias("l3"),
        F.right(name, F.lit(3)).alias("r3"),
        F.locate("o", name).alias("o_pos"),
        F.btrim(name, F.lit("dl")).alias("btrimmed"),
        F.bit_length(name).alias("bits"),
        F.hex(key).alias("hexkey"),
        (key % 7).alias("m7"),
        F.round(F.atan2(size, F.lit(10)), 6).alias("at2"),
        F.round(F.tan(size / 100.0), 6).alias("tn"),
        F.round(F.asin(F.least(size / 50.0, F.lit(1.0))), 6).alias("asn"),
        F.round(F.acos(F.least(size / 50.0, F.lit(1.0))), 6).alias("acs"),
    )
