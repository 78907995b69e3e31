"""Scalar function surface: string / date / math / conditional / array /
JSON families, plus projection, compound filters, and null handling.

The reference's only scalar-level behavior is identity projection with
optional lowercase rename (main.py:110-127) and regex matching over
*metadata* (main.py:200,205-207); here the same predicate machinery
(like/rlike) is applied to data, plus the full function families a user
of the exported parquet needs (SURVEY.md §2 Part B "Scalar fns").

All expressions are built-in ``pyspark.sql.functions`` — JVM-side,
inside whole-stage codegen; no Python UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oracle_parquet_dumper_spark.plans.registry import dec_sum, dec_sum_sql, query
from oracle_parquet_dumper_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Projection / filter
# ---------------------------------------------------------------------------
@query(
    "proj_select_cast_alias",
    oracle="""
    SELECT o_orderkey,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
           o_orderstatus || '-' || o_orderpriority AS status_prio,
           date_trunc('day', o_orderdate) AS order_day
    FROM orders
    """,
    tags=("projection",),
)
def proj_select_cast_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with rename + cast (reference A5, main.py:110-127, as a
    data-level operation). Column-pruned scan: only 4 columns read."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.floor("o_totalprice").cast("long").alias("price_floor"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.date_trunc("day", "o_orderdate").alias("order_day"),
    )


@query(
    "filter_compound",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE (l_quantity BETWEEN 10 AND 20 AND l_discount > 0.05)
       OR (l_returnflag IN ('A', 'R') AND NOT l_linestatus = 'O')
    """,
    tags=("filter",),
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate: AND/OR/NOT/IN/BETWEEN, pushed to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_quantity").between(10, 20) & (F.col("l_discount") > 0.05))
        | (F.col("l_returnflag").isin("A", "R") & ~(F.col("l_linestatus") == "O"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@query(
    "filter_like_rlike",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_mktsegment LIKE '%BUILD%'
       OR regexp_matches(c_name, '[0-9]{2}$')
    """,
    tags=("filter", "regex"),
)
def filter_like_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE + regex predicates over data — the reference applies these only
    to table names (REGEXP_LIKE include/exclude, main.py:200,205-207)."""
    c = load_table(spark, sf_dir, "customer")
    return c.where(
        F.col("c_mktsegment").like("%BUILD%") | F.col("c_name").rlike("[0-9]{2}$")
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "null_handling",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           NULLIF(l_discount, 0.0) AS disc_or_null,
           COALESCE(NULLIF(l_discount, 0.0), -1.0) AS disc_coalesced,
           NULLIF(l_discount, 0.0) IS NULL AS is_zero_disc,
           CASE WHEN NULLIF(l_tax, 0.0) IS NOT NULL THEN 'taxed' ELSE 'untaxed' END AS tax_flag
    FROM lineitem
    WHERE l_quantity < 5
    """,
    tags=("null",),
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nullif/coalesce/isNull/nvl-style handling."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_null = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.where(F.col("l_quantity") < 5).select(
        "l_orderkey",
        "l_linenumber",
        disc_null.alias("disc_or_null"),
        F.coalesce(disc_null, F.lit(-1.0)).alias("disc_coalesced"),
        disc_null.isNull().alias("is_zero_disc"),
        F.when(F.nullif(F.col("l_tax"), F.lit(0.0)).isNotNull(), "taxed")
        .otherwise("untaxed")
        .alias("tax_flag"),
    )


# ---------------------------------------------------------------------------
# String functions
# ---------------------------------------------------------------------------
@query(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           lower(c_name) AS name_lower,
           upper(c_mktsegment) AS seg_upper,
           trim(c_name) AS name_trim,
           substring(c_name, 1, 8) AS name_prefix,
           length(c_name) AS name_len,
           concat(c_mktsegment, '#', CAST(c_custkey AS VARCHAR)) AS seg_key,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
           regexp_replace(c_name, '[0-9]', 'x', 'g') AS name_masked,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
           replace(c_mktsegment, 'A', '_') AS seg_replaced
    FROM customer
    """,
    tags=("scalar", "string"),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family (lower/upper/trim/substr/concat/length/
    regexp_extract/regexp_replace/lpad/replace)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.trim("c_name").alias("name_trim"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.concat(F.col("c_mktsegment"), F.lit("#"), F.col("c_custkey").cast("string")).alias(
            "seg_key"
        ),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.regexp_replace("c_name", "[0-9]", "x").alias("name_masked"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.replace(F.col("c_mktsegment"), F.lit("A"), F.lit("_")).alias("seg_replaced"),
    )


# ---------------------------------------------------------------------------
# Date/time functions
# ---------------------------------------------------------------------------
@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           CAST(day(o_orderdate) AS BIGINT) AS order_dom,
           CAST(hour(o_orderdate) AS BIGINT) AS order_hour,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_epoch_start,
           CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders
    """,
    tags=("scalar", "date"),
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extract parts, truncate, diff, offset, format."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_dom"),
        F.hour("o_orderdate").cast("long").alias("order_hour"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("timestamp_ntz").alias("due_date"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


# ---------------------------------------------------------------------------
# Math functions
# ---------------------------------------------------------------------------
@query(
    "fn_math",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice, 2) AS price_round,
           abs(o_totalprice - 100000.0) AS price_dev,
           CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
           CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
           sqrt(o_totalprice) AS price_sqrt,
           round(ln(o_totalprice), 6) AS price_ln,
           round(log10(o_totalprice), 6) AS price_log10,
           CAST(o_orderkey % 7 AS BIGINT) AS key_mod,
           CAST(sign(o_totalprice - 100000.0) AS DOUBLE) AS price_sign,
           power(CAST(o_orderkey % 5 AS DOUBLE), 2) AS key_sq
    FROM orders
    """,
    tags=("scalar", "math"),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. sqrt is IEEE-correctly-rounded (bit-exact across
    engines); transcendentals (ln/log10) are rounded to 6 decimals because
    libm implementations may differ in the last ulp."""
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(price, 2).alias("price_round"),
        F.abs(price - 100000.0).alias("price_dev"),
        F.floor(price).alias("price_floor"),
        F.ceil(price).alias("price_ceil"),
        F.sqrt(price).alias("price_sqrt"),
        F.round(F.log(price), 6).alias("price_ln"),
        F.round(F.log10(price), 6).alias("price_log10"),
        (F.col("o_orderkey") % 7).cast("long").alias("key_mod"),
        F.signum(price - 100000.0).alias("price_sign"),
        F.pow((F.col("o_orderkey") % 5).cast("double"), 2).alias("key_sq"),
    )


# ---------------------------------------------------------------------------
# Conditional functions
# ---------------------------------------------------------------------------
@query(
    "fn_conditional",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity >= 40 THEN 'bulk'
                WHEN l_quantity >= 10 THEN 'mid'
                ELSE 'small' END AS qty_band,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate,
           CASE l_returnflag WHEN 'A' THEN 1 WHEN 'R' THEN 2 ELSE 0 END AS flag_code
    FROM lineitem
    """,
    tags=("scalar", "conditional"),
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise chains, simple CASE, greatest/least."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") >= 40, "bulk")
        .when(F.col("l_quantity") >= 10, "mid")
        .otherwise("small")
        .alias("qty_band"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.when(F.col("l_returnflag") == "A", 1)
        .when(F.col("l_returnflag") == "R", 2)
        .otherwise(0)
        .alias("flag_code"),
    )


# ---------------------------------------------------------------------------
# Array functions (embeddings + split text)
# ---------------------------------------------------------------------------
@query(
    "fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           embedding[1] AS first_elem,
           embedding[64] AS last_elem,
           list_contains(embedding, 0.0) AS has_zero
    FROM embeddings
    """,
    tags=("scalar", "array", "multimodal"),
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over the embedding column (ArrayType(FloatType))."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).alias("first_elem"),
        F.element_at("embedding", 64).alias("last_elem"),
        F.array_contains("embedding", F.lit(0.0).cast("float")).alias("has_zero"),
    )


@query(
    "fn_explode_tokens",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents WHERE length(text) > 0)
    WHERE length(token) > 0
    GROUP BY token
    """,
    tags=("scalar", "array", "text"),
)
def fn_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode(split(text)) -> token histogram; generator + agg in one
    stage, partial-aggregated map-side before the shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.where(F.length("text") > 0)
        .select(F.explode(F.split("text", " ")).alias("token"))
        .where(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# JSON functions (events.props)
# ---------------------------------------------------------------------------
@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           json_extract_string(props, '$.missing') AS missing_val
    FROM events
    """,
    tags=("scalar", "json"),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events.props payload column
    (get_json_object + typed from_json), SURVEY.md §1.3 extension row."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
    )


@query(
    "fn_json_struct_agg",
    oracle=f"""
    SELECT event_type,
           {dec_sum_sql("CAST(json_extract_string(props, '$.k') AS BIGINT)")} AS sum_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
    tags=("scalar", "json", "agg"),
)
def fn_json_struct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json into a typed struct, then aggregate over the extracted
    field — the schema-on-read pattern for semi-structured columns."""
    from pyspark.sql import types as T

    ev = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    return (
        ev.withColumn("p", F.from_json("props", schema))
        .groupBy("event_type")
        .agg(dec_sum(F.col("p.k")).alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "fn_map",
    oracle="""
    SELECT event_id,
           map {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}['type'][1] AS type_val,
           len(map_keys(map {'type': event_type, 'uid': CAST(user_id AS VARCHAR)})) AS n_keys
    FROM events
    WHERE event_id % 50 = 0
    """,
    tags=("scalar", "map"),
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + key extraction + key enumeration.  Output is
    scalar-typed (map/array outputs compare differently across pandas
    bridges — same policy as agg_collect_sorted)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    return ev.where(F.col("event_id") % 50 == 0).select(
        "event_id",
        F.element_at(m, "type").alias("type_val"),
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
    )


@query(
    "fn_generator_sequence",
    oracle="""
    SELECT o_orderkey, unnest(generate_series(1, (o_orderkey % 4) + 1)) AS seq_val
    FROM orders
    WHERE o_orderkey % 200 = 0
    """,
    tags=("scalar", "generator"),
)
def fn_generator_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row generator: explode(sequence(...)) — the 1:N fan-out primitive
    (date spines, retry schedules, frame indexes)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 200 == 0)
    return o.select(
        "o_orderkey",
        F.explode(F.sequence(F.lit(1).cast("long"), (F.col("o_orderkey") % 4) + 1)).alias(
            "seq_val"
        ),
    )


@query(
    "fn_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, val FROM (
      SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    ) WHERE l_orderkey % 500 = 0
    """,
    tags=("scalar", "unpivot"),
)
def fn_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide measures -> long (measure, value) rows."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 500 == 0)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "measure",
        "val",
    ).withColumn(
        "measure",
        F.when(F.col("measure") == "l_quantity", "quantity")
        .when(F.col("measure") == "l_discount", "discount")
        .otherwise("tax"),
    )


@query(
    "fn_histogram_bins",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 25000) AS BIGINT) AS bin,
           COUNT(*) AS n,
           MIN(o_totalprice) AS bin_min,
           MAX(o_totalprice) AS bin_max
    FROM orders
    GROUP BY 1
    """,
    tags=("scalar", "histogram"),
)
def fn_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram by floor-binning (a one-shuffle group-by;
    the scalable histogram primitive)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.floor(F.col("o_totalprice") / 25000).cast("long").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("bin_min"),
            F.max("o_totalprice").alias("bin_max"),
        )
    )


@query(
    "fn_string_extended",
    oracle="""
    SELECT c_custkey,
           translate(c_name, 'Ce', 'Kx') AS name_translated,
           repeat(c_mktsegment, 2) AS seg_repeated,
           reverse(c_name) AS name_reversed,
           CAST(strpos(c_name, '1') AS BIGINT) AS pos_one,
           left(c_name, 4) AS name_left,
           right(c_name, 4) AS name_right,
           contains(c_name, '0') AS has_zero,
           starts_with(c_mktsegment, 'BU') AS is_bu,
           ends_with(c_mktsegment, 'RY') AS ends_ry,
           chr(65 + CAST(c_custkey % 26 AS INT)) AS letter
    FROM customer
    """,
    tags=("scalar", "string"),
)
def fn_string_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string family: translate/repeat/reverse/locate/left/right/
    contains/startswith/endswith/char."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.translate("c_name", "Ce", "Kx").alias("name_translated"),
        F.repeat("c_mktsegment", 2).alias("seg_repeated"),
        F.reverse("c_name").alias("name_reversed"),
        F.locate("1", "c_name").cast("long").alias("pos_one"),
        F.substring("c_name", 1, 4).alias("name_left"),
        F.substring(F.col("c_name"), -4, 4).alias("name_right"),
        F.contains("c_name", F.lit("0")).alias("has_zero"),
        F.startswith("c_mktsegment", F.lit("BU")).alias("is_bu"),
        F.endswith("c_mktsegment", F.lit("RY")).alias("ends_ry"),
        F.char(F.lit(65) + (F.col("c_custkey") % 26).cast("int")).alias("letter"),
    )


@query(
    "fn_null_safe_eq",
    oracle="""
    SELECT a.event_id AS ea, b.event_id AS eb
    FROM (SELECT event_id, json_extract_string(props, '$.missing') AS k
          FROM events WHERE event_id % 40 = 0 ORDER BY event_id LIMIT 200) a
    JOIN (SELECT event_id, json_extract_string(props, '$.missing') AS k
          FROM events WHERE event_id % 40 = 20 ORDER BY event_id LIMIT 200) b
      ON a.k IS NOT DISTINCT FROM b.k AND a.event_id < b.event_id
    """,
    tags=("scalar", "null", "join"),
)
def fn_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other — the semantics dropDuplicates and set ops use
    internally.

    Both sides are CAPPED at 200 rows (first event_ids, TakeOrdered):
    the probed key ($.missing) is NULL on every row, so NULL-matching
    makes this join all-pairs by construction — unbounded %40 sides
    went quadratic at sf1 (625M candidates; caught by the cross-SF
    sweep).  The cap pins cost and output at any SF, same convention as
    sim_knn_join's bounded query set."""
    ev = load_table(spark, sf_dir, "events")
    a = (
        ev.where(F.col("event_id") % 40 == 0)
        .orderBy("event_id")
        .limit(200)
        .select(
            F.col("event_id").alias("ea"),
            F.get_json_object("props", "$.missing").alias("ka"),
        )
    )
    b = (
        ev.where(F.col("event_id") % 40 == 20)
        .orderBy("event_id")
        .limit(200)
        .select(
            F.col("event_id").alias("eb"),
            F.get_json_object("props", "$.missing").alias("kb"),
        )
    )
    return (
        a.join(b, F.col("ka").eqNullSafe(F.col("kb")) & (F.col("ea") < F.col("eb")))
        .select("ea", "eb")
    )


@query(
    "agg_count_if_median",
    oracle="""
    SELECT l_returnflag,
           CAST(count_if(l_quantity > 25) AS BIGINT) AS n_bulk,
           CAST(median(l_quantity) AS DOUBLE) AS median_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_count_if_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional count + exact median (linear-interpolated, same
    definition in both engines).  ``median()`` is ``percentile(0.5)``,
    i.e. the same O(group-rows)-in-one-task buffer aggregate the
    round-7 audit rule bans — so the median comes from the value-domain
    pre-aggregation + weighted global-index order statistic
    (global_index.weighted_quantiles; l_quantity has ~50 distinct
    values), and the conditional count folds the carried weights."""
    from oracle_parquet_dumper_spark.operators.global_index import weighted_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    vc = li.groupBy("l_returnflag", "l_quantity").agg(F.count(F.lit(1)).alias("_w"))
    return weighted_quantiles(
        vc,
        "l_quantity",
        "_w",
        group_cols=["l_returnflag"],
        cont={"median_qty": 0.5},
        extra_aggs={
            "n_bulk": F.sum(
                F.when(F.col("l_quantity") > 25, F.col("_w")).otherwise(F.lit(0))
            ).cast("long")
        },
    )


@query(
    "fn_try_cast",
    oracle="""
    SELECT doc_id,
           try_cast(lang AS INTEGER) AS lang_as_int,
           try_cast(CAST(n_chars AS VARCHAR) AS BIGINT) AS chars_roundtrip,
           COALESCE(try_cast(source AS DOUBLE), -1.0) AS source_as_double
    FROM documents
    WHERE doc_id % 10 = 0
    """,
    tags=("scalar", "cast"),
)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe casts: try_cast yields NULL instead of failing the
    job — the difference between one malformed row and a dead 100 TB
    pipeline (ANSI mode makes plain CAST throw)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    return d.select(
        "doc_id",
        F.col("lang").try_cast("int").alias("lang_as_int"),
        F.col("n_chars").cast("string").try_cast("bigint").alias("chars_roundtrip"),
        F.coalesce(F.col("source").try_cast("double"), F.lit(-1.0)).alias("source_as_double"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_linenumber AS BIGINT) & 3 AS low_bits,
           CAST(l_linenumber AS BIGINT) | 8 AS with_flag,
           xor(CAST(l_linenumber AS BIGINT), CAST(l_orderkey % 16 AS BIGINT)) AS mixed,
           CAST(l_linenumber AS BIGINT) << 2 AS shifted_left,
           CAST(l_orderkey AS BIGINT) >> 3 AS shifted_right,
           ~CAST(l_linenumber AS BIGINT) AS inverted
    FROM lineitem
    WHERE l_orderkey % 250 = 0
    """,
    tags=("scalar", "bit"),
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar family (and/or/xor/shifts/not) — the bit-packing
    toolkit SimHash and bucket encodings build on."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 250 == 0)
    ln = F.col("l_linenumber").cast("long")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        ln.bitwiseAND(F.lit(3).cast("long")).alias("low_bits"),
        ln.bitwiseOR(F.lit(8).cast("long")).alias("with_flag"),
        ln.bitwiseXOR((F.col("l_orderkey") % 16).cast("long")).alias("mixed"),
        F.shiftleft(ln, 2).alias("shifted_left"),
        F.shiftright(F.col("l_orderkey").cast("long"), 3).alias("shifted_right"),
        F.bitwise_not(ln).alias("inverted"),
    )


@query(
    "fn_interval_arith",
    oracle="""
    SELECT event_id,
           CAST(ts AS TIMESTAMP) + INTERVAL '3 days' AS plus_days,
           CAST(ts AS TIMESTAMP) - INTERVAL '90 minutes' AS minus_minutes,
           CAST(ts AS TIMESTAMP) + INTERVAL '1 hour' * CAST(user_id % 5 AS INT) AS plus_scaled
    FROM events
    WHERE event_id % 100 = 0
    """,
    tags=("scalar", "date", "interval"),
)
def fn_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic on timestamps, including a column-scaled
    interval (the reference excludes INTERVAL columns entirely,
    main.py:97; interval *expressions* are still first-class here)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") % 100 == 0)
    return ev.select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 3 DAYS")).alias("plus_days"),
        (F.col("ts") - F.expr("INTERVAL 90 MINUTES")).alias("minus_minutes"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR") * (F.col("user_id") % 5).cast("int")).alias(
            "plus_scaled"
        ),
    )


@query(
    "fn_posexplode_outer",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN length(text) = 0 THEN NULL
                  ELSE list_filter(string_split(text, ' '), t -> length(t) > 0) END AS toks
      FROM documents WHERE doc_id % 25 = 0
    )
    SELECT doc_id,
           CAST(generate_subscripts(toks, 1) - 1 AS INT) AS pos,
           unnest(toks) AS token
    FROM base WHERE toks IS NOT NULL
    UNION ALL
    SELECT doc_id, NULL, NULL FROM base WHERE toks IS NULL
    """,
    tags=("scalar", "generator"),
)
def fn_posexplode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode_outer: position-indexed fan-out that PRESERVES rows
    with null/empty arrays (explode would drop them) — the left-outer
    variant every fan-out pipeline needs for accounting."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 25 == 0)
    toks = F.when(
        F.length("text") > 0,
        F.filter(F.split(F.col("text"), " "), lambda t: F.length(t) > 0),
    )
    return d.select("doc_id", toks.alias("toks")).select(
        "doc_id", F.posexplode_outer("toks").alias("pos", "token")
    )


@query(
    "fn_array_extended",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> length(x) > 0) AS toks
      FROM documents WHERE doc_id % 25 = 0 AND length(text) > 0
    )
    SELECT doc_id,
           CAST(list_position(toks, 'the') AS BIGINT) AS pos_the,
           array_to_string(toks[1:3], '|') AS head3,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique,
           CAST(len(list_concat(toks[1:2], toks[2:3])) AS BIGINT) AS n_concat,
           list_contains(toks, 'spark') AS has_spark,
           array_to_string(list_sort(list_distinct(toks[1:4])), ',') AS sorted_head
    FROM t
    """,
    tags=("scalar", "array"),
)
def fn_array_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended array family: position/slice/distinct/concat/contains/
    sort — scalar-safe outputs (strings/sizes) per the representation
    policy."""
    d = load_table(spark, sf_dir, "documents").where(
        (F.col("doc_id") % 25 == 0) & (F.length("text") > 0)
    )
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: F.length(x) > 0)
    t = d.select("doc_id", toks.alias("toks"))
    return t.select(
        "doc_id",
        F.array_position("toks", "the").cast("long").alias("pos_the"),
        F.concat_ws("|", F.slice("toks", 1, 3)).alias("head3"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_unique"),
        F.size(F.concat(F.slice("toks", 1, 2), F.slice("toks", 2, 2))).cast("long").alias("n_concat"),
        F.array_contains("toks", "spark").alias("has_spark"),
        F.concat_ws(",", F.sort_array(F.array_distinct(F.slice("toks", 1, 4)))).alias("sorted_head"),
    )


@query(
    "fn_json_tuple",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           json_extract_string(props, '$.absent') AS absent_str
    FROM events WHERE event_id % 30 = 0
    """,
    tags=("scalar", "json"),
)
def fn_json_tuple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_tuple: multi-field JSON extraction in one generator pass
    (one parse per row for N fields, vs N parses with get_json_object)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") % 30 == 0)
    return ev.select(
        "event_id", F.json_tuple("props", "k", "absent").alias("k_str", "absent_str")
    )


@query(
    "fn_regexp_family",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([A-Za-z]{7,})', 1) AS first_long_word,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_digit_runs,
           regexp_matches(text, '\\?') AS has_question,
           regexp_replace(text, '[0-9]+', '#', 'g') AS digits_masked
    FROM documents
    WHERE doc_id % 7 = 0
    """,
    tags=("fn", "regexp"),
    bench=True,
)
def fn_regexp_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp function family: first-match capture-group extraction,
    match counting, boolean match, and global replacement.  All four are
    codegen'd JVM regex ops — the filter/extract primitives a curation
    pipeline leans on before reaching for a UDF.  Both engines return ''
    (not NULL) for a no-match extract, so the comparison is exact."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 7 == 0)
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([A-Za-z]{7,})", 1).alias("first_long_word"),
        F.size(F.regexp_extract_all("text", F.lit(r"[0-9]+"), 0))
        .cast("long")
        .alias("n_digit_runs"),
        F.col("text").rlike(r"\?").alias("has_question"),
        F.regexp_replace("text", r"[0-9]+", "#").alias("digits_masked"),
    )


@query(
    "fn_variant_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
           json_type(json(props)) = 'OBJECT' AS is_object
    FROM events WHERE event_id % 11 = 0
    """,
    tags=("scalar", "json", "variant"),
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT ingestion (Spark 4): ``parse_json`` once into the binary
    variant encoding, then typed ``variant_get`` path reads.  Against
    ``get_json_object`` (fn_json), which re-parses the JSON string per
    extraction, a variant column parses ONCE and every subsequent path
    read is a cheap binary traversal — the right storage shape when a
    props payload is read by many queries (parse at ingest, store
    VARIANT in parquet, prune paths at scan).  The DuckDB twin uses its
    native JSON type the same way."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") % 11 == 0)
    v = ev.select("event_id", F.parse_json("props").alias("v"))
    return v.select(
        "event_id",
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k_val"),
        (F.expr("variant_get(v, '$.k', 'bigint')") % 10).alias("k_mod"),
        F.expr("schema_of_variant(v)").startswith("OBJECT").alias("is_object"),
    )


@query(
    "fn_url_extract",
    oracle=r"""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.org/docs/' || CAST(doc_id AS VARCHAR)
               || '?lang=' || lang AS url
      FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '\?([^#]*)', 1) AS query,
           regexp_extract(url, '^[a-z]+://(?:[^/?#.]+\.)*([^/?#.]+\.[^/?#.]+)', 1)
             AS registered_domain
    FROM u
    """,
    tags=("scalar", "string", "text"),
)
def fn_url_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with plain regexes — host, path, query string,
    and the registered (last-two-label) domain, the key a crawl
    curation pipeline groups by for per-site quality and rate policy.
    Deliberately NOT Spark's parse_url: the same two regex engines
    (Java regex / RE2) agree on these anchored patterns, while
    parse_url's edge-case behavior has no DuckDB twin.  URLs are
    synthesized from the documents table so the op is fixture-pure."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return d.select(
        "doc_id",
        url.alias("url"),
        F.regexp_extract(url, r"^[a-z]+://([^/?#]+)", 1).alias("host"),
        F.regexp_extract(url, r"^[a-z]+://[^/?#]+([^?#]*)", 1).alias("path"),
        F.regexp_extract(url, r"\?([^#]*)", 1).alias("query"),
        F.regexp_extract(
            url, r"^[a-z]+://(?:[^/?#.]+\.)*([^/?#.]+\.[^/?#.]+)", 1
        ).alias("registered_domain"),
    )


# ---------------------------------------------------------------------------
# Calendar arithmetic: months_between / add_months / last_day (round 12)
# ---------------------------------------------------------------------------
@query(
    "fn_date_calendar",
    oracle="""
    SELECT o_orderkey,
           ROUND((1998 - year(o_orderdate)) * 12 + (12 - month(o_orderdate))
                 + CASE WHEN day(o_orderdate) = 1 THEN 0.0
                        ELSE (1 - day(o_orderdate)) / 31.0 END, 8) AS mb_anchor,
           CAST((1998 - year(o_orderdate)) * 12 + (12 - month(o_orderdate))
                AS DOUBLE) AS mb_monthstart,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3m,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(day(last_day(CAST(o_orderdate AS DATE))) AS BIGINT) AS days_in_month,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                          last_day(CAST(o_orderdate AS DATE))) AS BIGINT)
             AS days_to_month_end,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS TIMESTAMP)
             AS quarter_start,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow_sun1
    FROM orders
    """,
    tags=("scalar", "date"),
)
def fn_date_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic — the one SURVEY §2B scalar example that had
    no dedicated query (VERDICT r11 #6): ``months_between`` with its
    day-of-month fraction rule, ``add_months`` end-of-month clamping,
    ``last_day``, quarter truncation, and day-of-week.

    months_between portability: DuckDB has no months_between, so the
    oracle reimplements Spark's published formula (month delta, plus
    (day1-day2)/31 unless the days match or both dates are month-ends;
    the anchor 1998-12-01 is day 1 and never a month-end, so only the
    day(d)=1 branch applies) and rounds to 8 decimals exactly as
    Spark's roundOff=true does.  The fraction k/31 never lands on an
    8-decimal rounding tie (that would need the double to BE a 9-digit
    decimal), so HALF_UP-vs-binary rounding differences cannot appear.
    mb_monthstart pins the day-equality branch: months_between against
    trunc(month) has day 1 = day 1, an exact integer double.

    Day-of-week convention: Spark dayofweek is 1=Sunday..7, DuckDB's is
    0=Sunday..6 — the oracle shifts by +1 (same boundary-convention
    class as the documented date_diff note in SCALING.md).

    Scale shape: pure per-row projection — one scan, zero shuffles,
    whole-stage codegen end to end."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    anchor = F.lit("1998-12-01").cast("date")
    return o.select(
        "o_orderkey",
        F.months_between(anchor, d).alias("mb_anchor"),
        F.months_between(anchor, F.trunc(d, "month")).alias("mb_monthstart"),
        F.add_months(d, 3).cast("timestamp_ntz").alias("plus_3m"),
        F.last_day(d).cast("timestamp_ntz").alias("month_end"),
        F.dayofmonth(F.last_day(d)).cast("long").alias("days_in_month"),
        F.datediff(F.last_day(d), d).cast("long").alias("days_to_month_end"),
        F.quarter(d).cast("long").alias("qtr"),
        F.trunc(d, "quarter").cast("timestamp_ntz").alias("quarter_start"),
        F.dayofweek(d).cast("long").alias("dow_sun1"),
    )
