"""Registered queries for the scalar-function surface (SURVEY.md §2.7),
batched into wide selects per family. Citations refer to /root/reference.

Everything here is a single scan + project — no shuffle — and stays inside
whole-stage codegen (the unaccent pandas_udf is the one Arrow hop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load
from .kernels import keep_digits, strip_leading_zeros, surrogate_key_md5, unaccent, uuid5


@register(
    "fn_string_pack",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '#([0-9]+)', 1) AS cust_num,
           regexp_replace(c_name, '#[0-9]+', '', 'g') AS name_stripped,
           regexp_replace(c_name, '[^0-9]', '', 'g') AS digits_only,
           regexp_replace(regexp_replace(c_name, '[^0-9]', '', 'g'), '^0+', '')
               AS digits_nozero,
           lower(trim(c_name)) AS name_lower,
           replace(c_mktsegment, 'BUILD', 'BLD') AS seg_replaced,
           'ocd-customer/nation:' || CAST(c_nationkey AS VARCHAR) || '/id:'
               || CAST(c_custkey AS VARCHAR) AS ocd_id,
           string_split(c_mktsegment, 'I')[1] AS seg_first_part,
           lpad(CAST(c_nationkey AS VARCHAR), 2, '0') AS nation_zfill
    FROM customer
    """,
)
def fn_string_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String kernels: regex extract/replace (bills_federal.py:43,
    vote_matching.py:31,44,103), keep-digits (bills_federal.py:21-22),
    lower/trim/lstrip0 (vote_matching.py:103,120; census_utils.py:13-14),
    f-string id minting (zip_codes.py:64, federal_house_districts.py:87-96),
    split (people_federal.py:60-64), zfill (federal_house_districts.py:126)."""
    c = load(spark, sf_dir, "customer")
    digits = keep_digits(F.col("c_name"))
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", "#([0-9]+)", 1).alias("cust_num"),
        F.regexp_replace("c_name", "#[0-9]+", "").alias("name_stripped"),
        digits.alias("digits_only"),
        strip_leading_zeros(digits).alias("digits_nozero"),
        F.lower(F.trim(F.col("c_name"))).alias("name_lower"),
        F.replace(F.col("c_mktsegment"), F.lit("BUILD"), F.lit("BLD")).alias(
            "seg_replaced"
        ),
        F.concat(
            F.lit("ocd-customer/nation:"),
            F.col("c_nationkey").cast("string"),
            F.lit("/id:"),
            F.col("c_custkey").cast("string"),
        ).alias("ocd_id"),
        F.element_at(F.split("c_mktsegment", "I"), 1).alias("seg_first_part"),
        F.lpad(F.col("c_nationkey").cast("string"), 2, "0").alias("nation_zfill"),
    )


@register(
    "fn_date_pack",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS date_str,
           coalesce(try_strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                                 '%Y-%m-%d'),
                    try_strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                                 '%Y-%m-%d %H:%M:%S')) AS parsed_ts,
           o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1998-12-31 00:00:00' AS in_range,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
                AS BIGINT) AS days_since_epoch_start,
           strftime(o_orderdate, '%Y-%m') AS month_bucket,
           o_orderdate <= TIMESTAMP '2026-01-01 00:00:00' AS before_asof
    FROM orders
    """,
)
def fn_date_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date kernels: strptime multi-format fallback (bills_state.py:35-51),
    interval containment (people_utils.py:53-54), formatting; the as-of
    comparison stands in for datetime.now() (bills_federal.py:155) with a
    pinned literal so results are reproducible."""
    o = load(spark, sf_dir, "orders")
    date_str = F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
    return o.select(
        "o_orderkey",
        date_str.alias("date_str"),
        F.coalesce(
            F.try_to_timestamp(date_str, F.lit("yyyy-MM-dd")),
            F.try_to_timestamp(date_str, F.lit("yyyy-MM-dd HH:mm:ss")),
        ).alias("parsed_ts"),
        F.col("o_orderdate")
        .between("1996-01-01 00:00:00", "1998-12-31 00:00:00")
        .alias("in_range"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("long")
        .alias("days_since_epoch_start"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month_bucket"),
        (F.col("o_orderdate") <= F.lit("2026-01-01 00:00:00").cast("timestamp")).alias(
            "before_asof"
        ),
    )


@register(
    "fn_case_try_pack",
    oracle="""
    SELECT p_partkey,
           CASE WHEN p_size < 10 THEN 'S' WHEN p_size < 25 THEN 'M'
                WHEN p_size < 40 THEN 'L' ELSE 'XL' END AS size_bucket,
           TRY_CAST(CASE WHEN p_partkey % 3 = 0
                         THEN regexp_extract(p_brand, '#([0-9]+)', 1) || 'x'
                         ELSE regexp_extract(p_brand, '#([0-9]+)', 1) END
                    AS BIGINT) AS brand_num,
           coalesce(TRY_CAST(CASE WHEN p_partkey % 3 = 0
                                  THEN regexp_extract(p_brand, '#([0-9]+)', 1) || 'x'
                                  ELSE regexp_extract(p_brand, '#([0-9]+)', 1) END
                             AS BIGINT), -1) AS brand_num_or_default
    FROM part
    """,
)
def fn_case_try_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Branchy normalization (census_utils.py:2-15, people_state.py:36-47:
    district-number edge cases), int() with ValueError fallback
    (census_utils.py:12-15) → try_cast + coalesce default."""
    p = load(spark, sf_dir, "part")
    brand_num_str = F.regexp_extract("p_brand", "#([0-9]+)", 1)
    poisoned = F.when(
        F.col("p_partkey") % 3 == 0, F.concat(brand_num_str, F.lit("x"))
    ).otherwise(brand_num_str)
    brand_num = poisoned.try_cast("long")
    return p.select(
        "p_partkey",
        F.when(F.col("p_size") < 10, "S")
        .when(F.col("p_size") < 25, "M")
        .when(F.col("p_size") < 40, "L")
        .otherwise("XL")
        .alias("size_bucket"),
        brand_num.alias("brand_num"),
        F.coalesce(brand_num, F.lit(-1)).alias("brand_num_or_default"),
    )


@register(
    "fn_json_pack",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           json_extract_string(substr('~' || props, 2), '$.k') AS pseudo_ref_k,
           CAST(to_json({'t': event_type,
                    'k': CAST(json_extract_string(props, '$.k') AS BIGINT)})
               AS VARCHAR) AS packed_json,
           ({'t': event_type,
             'k': CAST(json_extract_string(props, '$.k') AS BIGINT)}).t
               AS nested_field
    FROM events
    """,
)
def fn_json_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON kernels: embedded '~{...}' pseudo-ref parse (bills_federal.py:139,
    vote_matching.py:14-20), json extraction, to_json of a struct
    (zip_codes.py:81 geometry → text)."""
    e = load(spark, sf_dir, "events")
    k_val = F.get_json_object("props", "$.k").cast("long")
    pseudo = F.concat(F.lit("~"), F.col("props"))
    return e.select(
        "event_id",
        k_val.alias("k_val"),
        F.get_json_object(
            F.expr("substring(concat('~', props), 2, length(props))"), "$.k"
        ).alias("pseudo_ref_k"),
        F.to_json(
            F.struct(F.col("event_type").alias("t"), k_val.alias("k"))
        ).alias("packed_json"),
        # fn_struct_field: nested access (props['votes_dem'] style,
        # nytimes_precincts.py:64,72-82)
        F.struct(F.col("event_type").alias("t"), k_val.alias("k"))["t"].alias(
            "nested_field"
        ),
    )


@register(
    "fn_array_pack",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 4) AS first_coord,
           round(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum')
                 / len(embedding), 4) AS coord_mean,
           round(list_aggregate(CAST(embedding AS DOUBLE[]), 'max'), 4)
               AS coord_max,
           CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0))
                AS INTEGER) AS n_positive
    FROM embeddings
    """,
)
def fn_array_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array kernels: transform/aggregate/filter (people_federal.py:116
    list-comprehension over other_names; nytimes_precincts.py:66-70 centroid
    = coordinate mean, plain-math proxy per SURVEY §2.7 fn_math_centroid)."""
    e = load(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    total = F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(dbl, 1), 4).alias("first_coord"),
        F.round(total / F.size("embedding"), 4).alias("coord_mean"),
        F.round(F.array_max(dbl), 4).alias("coord_max"),
        F.size(F.filter(dbl, lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "fn_explode",
    oracle="""
    SELECT vec_id, CAST(i - 1 AS INTEGER) AS pos,
           round(CAST(embedding[i] AS DOUBLE), 4) AS coord
    FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
    WHERE vec_id < 50
    """,
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1 row → N rows (vote loop over vote_event['votes'],
    vote_matching.py:250-268) = posexplode over the array column."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "coord")
    ).select("vec_id", "pos", F.round(F.col("coord").cast("double"), 4).alias("coord"))


@register(
    "fn_unaccent",
    oracle="""
    SELECT c_custkey,
           strip_accents(c_name || ' éàüñç') AS name_unaccented
    FROM customer WHERE c_custkey < 100
    """,
)
def fn_unaccent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode unaccent via Arrow-vectorized pandas_udf
    (vote_matching.py:88-92); DuckDB oracle via strip_accents."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    return c.select(
        "c_custkey",
        unaccent(F.concat(F.col("c_name"), F.lit(" éàüñç"))).alias("name_unaccented"),
    )


@register(
    "fn_surrogate_key",
    oracle="""
    SELECT o_orderkey,
           md5(CAST(o_orderkey AS VARCHAR) || '_' || CAST(o_custkey AS VARCHAR))
               AS surrogate_id
    FROM orders
    """,
)
def fn_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic surrogate key minting (uuid5-style composition,
    bills_federal.py:27-36) in its oracle-checkable md5 form."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        surrogate_key_md5(
            F.col("o_orderkey").cast("string"), F.col("o_custkey").cast("string")
        ).alias("surrogate_id"),
    )


@register("fn_uuid5")
def fn_uuid5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC-exact UUIDv5 surrogate keys (bills_federal.py:28,32) as a native
    sha1-splice expression. rows-only (DuckDB 1.0 has no sha1); parity with
    python uuid.uuid5 is unit-tested in tests/test_functions.py."""
    o = load(spark, sf_dir, "orders")
    name = F.concat_ws(
        "_", F.col("o_orderkey").cast("string"), F.col("o_custkey").cast("string")
    )
    return o.select("o_orderkey", uuid5(name).alias("uuid5_id"))


@register(
    "fn_map_pack",
    oracle="""
    WITH m AS (
        SELECT n_nationkey,
               map(['nation_key', 'region_key'],
                   [CAST(n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT)])
                   AS kv
        FROM nation)
    SELECT n_nationkey,
           array_to_string(list_sort(map_keys(kv)), ',') AS keys_sorted,
           array_to_string(map_values(kv), ',') AS vals_in_order,
           CAST(cardinality(kv) AS INT) AS n_entries
    FROM m
    """,
)
def fn_map_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface (SURVEY §2.7 fn_case_when mentions
    create_map dispatch): construct a map, extract keys (sorted for
    determinism), values in insertion order, and cardinality. Maps (and
    top-level arrays) serialize engine-specifically and the driver's
    pandas canonicalizer can't hash list cells, so the comparison
    decomposes the map into deterministic comma-joined STRINGS."""
    n = load(spark, sf_dir, "nation")
    kv = F.create_map(
        F.lit("nation_key"),
        F.col("n_nationkey").cast("long"),
        F.lit("region_key"),
        F.col("n_regionkey").cast("long"),
    )
    return n.select(
        "n_nationkey",
        F.array_join(F.sort_array(F.map_keys(kv)), ",").alias("keys_sorted"),
        F.array_join(
            F.transform(F.map_values(kv), lambda v: v.cast("string")), ","
        ).alias("vals_in_order"),
        F.size(kv).cast("int").alias("n_entries"),
    )


@register(
    "fn_url_parse",
    oracle="""
    WITH urls AS (
        SELECT doc_id,
               'https://' || source || '.example.com/docs/' || lang || '/'
                   || CAST(doc_id AS VARCHAR) || '?ref=' || source AS url
        FROM documents)
    SELECT doc_id, url,
           regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS query
    FROM urls
    """,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition (the scrape-ingest kernel: the reference fetches
    census/openstates URLs, e.g. zip_codes.py / bills_federal.py source
    URLs): scheme/host/path/query. The HOST comes from Spark's native
    ``parse_url`` (JVM java.net.URI — the built-in the engine exposes);
    scheme/path/query use explicit regexes stated identically in the
    oracle, and the host hash-match proves parse_url and the regex agree
    on well-formed URLs — the cheap cross-validation that catches regex
    drift."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("lang"), F.lit("/"), F.col("doc_id").cast("string"),
        F.lit("?ref="), F.col("source"),
    )
    return d.select(
        "doc_id",
        url.alias("url"),
        F.regexp_extract(url, r"^([a-z]+)://", 1).alias("scheme"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.regexp_extract(url, r"^[a-z]+://[^/?#]+(/[^?#]*)", 1).alias("path"),
        F.regexp_extract(url, r"\?([^#]*)", 1).alias("query"),
    )


_PI = "3.141592653589793"
_EARTH_KM = "6371.0088"
#: reference point the distances are measured from (mid-Atlantic 0,0)
_GEO_BOX = (-30.0, 30.0, -60.0, 60.0)  # lat_min, lat_max, lon_min, lon_max


@register(
    "fn_geo_pack",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey,
               (c_custkey % 17000) / 100.0 - 85.0 AS lat,
               (c_custkey % 35900) / 100.0 - 179.5 AS lon
        FROM customer),
    d AS (
        SELECT c_custkey, lat, lon,
               2 * {_EARTH_KM} * asin(sqrt(
                   sin((lat * {_PI} / 180) / 2) * sin((lat * {_PI} / 180) / 2)
                   + cos(lat * {_PI} / 180) * cos(0.0)
                     * sin((lon * {_PI} / 180) / 2)
                     * sin((lon * {_PI} / 180) / 2))) AS hav_km
        FROM pts)
    SELECT c_custkey,
           floor(lat * 10000.0 + 0.5) / 10000.0 AS lat,
           floor(lon * 10000.0 + 0.5) / 10000.0 AS lon,
           floor(hav_km * 10000.0 + 0.5) / 10000.0 AS hav_km_to_origin,
           lat BETWEEN {_GEO_BOX[0]} AND {_GEO_BOX[1]}
               AND lon BETWEEN {_GEO_BOX[2]} AND {_GEO_BOX[3]} AS in_bbox
    FROM d
    """,
)
def fn_geo_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geodesic scalar kernel pack: haversine great-circle distance to the
    origin plus a bbox containment flag, over deterministic synthetic
    coordinates (2-decimal rationals from the customer key — the fixtures
    carry no geo columns; the reference's geo math lives in PostGIS,
    zip_code_overlap.py:33-38, and this is the scalar subset an engine
    without a geo extension still owes its users).

    Cross-engine note: sin/cos/asin differ between the JVM and libm by at
    most ~1 ULP; the round4 publication threshold is 10 orders of
    magnitude coarser, so hash parity holds — same argument as every
    other round4 surface in the repo. Pure per-row projection: no
    shuffle, fused into the scan."""
    c = load(spark, sf_dir, "customer")
    lat = (F.col("c_custkey") % 17000) / 100.0 - 85.0
    lon = (F.col("c_custkey") % 35900) / 100.0 - 179.5
    pts = c.select("c_custkey", lat.alias("lat"), lon.alias("lon"))
    pi = 3.141592653589793
    rlat = F.col("lat") * pi / 180
    rlon = F.col("lon") * pi / 180
    hav = (
        2
        * 6371.0088
        * F.asin(
            F.sqrt(
                F.sin(rlat / 2) * F.sin(rlat / 2)
                + F.cos(rlat) * F.cos(F.lit(0.0)) * F.sin(rlon / 2) * F.sin(rlon / 2)
            )
        )
    )
    r4 = lambda col: F.floor(col * 10000.0 + 0.5) / 10000.0  # noqa: E731
    lo_lat, hi_lat, lo_lon, hi_lon = _GEO_BOX
    return pts.select(
        "c_custkey",
        r4(F.col("lat")).alias("lat"),
        r4(F.col("lon")).alias("lon"),
        r4(hav).alias("hav_km_to_origin"),
        (
            F.col("lat").between(lo_lat, hi_lat)
            & F.col("lon").between(lo_lon, hi_lon)
        ).alias("in_bbox"),
    )


@register(
    "fn_variant_pack",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           'OBJECT<k: BIGINT>' AS props_vtype,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 5 AS seq1,
           '{"k":' || json_extract_string(props, '$.k')
               || ',"seq":[' || CAST(CAST(json_extract_string(props, '$.k')
                                          AS BIGINT) % 3 AS VARCHAR)
               || ',' || CAST(CAST(json_extract_string(props, '$.k')
                                   AS BIGINT) % 5 AS VARCHAR)
               || ']}' AS packed_variant_json
    FROM events
    """,
)
def fn_variant_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT surface (the open-format semi-structured type that
    replaces string-JSON hot paths — binary-encoded, typed access without
    re-parsing): parse_json on the props column, typed variant_get
    extraction, schema_of_variant inference (pinned against the literal
    the oracle expects — any drift in inference breaks the hash), a typed
    array element pulled out of a CONSTRUCTED variant, and the to_json
    roundtrip of that construction (field names chosen in lexicographic
    order so key-ordering conventions can't differ). DuckDB has no
    variant; its JSON functions are the semantic oracle.

    Scale: per-row kernels, shuffle-free; at 100 TB the win of variant
    over get_json_object is single-parse binary access — the same reason
    the reference keeps JSONB in Postgres (models.py:84-97) instead of
    text."""
    e = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    built = F.concat(
        F.lit('{"k":'), k.cast("string"),
        F.lit(',"seq":['), (k % 3).cast("string"),
        F.lit(","), (k % 5).cast("string"), F.lit("]}"),
    )
    bv = F.parse_json(built)
    return e.select(
        "event_id",
        k.alias("k_val"),
        F.schema_of_variant(v).alias("props_vtype"),
        F.variant_get(bv, "$.seq[1]", "bigint").alias("seq1"),
        F.to_json(bv).alias("packed_variant_json"),
    )


@register(
    "fn_recursive_cte_depth",
    oracle="""
    WITH RECURSIVE walk(doc_id, depth) AS (
        SELECT doc_id, 0 FROM documents WHERE doc_id < 2
        UNION ALL
        SELECT d.doc_id, w.depth + 1
        FROM documents d JOIN walk w ON d.doc_id // 2 = w.doc_id
        WHERE d.doc_id >= 2)
    SELECT depth, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_id,
           CAST(max(doc_id) AS BIGINT) AS max_id
    FROM walk GROUP BY depth ORDER BY depth
    """,
)
def fn_recursive_cte_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (landed in Spark 4 — the last big ANSI gap vs
    classical warehouses): walk the implicit binary-tree hierarchy
    parent(doc) = doc div 2 from the roots down, emitting per-depth
    population. The reference's division hierarchies (state → county →
    tract OCD ids, scripts/census/*) are exactly this closure shape; the
    synthetic doc-id tree keeps it oracle-checkable without new fixtures.

    Scale: each recursion level is one equi-join of the frontier against
    the (pruned) id projection — Spark executes it as iterative joins
    under one plan; depth is log2(N) for this tree, and the frontier is
    the only growing state. DuckDB runs the identical recursive form
    (// is its integer division; Spark's is div)."""
    load(spark, sf_dir, "documents").select("doc_id").createOrReplaceTempView(
        "__rec_docs__"
    )
    return spark.sql(
        """
        WITH RECURSIVE walk(doc_id, depth) AS (
            SELECT doc_id, 0 FROM __rec_docs__ WHERE doc_id < 2
            UNION ALL
            SELECT d.doc_id, w.depth + 1
            FROM __rec_docs__ d JOIN walk w ON d.doc_id div 2 = w.doc_id
            WHERE d.doc_id >= 2)
        SELECT depth, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(min(doc_id) AS BIGINT) AS min_id,
               CAST(max(doc_id) AS BIGINT) AS max_id
        FROM walk GROUP BY depth ORDER BY depth
        """
    )


@register(
    "fn_collation_group",
    oracle="""
    WITH mixed AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN upper(source)
                    WHEN doc_id % 3 = 1 THEN source
                    ELSE upper(substr(source, 1, 1)) || substr(source, 2)
               END AS source_mixed
        FROM documents)
    SELECT lower(source_mixed) AS source_ci,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(source_mixed) AS min_variant
    FROM mixed
    GROUP BY lower(source_mixed)
    ORDER BY source_ci
    """,
)
def fn_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 collations): group case-VARIANT
    source strings under UTF8_LCASE collation — the engine's native
    case-insensitive equality, not a lower() rewrite (the grouping key
    retains its original case; lower() is applied only to NAME the group
    in the output, matching the oracle's key). Binary min() picks the
    deterministic representative (uppercase variants sort first in both
    engines). Deterministic mixed-casing is synthesized per doc_id
    residue, same pattern as the URL/PII synthesizers."""
    d = load(spark, sf_dir, "documents")
    mixed = (
        F.when(F.col("doc_id") % 3 == 0, F.upper(F.col("source")))
        .when(F.col("doc_id") % 3 == 1, F.col("source"))
        .otherwise(
            F.concat(
                F.upper(F.substring(F.col("source"), 1, 1)),
                F.expr("substring(source, 2)"),
            )
        )
    )
    m = d.select(F.col("doc_id"), mixed.alias("source_mixed"))
    return (
        m.groupBy(F.collate(F.col("source_mixed"), "UTF8_LCASE").alias("k"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min(F.col("source_mixed").cast("string")).alias("min_variant"),
        )
        .select(
            F.lower(F.col("k").cast("string")).alias("source_ci"),
            "n_docs",
            "min_variant",
        )
        .orderBy("source_ci")
    )


@register(
    "fn_try_arith_pack",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
                     = 0 THEN NULL
                ELSE value / (CAST(json_extract_string(props, '$.k')
                                   AS BIGINT) % 10) END AS safe_div,
           TRY_CAST('x' || CAST(event_id % 3 AS VARCHAR) AS BIGINT)
               AS bad_cast,
           TRY_CAST(CASE WHEN event_id % 2 = 0
                         THEN CAST(event_id AS VARCHAR)
                         ELSE 'n/a' END AS BIGINT) AS half_cast,
           9223372036854775807 + CASE WHEN false THEN 1 ELSE 0 END
               AS max_long
    FROM events
    """,
)
def fn_try_arith_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error-safe arithmetic (Spark 4 runs ANSI ON by default —
    division by zero / overflow / bad casts now THROW, the warehouse
    behavior; the reference's python ETL silently wrapped or None'd):
    try_divide (NULL instead of DIVIDE_BY_ZERO), try_cast on malformed
    strings, and a constant-folded boundary value proving longs are
    exact to the last bit across engines. The mixed-validity half_cast
    column is the realistic ingest case — numeric ids arriving as text
    with sentinel garbage."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.select(
        "event_id",
        k.alias("k"),
        F.try_divide(F.col("value"), k % 10).alias("safe_div"),
        F.try_to_number(
            F.concat(F.lit("x"), (F.col("event_id") % 3).cast("string")),
            F.lit("999"),
        ).cast("long").alias("bad_cast"),
        F.when(
            F.col("event_id") % 2 == 0, F.col("event_id").cast("string")
        )
        .otherwise(F.lit("n/a"))
        .try_cast("long")
        .alias("half_cast"),
        (F.lit(9223372036854775807).cast("long")).alias("max_long"),
    )
