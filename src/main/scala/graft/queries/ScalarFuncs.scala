package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar function families (SURVEY.md §2 Part B "Scalar functions").
  * All expressions are Spark built-ins → whole-stage-codegen'd; no UDFs in
  * this module. Each family gets one multi-column query so pushdown/pruning
  * behavior is visible per family in the plan.
  *
  * Dialect notes (Spark vs DuckDB oracle):
  *  - Spark `year()` → INT, DuckDB → BIGINT: oracle casts to INT.
  *  - Spark `floor()` → BIGINT, DuckDB → DOUBLE: oracle casts to BIGINT.
  *  - natural log is `ln` in both (DuckDB `log` is log10 — avoided).
  *  - Spark `md5`/`sha2` take binary (string implicitly cast); DuckDB
  *    `md5`/`sha256` take VARCHAR. Same hex output.
  */
object ScalarFuncs extends QueryModule {

  private val qString = Q(
    "q_str_funcs",
    (s, d) => Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(substring(col("p_name"), 1, 6)).as("up6"),
        lower(col("p_brand")).as("lo_brand"),
        length(col("p_name")).cast("long").as("name_len"), // BIGINT like the oracle
        lpad(col("p_partkey").cast("string"), 8, "0").as("padded"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_extract(col("p_brand"), "#(\\d+)", 1).as("brand_num"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        trim(concat(lit("  "), col("p_type"), lit("  "))).as("trimmed"),
        split(col("p_name"), " ").getItem(0).as("first_word"))
      .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey,
             upper(substring(p_name, 1, 6)) AS up6,
             lower(p_brand) AS lo_brand,
             length(p_name) AS name_len,
             lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
             concat_ws('|', p_brand, p_type) AS brand_type,
             regexp_extract(p_brand, '#(\d+)', 1) AS brand_num,
             regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
             trim('  ' || p_type || '  ') AS trimmed,
             string_split(p_name, ' ')[1] AS first_word
           FROM part ORDER BY p_partkey"""))

  private val qDate = Q(
    "q_date_funcs",
    (s, d) => Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate"), lit("1997-01-01").cast("date")).cast("long").as("days_since"),
        (col("o_orderdate") + expr("INTERVAL 5 DAYS")).as("plus5"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey,
             CAST(year(o_orderdate) AS INT) AS yr,
             CAST(month(o_orderdate) AS INT) AS mo,
             CAST(day(o_orderdate) AS INT) AS dom,
             CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
             date_diff('day', DATE '1997-01-01', CAST(o_orderdate AS DATE)) AS days_since,
             o_orderdate + INTERVAL 5 DAY AS plus5,
             CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
           FROM orders ORDER BY o_orderkey"""))

  private val qMath = Q(
    "q_math_funcs",
    (s, d) => Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 1).as("r1"),
        floor(col("l_extendedprice")).as("flr"),
        ceil(col("l_extendedprice")).as("cl"),
        round(abs(col("l_discount") - lit(0.05)), 10).as("absdiff"),
        round(pow(col("l_quantity"), 2), 4).as("qty_sq"),
        round(expr("ln(l_extendedprice)"), 6).as("ln_price"),
        round(sqrt(col("l_quantity")), 6).as("sqrt_qty"),
        pmod(col("l_orderkey"), lit(7)).as("mod7"))
      // r1 + absdiff make the sort TOTAL up to full-duplicate rows:
      // duplicate (orderkey, linenumber) keys exist in the fixture, and
      // a value-bearing tie left unsorted diverged between engines the
      // first time a scaled fixture reshuffled input order (SCALE.md
      // §sf1-oracle). The remaining cols are functions of the sorted
      // ones (price, quantity, discount, orderkey), so no freedom is left.
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("r1"),
        col("absdiff"), col("qty_sq")),
    Some("""SELECT l_orderkey, l_linenumber,
             round(l_extendedprice, 1) AS r1,
             CAST(floor(l_extendedprice) AS BIGINT) AS flr,
             CAST(ceil(l_extendedprice) AS BIGINT) AS cl,
             round(abs(l_discount - 0.05), 10) AS absdiff,
             round(pow(l_quantity, 2), 4) AS qty_sq,
             round(ln(l_extendedprice), 6) AS ln_price,
             round(sqrt(l_quantity), 6) AS sqrt_qty,
             l_orderkey % 7 AS mod7
           FROM lineitem
           ORDER BY l_orderkey, l_linenumber, r1, absdiff, qty_sq"""))

  private val qCond = Q(
    "q_cond_funcs",
    (s, d) => Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 200000, "HIGH")
          .when(col("o_totalprice") > 100000, "MID")
          .otherwise("LOW").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("NOT_P")).as("np"),
        greatest(col("o_totalprice"), lit(50000d)).cast("double").as("floor50k"),
        least(col("o_totalprice"), lit(250000d)).cast("double").as("cap250k"))
      .withColumn("floor50k", round(col("floor50k"), 2))
      .withColumn("cap250k", round(col("cap250k"), 2))
      .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey,
             CASE WHEN o_totalprice > 200000 THEN 'HIGH'
                  WHEN o_totalprice > 100000 THEN 'MID'
                  ELSE 'LOW' END AS bucket,
             coalesce(nullif(o_orderstatus, 'P'), 'NOT_P') AS np,
             round(greatest(o_totalprice, 50000), 2) AS floor50k,
             round(least(o_totalprice, 250000), 2) AS cap250k
           FROM orders ORDER BY o_orderkey"""))

  // A9's digest semantics as column expressions (md5 of payload bytes).
  private val qHash = Q(
    "q_hash_funcs",
    (s, d) => Tables.part(s, d)
      .select(
        col("p_partkey"),
        md5(col("p_name").cast("binary")).as("md5_name"),
        sha2(col("p_name").cast("binary"), 256).as("sha256_name"))
      .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey, md5(p_name) AS md5_name,
             sha256(p_name) AS sha256_name
           FROM part ORDER BY p_partkey"""))

  // Spark murmur3 `hash`/`xxhash64`/`crc32` have no DuckDB equivalent —
  // pinned by spec (determinism + known-vector tests) instead.
  private val qHashSparkOnly = Q(
    "q_hash_spark_native",
    (s, d) => Tables.part(s, d)
      .select(
        col("p_partkey"),
        hash(col("p_name")).as("murmur3"),
        xxhash64(col("p_name")).as("xx64"),
        crc32(col("p_name").cast("binary")).as("crc"))
      .orderBy(col("p_partkey")))

  // Array functions over the embeddings fixture (ArrayType(FloatType), dim
  // 64). Element access / fold / zip — the primitives the vector ops build
  // on. Sums are computed in DOUBLE with an explicit left fold so the
  // summation order matches DuckDB's list_sum over a DOUBLE[] cast.
  private val qArray = Q(
    "q_array_funcs",
    (s, d) => Tables.embeddings(s, d)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("first_el"),
        round(expr(
          "aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE))"), 4)
          .as("vec_sum"),
        round(expr(
          "aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"), 4)
          .as("vec_norm_sq"),
        round(array_max(col("embedding")).cast("double"), 6).as("max_el"),
        round(array_min(col("embedding")).cast("double"), 6).as("min_el"))
      .orderBy(col("vec_id")),
    Some("""SELECT vec_id,
             CAST(len(embedding) AS INT) AS dim,
             round(CAST(embedding[1] AS DOUBLE), 6) AS first_el,
             round(list_sum(CAST(embedding AS DOUBLE[])), 4) AS vec_sum,
             round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)), 4) AS vec_norm_sq,
             round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_el,
             round(CAST(list_min(embedding) AS DOUBLE), 6) AS min_el
           FROM embeddings ORDER BY vec_id"""))

  // Array membership / sorting / dedup / rendering over token arrays.
  private val qArrayOps = Q(
    "q_array_ops",
    (s, d) => Tables.part(s, d)
      .withColumn("words", split(col("p_name"), " "))
      .select(
        col("p_partkey"),
        array_contains(col("words"), "cold").as("has_cold"),
        size(array_distinct(col("words"))).as("n_uniq"),
        concat_ws(",", array_sort(col("words"))).as("sorted_words"),
        element_at(col("words"), -1).as("last_word"))
      .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey,
             list_contains(string_split(p_name, ' '), 'cold') AS has_cold,
             CAST(len(list_distinct(string_split(p_name, ' '))) AS INT) AS n_uniq,
             array_to_string(list_sort(string_split(p_name, ' ')), ',') AS sorted_words,
             string_split(p_name, ' ')[-1] AS last_word
           FROM part ORDER BY p_partkey"""))

  // Generator / explode: posexplode with deterministic (vec_id, pos) key.
  private val qExplode = Q(
    "q_explode",
    (s, d) => Tables.embeddings(s, d)
      .filter(col("vec_id") < 20)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "el")))
      .select(col("vec_id"), (col("pos") + 1).as("pos"),
        round(col("el").cast("double"), 6).as("el"))
      .orderBy(col("vec_id"), col("pos")),
    Some("""SELECT vec_id, CAST(i AS INT) AS pos,
             round(CAST(embedding[i] AS DOUBLE), 6) AS el
           FROM embeddings, generate_series(1, 64) AS t(i)
           WHERE vec_id < 20 AND i <= len(embedding)
           ORDER BY vec_id, pos"""))

  // JSON access over events.props (a JSON string like {"k": 87}).
  private val qJson = Q(
    "q_json_funcs",
    (s, d) => Tables.events(s, d)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("long").as("k_num"))
      .orderBy(col("event_id")),
    Some("""SELECT event_id,
             json_extract_string(props, '$.k') AS k_str,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
           FROM events ORDER BY event_id"""))

  // A15's speed projection: "%.2f MB/s" with the N/A guard, re-expressed
  // over order data (bytes := o_totalprice, ms := o_orderkey%5000).
  private val qSpeedFormat = Q(
    "q_speed_format",
    (s, d) => Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        (col("o_orderkey") % 5000).as("ms"),
        when((col("o_orderkey") % 5000) <= 0 || col("o_totalprice") <= 0, "N/A")
          // round(...,2) BEFORE formatting: Java "%.2f" rounds ties HALF_UP
          // while DuckDB printf rounds half-even — a dyadic speed value
          // landing exactly on a thousandths tie would format differently.
          // A pre-rounded 2-decimal double can't sit on a format-time tie.
          .otherwise(format_string("%.2f MB/s",
            round(col("o_totalprice") / lit(1048576.0) / ((col("o_orderkey") % 5000) / lit(1000.0)), 2)))
          .as("speed"))
      .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey, o_orderkey % 5000 AS ms,
             CASE WHEN o_orderkey % 5000 <= 0 OR o_totalprice <= 0 THEN 'N/A'
                  ELSE printf('%.2f MB/s',
                    round(o_totalprice / 1048576.0 / ((o_orderkey % 5000) / 1000.0), 2))
             END AS speed
           FROM orders ORDER BY o_orderkey"""))

  override def queries: Seq[Q] = Seq(
    qString, qDate, qMath, qCond, qHash, qHashSparkOnly,
    qArray, qArrayOps, qExplode, qJson, qSpeedFormat)
}
