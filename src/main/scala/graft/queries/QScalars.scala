package graft.queries

import graft.Tables
import graft.ops.Scalars
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Demo queries + DuckDB oracles for SURVEY.md §2.D (scalar functions)
  * and §2.H/H3 (generator/tokenize).
  *
  * Date/number hygiene: Java patterns on the Spark side map to strftime
  * on the DuckDB side; `round` is only applied to computed irrationals
  * (sqrt/pow results) where a decimal-boundary tie cannot occur —
  * rounding a 2-decimal price at .5 boundaries differs between Spark
  * (string-based HALF_UP) and DuckDB (binary) and is avoided.
  */
object QScalars {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // D1 — regexp_extract, both group positions, plus the reference's
    // parenthesized-description shape (`Processing Data.py:156`) built
    // over part columns.
    "q_regexp_extract" -> ((s, dir) => {
      Tables(s, dir).orders
        .select(col("o_orderkey"),
          regexp_extract(col("o_orderpriority"), "^([0-9]+)-(.*)$", 1).as("prio_num"),
          regexp_extract(col("o_orderpriority"), "^([0-9]+)-(.*)$", 2).as("prio_name"))
    }),
    "q_regexp_paren" -> ((s, dir) => {
      Tables(s, dir).part
        .select(col("p_partkey"),
          Scalars.extractParenthesized(concat(col("p_name"), lit(" ("), col("p_brand"), lit(")")))
            .as("description"))
    }),

    // B2/D12 — derived-column chain (`Ingestion Data (XML).py:141-148`,
    // `Ingestion Data (MySQL).py:171-173` shape): withColumn stack of a
    // partition stamp, a literal, a substring code, and integer maths.
    "q_derive_columns" -> ((s, dir) => {
      Tables(s, dir).orders
        .withColumn("ds", Scalars.dsOf(col("o_orderdate")))
        .withColumn("source", lit("orders"))
        .withColumn("priority_code", substring(col("o_orderpriority"), 1, 1))
        .withColumn("total_cents", Scalars.asCounter(col("o_totalprice") * 100).cast("bigint"))
        .select("o_orderkey", "ds", "source", "priority_code", "total_cents")
    }),

    // D2 — substring_index / split_part.
    "q_substring_index" -> ((s, dir) => {
      Tables(s, dir).part
        .select(col("p_partkey"),
          Scalars.beforeFirst(col("p_name"), " ").as("first_word"),
          substring_index(col("p_name"), " ", -1).as("last_word"))
    }),

    // D3 — concat with literal separators (`Processing Data.py:160`).
    "q_concat" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.nation.join(t.region, col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"),
          Scalars.dashConcat(col("r_name"), col("n_name")).as("display_key"),
          concat(col("n_name"), lit("/"), col("r_name")).as("slash_key"))
    }),

    // D4 — fixed-position date parts of dd-MM-yyyy HH:mm:ss
    // (`Ingestion Data (XML).py:143-148`).
    "q_substring_parts" -> ((s, dir) => {
      val base = Tables(s, dir).orders
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "dd-MM-yyyy HH:mm:ss").as("waktu"))
      Scalars.datePartsOfDmy(col("waktu"))
        .foldLeft(base) { case (df, (name, c)) => df.withColumn(name, c) }
    }),

    // D5 — epoch seconds roundtrip (`Ingestion Data (XML).py:142`,
    // `Processing Data.py:171`): ts -> epoch -> formatted string.
    "q_epoch_roundtrip" -> ((s, dir) => {
      Tables(s, dir).events
        .select(col("event_id"),
          expr("ts_ns DIV 1000000000").as("epoch_sec"),
          from_unixtime(expr("ts_ns DIV 1000000000"), "yyyy-MM-dd HH:mm:ss").as("ts_str"))
    }),

    // D6/D8 — date_format dialects + to_date truncation.
    "q_date_format" -> ((s, dir) => {
      Tables(s, dir).orders
        .select(col("o_orderkey"),
          Scalars.dsOf(col("o_orderdate")).as("ds"),
          date_format(col("o_orderdate"), "yyyy-MM").as("order_month"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"))
    }),

    // D7 — to_timestamp parse of an ISO string (exotic ctime patterns
    // stay in unit tests per SURVEY §7.5/1).
    "q_to_timestamp" -> ((s, dir) => {
      Tables(s, dir).orders
        .select(col("o_orderkey"),
          date_format(
            to_timestamp(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"), "yyyy-MM-dd HH:mm:ss"),
            "yyyy-MM-dd HH:mm:ss").as("roundtrip"))
    }),

    // D9 — the +7h UTC->WIB shift (`Processing Data.py:209`).
    "q_interval_shift" -> ((s, dir) => {
      Tables(s, dir).orders
        .select(col("o_orderkey"),
          date_format(Scalars.shiftToWib(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("waktu_wib"))
    }),

    // D10 — Decimal(20,0) uint64-safe cast (`Ingestion Data
    // (MySQL).py:171`); output as bigint for stable cross-engine compare.
    "q_cast_decimal" -> ((s, dir) => {
      Tables(s, dir).orders
        .select(col("o_orderkey"),
          Scalars.asCounter(col("o_totalprice") * 100).cast("bigint").as("price_cents"))
    }),

    // D11 — column arithmetic incl. the reference's epoch+25200
    // (`Ingestion Data (MySQL).py:173`).
    "q_arith" -> ((s, dir) => {
      Tables(s, dir).events
        .select(col("event_id"),
          (expr("ts_ns DIV 1000000000") + lit(25200L)).as("epoch_wib"),
          (col("value") * lit(2) - lit(1)).as("scaled"))
    }),

    // D13 — math functions; round only on irrational results where
    // decimal-tie boundaries cannot occur.
    "q_math_funcs" -> ((s, dir) => {
      Tables(s, dir).lineitem
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          abs(col("l_quantity") - lit(25)).as("abs_dev"),
          ceil(col("l_extendedprice")).cast("double").as("price_ceil"),
          floor(col("l_extendedprice")).cast("double").as("price_floor"),
          round(sqrt(col("l_quantity")), 4).as("qty_sqrt"),
          round(pow(col("l_discount") + lit(1), 2), 6).as("disc_pow"))
    }),

    // D13 — string functions.
    "q_string_funcs" -> ((s, dir) => {
      Tables(s, dir).part
        .select(col("p_partkey"),
          lower(col("p_type")).as("type_lower"),
          upper(col("p_name")).as("name_upper"),
          trim(lit("  padded  ")).as("trimmed"),
          lpad(col("p_partkey").cast("string"), 8, "0").as("key_padded"),
          length(col("p_name")).cast("bigint").as("name_len"),
          regexp_replace(col("p_name"), " ", "_").as("name_snake"),
          size(split(col("p_name"), " ")).cast("bigint").as("n_words"))
    }),

    // D1-ext — regexp_extract_all: every match, joined to a stable
    // string (array column compare avoided by design).
    "q_regexp_extract_all" -> ((s, dir) => {
      Tables(s, dir).part
        .select(col("p_partkey"),
          concat_ws("|", expr("regexp_extract_all(p_name, '[a-z]+', 0)")).as("words"),
          concat_ws("|", expr("regexp_extract_all(p_brand, '[0-9]+', 0)")).as("brand_nums"))
    }),

    // D13-ext — binary encodings + char functions: hex/base64 of UTF-8
    // bytes, ascii/chr/repeat — the byte-level vocabulary.
    "q_encode_funcs" -> ((s, dir) => {
      Tables(s, dir).part
        .filter(col("p_partkey") < 500)
        .select(col("p_partkey"),
          hex(col("p_brand").cast("binary")).as("brand_hex"),
          base64(col("p_brand").cast("binary")).as("brand_b64"),
          ascii(col("p_name")).cast("bigint").as("first_char_code"),
          concat(lit("x"), repeat(lit("ab"), 3)).as("repeated"))
    }),

    // D6-ext — calendar part functions (vs the substring date parts
    // the reference uses): year/quarter/month/day/ISO week/day-of-year.
    "q_date_parts_fn" -> ((s, dir) => {
      Tables(s, dir).orders
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("bigint").as("y"),
          quarter(col("o_orderdate")).cast("bigint").as("q"),
          month(col("o_orderdate")).cast("bigint").as("m"),
          dayofmonth(col("o_orderdate")).cast("bigint").as("d"),
          weekofyear(col("o_orderdate")).cast("bigint").as("iso_week"),
          dayofyear(col("o_orderdate")).cast("bigint").as("doy"))
    }),

    // E-ext — DISTINCT ordered string aggregation: sorted collect_set
    // joined — deterministic at any parallelism (plain collect_list
    // order is partition-dependent, which is why it is banned here).
    "q_listagg_distinct" -> ((s, dir) => {
      Tables(s, dir).orders
        .groupBy(col("o_orderpriority"))
        .agg(array_join(sort_array(collect_set(col("o_orderstatus"))), ",").as("statuses"),
          countDistinct(col("o_orderstatus")).as("n_statuses"))
    }),

    // D13-ext — scalar bit ops + greatest/least: exact integer
    // arithmetic, the flag-mask vocabulary.
    "q_scalar_bits" -> ((s, dir) => {
      Tables(s, dir).orders
        .filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          shiftleft(col("o_custkey"), 2).as("shl"),
          shiftright(col("o_custkey"), 1).as("shr"),
          (col("o_orderkey").bitwiseAND(lit(255L))).as("band"),
          (col("o_orderkey").bitwiseOR(lit(4096L))).as("bor"),
          (col("o_orderkey").bitwiseXOR(col("o_custkey"))).as("bxor"),
          greatest(col("o_orderkey"), col("o_custkey")).as("gst"),
          least(col("o_orderkey"), col("o_custkey")).as("lst"))
    }),

    // H3-ext — null-preserving generator (explode_outer): rows whose
    // array is empty survive with a null element instead of vanishing
    // — the difference between "no tags" and "row lost" downstream.
    "q_explode_outer" -> ((s, dir) => {
      val tags = when(col("o_orderkey") % 10 === 0, array().cast("array<string>"))
        .otherwise(array(col("o_orderstatus"), col("o_orderpriority")))
      Tables(s, dir).orders
        .filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"), explode_outer(tags).as("tag"))
    }),

    // D13-ext — Levenshtein edit distance (the near-dup text measure
    // built-ins provide; identical DP definition in DuckDB).
    "q_levenshtein" -> ((s, dir) => {
      Tables(s, dir).part
        .select(col("p_partkey"),
          levenshtein(col("p_name"), col("p_type")).cast("bigint").as("name_type_dist"),
          levenshtein(col("p_brand"), lit("Brand#1")).cast("bigint").as("brand_dist"))
    }),

    // D-ext — ANSI-safe casts: Spark 4 runs ANSI mode (bad casts
    // THROW), so ingestion edges use try_cast to get typed nulls for
    // malformed values instead of job failure.
    "q_try_cast" -> ((s, dir) => {
      val maybeNum = when(col("o_orderkey") % 3 === 0, concat(lit("x"), col("o_orderstatus")))
        .otherwise(col("o_orderkey").cast("string"))
      Tables(s, dir).orders
        .filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          try_to_number(maybeNum, lit("999999999")).cast("bigint").as("parsed"),
          expr("try_cast(o_orderstatus AS BIGINT)").as("status_num"))
    }),

    // D1-ext — regexp_replace with capture-group backreferences
    // (rewrite, not just strip): swap the two halves of the priority
    // code.
    "q_regexp_backref" -> ((s, dir) => {
      Tables(s, dir).orders
        .filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          regexp_replace(col("o_orderpriority"), "^([0-9]+)-(.*)$", "$2/$1").as("swapped"))
    }),

    // D14 — JSON access on events.props (north-star text analysis).
    "q_json_extract" -> ((s, dir) => {
      Tables(s, dir).events
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k_value"))
    }),

    // D14-ext — VARIANT (Spark 4's semi-structured type): parse once
    // into the binary variant encoding, then typed path access. Same
    // answer as the string-probe get_json_object road, different
    // engine path (shredded access instead of per-row re-parse) —
    // the open-format semi-structured story at scale.
    "q_variant_json" -> ((s, dir) => {
      Tables(s, dir).events
        .select(col("event_id"),
          expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k_value"))
    }),

    // D14-ext — schema-bound JSON parse (`from_json` with an explicit
    // StructType) vs the path-probe above: one parse per row yields a
    // typed struct Catalyst can prune and push through — the right
    // shape when several fields are read, and parse failures surface
    // as typed nulls instead of silent string defaults.
    "q_json_struct" -> ((s, dir) => {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType)))
      Tables(s, dir).events
        .select(col("event_id"), from_json(col("props"), schema).as("j"))
        .select(col("event_id"), col("j.k").as("k_value"),
          col("j").isNotNull.as("parsed_ok"))
    }),

    // D15 — array/higher-order functions over embeddings.embedding.
    // Floats widen to double (exact) before any arithmetic; the sum is
    // an exact decimal fold so partition order cannot matter.
    "q_array_funcs" -> ((s, dir) => {
      Tables(s, dir).embeddings
        .select(col("vec_id"),
          size(col("embedding")).cast("bigint").as("dims"),
          element_at(col("embedding"), 1).cast("double").as("first_elem"),
          // Sequential double fold in array order: bit-identical to
          // DuckDB's list_sum (also a sequential fold — verified), and
          // deterministic because array order is fixed. Decimal-exact
          // summing is only needed when partition order varies (groupBy).
          aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double")).as("elem_sum"))
    }),

    // D13-ext — MapType construction and access (map_from_arrays,
    // element_at, map_keys): the dynamic-schema escape hatch when
    // per-row key sets vary.
    "q_map_funcs" -> ((s, dir) => {
      val m = map_from_arrays(
        array(lit("status"), lit("prio")),
        array(col("o_orderstatus"), col("o_orderpriority")))
      Tables(s, dir).orders.filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          element_at(m, "prio").as("prio"),
          element_at(m, "status").as("status"),
          size(map_keys(m)).cast("bigint").as("n_keys"))
    }),

    // H3 — tokenize via generator (explode(split)): the engine's only
    // "UDTF" need, satisfied by a built-in Generator.
    "q_tokenize_explode" -> ((s, dir) => {
      graft.ops.Par.widen(Tables(s, dir).documents)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_regexp_extract" ->
      """SELECT o_orderkey,
                regexp_extract(o_orderpriority, '^([0-9]+)-(.*)$', 1) AS prio_num,
                regexp_extract(o_orderpriority, '^([0-9]+)-(.*)$', 2) AS prio_name
         FROM orders""",
    "q_regexp_paren" ->
      """SELECT p_partkey,
                regexp_extract(p_name || ' (' || p_brand || ')', '^[^(]*\(([^)]*)\).*$', 1) AS description
         FROM part""",
    "q_derive_columns" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y%m%d') AS ds,
                'orders' AS source,
                substring(o_orderpriority, 1, 1) AS priority_code,
                CAST(CAST(o_totalprice * 100 AS DECIMAL(20,0)) AS BIGINT) AS total_cents
         FROM orders""",
    "q_substring_index" ->
      """SELECT p_partkey, split_part(p_name, ' ', 1) AS first_word,
                split_part(p_name, ' ', -1) AS last_word
         FROM part""",
    "q_concat" ->
      """SELECT n_nationkey, concat_ws(' - ', r_name, n_name) AS display_key,
                n_name || '/' || r_name AS slash_key
         FROM nation JOIN region ON n_regionkey = r_regionkey""",
    "q_substring_parts" ->
      """SELECT o_orderkey, waktu,
                substring(waktu, 1, 10) AS waktu_string,
                substring(waktu, 7, 4) AS tahun,
                substring(waktu, 4, 2) AS bulan,
                substring(waktu, 1, 2) AS tanggal,
                substring(waktu, 12, 2) AS jam,
                substring(waktu, 15, 2) AS menit
         FROM (SELECT o_orderkey, strftime(o_orderdate, '%d-%m-%Y %H:%M:%S') AS waktu FROM orders)""",
    "q_epoch_roundtrip" ->
      """SELECT event_id,
                CAST(floor(epoch(ts)) AS BIGINT) AS epoch_sec,
                strftime(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)), '%Y-%m-%d %H:%M:%S') AS ts_str
         FROM events""",
    "q_date_format" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y%m%d') AS ds,
                strftime(o_orderdate, '%Y-%m') AS order_month,
                strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
         FROM orders""",
    "q_to_timestamp" ->
      """SELECT o_orderkey,
                strftime(strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S'),
                         '%Y-%m-%d %H:%M:%S') AS roundtrip
         FROM orders""",
    "q_interval_shift" ->
      """SELECT o_orderkey,
                strftime(o_orderdate + INTERVAL 7 HOUR, '%Y-%m-%d %H:%M:%S') AS waktu_wib
         FROM orders""",
    "q_cast_decimal" ->
      """SELECT o_orderkey,
                CAST(CAST(o_totalprice * 100 AS DECIMAL(20,0)) AS BIGINT) AS price_cents
         FROM orders""",
    "q_arith" ->
      """SELECT event_id,
                CAST(floor(epoch(ts)) AS BIGINT) + 25200 AS epoch_wib,
                value * 2 - 1 AS scaled
         FROM events""",
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber, l_partkey,
                abs(l_quantity - 25) AS abs_dev,
                CAST(ceil(l_extendedprice) AS DOUBLE) AS price_ceil,
                CAST(floor(l_extendedprice) AS DOUBLE) AS price_floor,
                round(sqrt(l_quantity), 4) AS qty_sqrt,
                round(pow(l_discount + 1, 2), 6) AS disc_pow
         FROM lineitem""",
    "q_string_funcs" ->
      """SELECT p_partkey,
                lower(p_type) AS type_lower,
                upper(p_name) AS name_upper,
                trim('  padded  ') AS trimmed,
                lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
                length(p_name) AS name_len,
                replace(p_name, ' ', '_') AS name_snake,
                CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words
         FROM part""",
    "q_regexp_extract_all" ->
      """SELECT p_partkey,
                array_to_string(regexp_extract_all(p_name, '[a-z]+', 0), '|') AS words,
                array_to_string(regexp_extract_all(p_brand, '[0-9]+', 0), '|') AS brand_nums
         FROM part""",
    "q_encode_funcs" ->
      """SELECT p_partkey,
                hex(encode(p_brand)) AS brand_hex,
                to_base64(encode(p_brand)) AS brand_b64,
                CAST(ascii(p_name) AS BIGINT) AS first_char_code,
                'x' || repeat('ab', 3) AS repeated
         FROM part WHERE p_partkey < 500""",
    "q_date_parts_fn" ->
      """SELECT o_orderkey,
                CAST(year(o_orderdate) AS BIGINT) AS y,
                CAST(quarter(o_orderdate) AS BIGINT) AS q,
                CAST(month(o_orderdate) AS BIGINT) AS m,
                CAST(day(o_orderdate) AS BIGINT) AS d,
                CAST(week(o_orderdate) AS BIGINT) AS iso_week,
                CAST(dayofyear(o_orderdate) AS BIGINT) AS doy
         FROM orders""",
    "q_listagg_distinct" ->
      """SELECT o_orderpriority,
                string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
                count(DISTINCT o_orderstatus) AS n_statuses
         FROM orders GROUP BY o_orderpriority""",
    "q_scalar_bits" ->
      """SELECT o_orderkey,
                o_custkey << 2 AS shl,
                o_custkey >> 1 AS shr,
                o_orderkey & 255 AS band,
                o_orderkey | 4096 AS bor,
                xor(o_orderkey, o_custkey) AS bxor,
                greatest(o_orderkey, o_custkey) AS gst,
                least(o_orderkey, o_custkey) AS lst
         FROM orders WHERE o_orderkey < 1000""",
    "q_explode_outer" ->
      """SELECT o.o_orderkey, t.tag
         FROM (SELECT o_orderkey,
                      CASE WHEN o_orderkey % 10 = 0 THEN []::VARCHAR[]
                           ELSE [o_orderstatus, o_orderpriority] END AS tags
               FROM orders WHERE o_orderkey < 500) o
         LEFT JOIN LATERAL (SELECT unnest(o.tags) AS tag) t ON true""",
    "q_levenshtein" ->
      """SELECT p_partkey,
                CAST(levenshtein(p_name, p_type) AS BIGINT) AS name_type_dist,
                CAST(levenshtein(p_brand, 'Brand#1') AS BIGINT) AS brand_dist
         FROM part""",
    "q_try_cast" ->
      """SELECT o_orderkey,
                TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN 'x' || o_orderstatus
                              ELSE CAST(o_orderkey AS VARCHAR) END AS BIGINT) AS parsed,
                TRY_CAST(o_orderstatus AS BIGINT) AS status_num
         FROM orders WHERE o_orderkey < 1000""",
    "q_regexp_backref" ->
      """SELECT o_orderkey,
                regexp_replace(o_orderpriority, '^([0-9]+)-(.*)$', '\2/\1') AS swapped
         FROM orders WHERE o_orderkey < 1000""",
    "q_map_funcs" ->
      """SELECT o_orderkey,
                map_extract(MAP {'status': o_orderstatus, 'prio': o_orderpriority}, 'prio')[1] AS prio,
                map_extract(MAP {'status': o_orderstatus, 'prio': o_orderpriority}, 'status')[1] AS status,
                CAST(cardinality(MAP {'status': o_orderstatus, 'prio': o_orderpriority}) AS BIGINT) AS n_keys
         FROM orders WHERE o_orderkey < 1000""",
    "q_json_struct" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
                props IS NOT NULL AS parsed_ok
         FROM events""",
    "q_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
         FROM events""",
    "q_variant_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
         FROM events""",
    "q_array_funcs" ->
      """SELECT vec_id,
                CAST(len(embedding) AS BIGINT) AS dims,
                CAST(embedding[1] AS DOUBLE) AS first_elem,
                list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS elem_sum
         FROM embeddings""",
    "q_tokenize_explode" ->
      """SELECT token, count(*) AS n FROM
           (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
         GROUP BY token"""
  )
}
