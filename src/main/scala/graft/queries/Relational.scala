package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core relational surface: scan → project/filter → aggregate → sort, the
  * Spark re-expression of the reference's eager pandas calls (SURVEY §2.2,
  * §2.6, §2.7, §2.8). Every query carries a total ORDER BY on a unique key so
  * the DuckDB hash-compare is deterministic.
  */
object Relational {
  import Q._

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  /** Flagship: TPC-H-Q1-shaped pricing summary — scan → filter → hash-agg →
    * sort. (Reference analogue: whole-frame bar statistics; SURVEY §7.1.3.)
    */
  val q01PricingSummary: Q = Q(
    "q01_pricing_summary",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          qsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
            .as("sum_disc_price"),
          qsum(
            col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
              (lit(1.0) + col("l_tax")),
            6).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
      ${sqlDsum("l_quantity")} AS sum_qty,
      ${sqlDsum("l_extendedprice")} AS sum_base_price,
      ${sqlQsum("l_extendedprice * (1.0 - l_discount)", 6)} AS sum_disc_price,
      ${sqlQsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 6)} AS sum_charge,
      ${sqlDavg("l_quantity")} AS avg_qty,
      ${sqlDavg("l_extendedprice")} AS avg_price,
      ${sqlDavg("l_discount")} AS avg_disc,
      count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")
  )

  /** P1: column drop (reference drops `symbol` post-reset_index,
    * `download_historical_price.py:426`).
    */
  val p1Drop: Q = Q(
    "p1_drop_columns",
    (s, dir) =>
      t(s, dir, "events")
        .drop("props", "ts")
        .orderBy("event_id"),
    Some("""SELECT event_id, user_id, event_type, value
      FROM events ORDER BY event_id""")
  )

  /** P2: column rename (`close`→`adj_close` conform step,
    * `download_historical_price.py:423,504-505`).
    */
  val p2Rename: Q = Q(
    "p2_rename_columns",
    (s, dir) =>
      t(s, dir, "orders")
        .withColumnRenamed("o_totalprice", "total_price")
        .withColumnRenamed("o_orderstatus", "status")
        .select("o_orderkey", "status", "total_price")
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o_orderstatus AS status, o_totalprice AS total_price
      FROM orders ORDER BY o_orderkey""")
  )

  /** P3: field projection (`[asset.symbol for asset in assets]`,
    * `download_historical_price.py:154`).
    */
  val p3Project: Q = Q(
    "p3_project",
    (s, dir) => t(s, dir, "supplier").select("s_suppkey", "s_name").orderBy("s_suppkey"),
    Some("SELECT s_suppkey, s_name FROM supplier ORDER BY s_suppkey")
  )

  /** P4: boolean predicate filter (tradable-assets filter,
    * `update_live_price.py:98`).
    */
  val p4Filter: Q = Q(
    "p4_filter_predicate",
    (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 150000.0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE o_orderstatus = 'F' AND o_totalprice > 150000.0
      ORDER BY o_orderkey""")
  )

  /** P5: set membership (negative-cache skip,
    * `download_historical_price.py:347,385`).
    */
  val p5Isin: Q = Q(
    "p5_isin_membership",
    (s, dir) =>
      t(s, dir, "customer")
        .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      ORDER BY c_custkey""")
  )

  /** P6: validity predicate — non-null, non-NaN (reference's
    * `pd.isna(price)` guard, `update_live_price.py:160-161`; NaN≠null in
    * Spark and DuckDB, so test both explicitly).
    */
  val p6Validity: Q = Q(
    "p6_validity_filter",
    (s, dir) =>
      t(s, dir, "events")
        .filter(
          col("value").isNotNull && !isnan(col("value")) && col("ts").isNotNull)
        .select("event_id", "user_id", "value")
        .orderBy("event_id"),
    Some("""SELECT event_id, user_id, value FROM events
      WHERE value IS NOT NULL AND NOT isnan(value) AND ts IS NOT NULL
      ORDER BY event_id""")
  )

  /** P8: masked conditional assignment — update one column only on rows
    * matching a date predicate (`df.loc[date_mask,'adj_close']=price`,
    * `update_live_price.py:256-257`).
    */
  val p8MaskedUpdate: Q = Q(
    "p8_masked_update",
    (s, dir) =>
      t(s, dir, "events")
        .withColumn(
          "value_upd",
          when(to_date(col("ts")) === lit("2024-01-15").cast(DateType), lit(999.99))
            .otherwise(col("value")))
        .select("event_id", "value_upd")
        .orderBy("event_id"),
    Some("""SELECT event_id,
      CASE WHEN CAST(ts AS DATE) = DATE '2024-01-15' THEN 999.99 ELSE value END AS value_upd
      FROM events ORDER BY event_id""")
  )

  /** F1: vendor symbol respelling `-`↔`.` (`download_historical_price.py:389,459`)
    * as string replace.
    */
  val f1Respell: Q = Q(
    "f1_string_replace",
    (s, dir) =>
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          regexp_replace(col("p_type"), " ", "-").as("p_type_dashed"),
          translate(col("p_brand"), "#", ".").as("p_brand_dotted"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey, replace(p_type, ' ', '-') AS p_type_dashed,
      replace(p_brand, '#', '.') AS p_brand_dotted
      FROM part ORDER BY p_partkey""")
  )

  /** F2: case mapping (`item["Code"].upper()`,
    * `download_historical_price.py:187,247`).
    */
  val f2Case: Q = Q(
    "f2_upper_lower",
    (s, dir) =>
      t(s, dir, "customer")
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("name_upper"),
          lower(col("c_mktsegment")).as("segment_lower"))
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey, upper(c_name) AS name_upper,
      lower(c_mktsegment) AS segment_lower
      FROM customer ORDER BY c_custkey""")
  )

  /** F3: split + trim + element extraction (error-message symbol parse,
    * `update_live_price.py:174-176`).
    */
  val f3Split: Q = Q(
    "f3_split_extract",
    (s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          trim(element_at(split(col("o_orderpriority"), "-"), 2)).as("priority_word"),
          element_at(split(col("o_orderpriority"), "-"), 1).cast(IntegerType)
            .as("priority_rank"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
      trim(string_split(o_orderpriority, '-')[2]) AS priority_word,
      CAST(string_split(o_orderpriority, '-')[1] AS INTEGER) AS priority_rank
      FROM orders ORDER BY o_orderkey""")
  )

  /** F4: comma-joined group members (batch symbol param `",".join(batch)`,
    * `update_live_price.py:144`); sorted inside the group for determinism.
    */
  val f4StringAgg: Q = Q(
    "f4_string_agg",
    (s, dir) =>
      t(s, dir, "nation")
        .groupBy("n_regionkey")
        .agg(
          array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
          count(lit(1)).as("n_nations"))
        .orderBy("n_regionkey"),
    Some("""SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations,
      count(*) AS n_nations
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")
  )

  /** F5: formatted path/key construction (f-string paths,
    * `download_historical_price.py:429`).
    */
  val f5Concat: Q = Q(
    "f5_format_concat",
    (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          concat(lit("doc/"), col("source"), lit("/"), col("lang"), lit("/"),
            col("doc_id").cast(StringType), lit(".parquet")).as("path"),
          format_string("%s-%s", col("lang"), col("source")).as("lang_source"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
      'doc/' || source || '/' || lang || '/' || CAST(doc_id AS VARCHAR) || '.parquet' AS path,
      format('{}-{}', lang, source) AS lang_source
      FROM documents ORDER BY doc_id""")
  )

  /** F6/F7: timestamp floor-to-second (`update_live_price.py:206`) and
    * normalize-to-day (`update_live_price.py:251-252`).
    */
  val f6TimeTrunc: Q = Q(
    "f6_f7_time_trunc",
    (s, dir) =>
      t(s, dir, "events")
        .select(
          col("event_id"),
          date_trunc("second", col("ts")).as("ts_sec"),
          date_trunc("hour", col("ts")).as("ts_hour"),
          to_date(col("ts")).as("event_date"))
        .orderBy("event_id"),
    Some("""SELECT event_id,
      date_trunc('second', ts) AS ts_sec,
      date_trunc('hour', ts) AS ts_hour,
      CAST(ts AS DATE) AS event_date
      FROM events ORDER BY event_id""")
  )

  /** F9/F10: timestamp parse + interval arithmetic (market close + 1h,
    * next-day scheduling, `download_historical_price.py:272-277,408-409`).
    */
  val f9TsArith: Q = Q(
    "f9_f10_ts_arith",
    (s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          (col("o_orderdate") + expr("INTERVAL 17 HOURS")).as("close_plus_1h"),
          (col("o_orderdate") + expr("INTERVAL 1 DAY")).as("next_day"),
          to_timestamp(
            concat(lit("2024-03-01 12:30:45"))).as("parsed_ts"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
      o_orderdate + INTERVAL 17 HOUR AS close_plus_1h,
      o_orderdate + INTERVAL 1 DAY AS next_day,
      TIMESTAMP '2024-03-01 12:30:45' AS parsed_ts
      FROM orders ORDER BY o_orderkey""")
  )

  /** F11/F12: numeric cast + null repair (float(price) casts and NaN-fill,
    * `update_live_price.py:216,248,257`).
    */
  val f11CastNull: Q = Q(
    "f11_f12_cast_null",
    (s, dir) =>
      t(s, dir, "events")
        .select(
          col("event_id"),
          col("value").cast(LongType).as("value_int"),
          when(col("value") < 10.0, lit(null).cast(DoubleType))
            .otherwise(col("value")).as("value_nullable"))
        .withColumn("value_repaired", coalesce(col("value_nullable"), lit(-1.0)))
        .orderBy("event_id"),
    Some("""SELECT event_id,
      CAST(trunc(value) AS BIGINT) AS value_int,
      CASE WHEN value < 10.0 THEN NULL ELSE value END AS value_nullable,
      coalesce(CASE WHEN value < 10.0 THEN NULL ELSE value END, -1.0) AS value_repaired
      FROM events ORDER BY event_id""")
  )

  /** F13: JSON field extraction from the semi-structured `props` payload
    * (`trade.get("p")`, `update_live_price.py:153-157`).
    */
  val f13Json: Q = Q(
    "f13_json_extract",
    (s, dir) =>
      t(s, dir, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k_val"))
        .orderBy("event_id"),
    Some("""SELECT event_id,
      CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
      FROM events ORDER BY event_id""")
  )

  /** O1: chronological sort (`df.sort_index()`, `update_live_price.py:283`). */
  val o1SortChrono: Q = Q(
    "o1_sort_chrono",
    (s, dir) =>
      t(s, dir, "events")
        .select("event_id", "ts", "user_id")
        .orderBy(col("ts"), col("event_id")),
    Some("SELECT event_id, ts, user_id FROM events ORDER BY ts, event_id")
  )

  /** O2: lexicographic sort (`sorted(symbols)`,
    * `download_historical_price.py:253`).
    */
  val o2SortLex: Q = Q(
    "o2_sort_lex",
    (s, dir) =>
      t(s, dir, "customer")
        .select("c_name", "c_custkey")
        .orderBy(col("c_name"), col("c_custkey")),
    Some("SELECT c_name, c_custkey FROM customer ORDER BY c_name, c_custkey")
  )

  /** O3/O4: top-k — sorted head (`parquet_details.py:22-23` latest-N pattern)
    * compiled to TakeOrderedAndProject, not a global sort.
    */
  val o3TopK: Q = Q(
    "o3_topk",
    (s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10),
    Some("""SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""")
  )

  /** U1: union-distinct of key universes (symbol-universe build,
    * `download_historical_price.py:212-253`).
    */
  val u1UnionDistinct: Q = Q(
    "u1_union_distinct",
    (s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val sp = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      c.union(sp).distinct().orderBy("nationkey")
    },
    Some("""SELECT c_nationkey AS nationkey FROM customer
      UNION SELECT s_nationkey AS nationkey FROM supplier
      ORDER BY nationkey""")
  )

  /** U3: set difference (valid = all − invalid, `update_live_price.py:136`). */
  val u3Except: Q = Q(
    "u3_except",
    (s, dir) => {
      val c = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_nationkey").as("nationkey"))
      val sp = t(s, dir, "supplier")
        .filter(col("s_acctbal") > 5000.0)
        .select(col("s_nationkey").as("nationkey"))
      c.except(sp).orderBy("nationkey")
    },
    Some("""SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
      EXCEPT SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000.0
      ORDER BY nationkey""")
  )

  /** U4: row append via union-by-name (`pd.concat`,
    * `update_live_price.py:273`), preserving duplicates.
    */
  val u4UnionAll: Q = Q(
    "u4_union_all",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val fulls = o.filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
      val opens = o.filter(col("o_orderstatus") === "O")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
      fulls.unionByName(opens).orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderstatus = 'O'
      ORDER BY o_orderkey""")
  )

  /** U5: intersection of key universes. */
  val u5Intersect: Q = Q(
    "u5_intersect",
    (s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val sp = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      c.intersect(sp).orderBy("nationkey")
    },
    Some("""SELECT c_nationkey AS nationkey FROM customer
      INTERSECT SELECT s_nationkey AS nationkey FROM supplier
      ORDER BY nationkey""")
  )

  /** U6: multiset difference — EXCEPT ALL keeps duplicate multiplicity
    * (each BUILDING customer row cancels ONE supplier row of the same
    * nation), the bag semantics u3's set-EXCEPT collapses. The engine's
    * `exceptAll` plans as a count-diff aggregate + generate, never a
    * row-pairing join.
    */
  val u6ExceptAll: Q = Q(
    "u6_except_all",
    (s, dir) => {
      val c = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_nationkey").as("nationkey"))
      val sp = t(s, dir, "supplier")
        .filter(col("s_acctbal") > 5000.0)
        .select(col("s_nationkey").as("nationkey"))
      c.exceptAll(sp).orderBy("nationkey")
    },
    Some("""SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
      EXCEPT ALL SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000.0
      ORDER BY nationkey""")
  )

  /** U7: multiset intersection — INTERSECT ALL keeps min(multiplicity)
    * per value across the two sides, u5's set-INTERSECT with bag
    * semantics.
    */
  val u7IntersectAll: Q = Q(
    "u7_intersect_all",
    (s, dir) => {
      val c = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_nationkey").as("nationkey"))
      val sp = t(s, dir, "supplier")
        .filter(col("s_acctbal") > 5000.0)
        .select(col("s_nationkey").as("nationkey"))
      c.intersectAll(sp).orderBy("nationkey")
    },
    Some("""SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT ALL SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000.0
      ORDER BY nationkey""")
  )

  /** U8: schema-evolution union — reading two corpus epochs whose schemas
    * drifted (an early epoch before `source`/`n_chars` landed, a late one
    * that dropped `lang`) through `unionByName(allowMissingColumns)`:
    * columns align BY NAME, absent columns null-fill, and the null-rate
    * census per epoch is exactly the audit a reader runs after a
    * schema-on-read merge (which nulls are real vs which are drift
    * artifacts). Oracle via UNION ALL BY NAME — the same semantics in
    * ANSI-adjacent form.
    *
    * Scale: name alignment is a plan-time projection (zero runtime cost);
    * each epoch scans ONLY its own columns (pruning survives the union),
    * and the census is one map-side-combinable conditional aggregate.
    */
  val u8UnionByName: Q = Q(
    "u8_union_by_name",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val epochA = docs.filter(col("doc_id") < 250)
        .select(lit("epoch_a").as("epoch"), col("doc_id"), col("lang"))
      val epochB = docs.filter(col("doc_id") >= 250)
        .select(lit("epoch_b").as("epoch"), col("doc_id"), col("source"),
          col("n_chars"))
      epochA.unionByName(epochB, allowMissingColumns = true)
        .groupBy("epoch")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("lang").isNull, 1L).otherwise(0L)).as("null_lang"),
          sum(when(col("source").isNull, 1L).otherwise(0L)).as("null_source"),
          sum(when(col("n_chars").isNull, 1L).otherwise(0L)).as("null_n_chars"))
        .orderBy("epoch")
    },
    Some("""WITH merged AS (
        (SELECT 'epoch_a' AS epoch, doc_id, lang FROM documents WHERE doc_id < 250)
        UNION ALL BY NAME
        (SELECT 'epoch_b' AS epoch, doc_id, source, n_chars FROM documents
         WHERE doc_id >= 250))
      SELECT epoch, count(*) AS n_rows,
        CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_lang,
        CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_source,
        CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_n_chars
      FROM merged GROUP BY epoch ORDER BY epoch""")
  )

  /** O5: keyset pagination — resume the chronological feed AFTER a
    * (ts, event_id) cursor, LIMIT one page: the pagination shape that
    * stays O(page) at any depth because the cursor predicate reaches the
    * parquet scan (PushedFilters on ts — PlanSpec-asserted), where
    * OFFSET-based paging scans and discards `depth` rows per request
    * (o3's TakeOrdered still ranks the whole scan — right for top-k,
    * wrong for deep feeds).
    */
  val o5KeysetPage: Q = Q(
    "o5_keyset_page",
    (s, dir) => {
      val cTs = lit("2024-01-16 00:00:00").cast("timestamp")
      val cId = 4242L
      t(s, dir, "events")
        .filter(col("ts") > cTs ||
          (col("ts") === cTs && col("event_id") > cId))
        .select("event_id", "ts", "user_id", "event_type")
        .orderBy("ts", "event_id")
        .limit(50)
    },
    Some("""SELECT event_id, ts, user_id, event_type FROM events
      WHERE ts > TIMESTAMP '2024-01-16 00:00:00'
         OR (ts = TIMESTAMP '2024-01-16 00:00:00' AND event_id > 4242)
      ORDER BY ts, event_id LIMIT 50""")
  )

  /** Q07/Q08: the SQL FRONT DOOR — every other registry query declares its
    * plan through the DataFrame API; these two run ONE ANSI SQL text
    * through `spark.sql` (over temp views of the corpus) and hand the
    * SAME text to DuckDB as the oracle: dialect-portable SQL in, identical
    * rows out. q07's above-average comparison is an integer cross-multiply
    * (cents · n > Σcents) so no engine ever materializes a float average;
    * q08 is a NOT EXISTS anti-join. Catalyst plans both exactly like their
    * DataFrame twins (hash aggregate / broadcast anti join).
    */
  private val sqlQ07 =
    """WITH cents AS (SELECT c_nationkey, CAST(round(c_acctbal * 100) AS BIGINT) AS cb
         FROM customer),
       stats AS (SELECT c_nationkey, sum(cb) AS s, count(*) AS n
         FROM cents GROUP BY c_nationkey)
       SELECT n.n_name, count(*) AS n_above_avg
       FROM cents c
       JOIN stats st ON c.c_nationkey = st.c_nationkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       WHERE c.cb * st.n > st.s
       GROUP BY n.n_name ORDER BY n.n_name"""

  val q07SqlAboveAvg: Q = Q(
    "q07_sql_above_avg",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "nation").createOrReplaceTempView("nation")
      s.sql(sqlQ07)
    },
    Some(sqlQ07)
  )

  private val sqlQ08 =
    """SELECT p.p_brand, count(*) AS n_never_bulk
       FROM part p
       WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                         WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 45)
       GROUP BY p.p_brand ORDER BY p.p_brand"""

  val q08SqlNotExists: Q = Q(
    "q08_sql_not_exists",
    (s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("part")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(sqlQ08)
    },
    Some(sqlQ08)
  )

  private val sqlQ14 =
    """SELECT user_id, event_id, value, CAST(rn AS BIGINT) AS rn FROM (
         SELECT user_id, event_id, value,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY value DESC, event_id) AS rn
         FROM events WHERE event_type = 'purchase') t
       WHERE rn <= 3 ORDER BY user_id, rn"""

  /** Q14: windowed SQL front door — ONE ANSI text with a ranking window +
    * rank predicate through both engines (the q07/q08 contract extended to
    * window syntax). On Spark the rn <= 3 filter must infer a
    * WindowGroupLimit (the w3 plan property) from the SQL text exactly as
    * from the DataFrame form — the front door and the API compile to the
    * same physical plan.
    */
  val q14SqlWindow: Q = Q(
    "q14_sql_window",
    (s, dir) => {
      t(s, dir, "events").createOrReplaceTempView("events")
      s.sql(sqlQ14)
    },
    Some(sqlQ14)
  )

  private val sqlQ15 =
    """WITH RECURSIVE h(id, depth, path_cost_cents) AS (
         SELECT CAST(p_partkey AS BIGINT), 0,
                CAST(round(p_retailprice * 100) AS BIGINT)
         FROM part WHERE p_partkey = 1
         UNION ALL
         SELECT CAST(p.p_partkey AS BIGINT), h.depth + 1,
                h.path_cost_cents + CAST(round(p.p_retailprice * 100) AS BIGINT)
         FROM part p JOIN h ON CAST(floor(p.p_partkey / 2) AS BIGINT) = h.id)
       SELECT id AS part_id, depth, path_cost_cents
       FROM h ORDER BY part_id"""

  /** Q15: recursive-CTE hierarchy flatten — ONE ANSI `WITH RECURSIVE` text
    * through both engines (the q07/q14 front-door contract extended to
    * recursion, exercising Spark 4's `UnionLoop` operator). The hierarchy
    * is the implicit binary tree parent(k) = ⌊k/2⌋ over part ids rooted at
    * 1 — the BOM-explosion / org-chart flatten: per node, its depth and
    * the exact root-path cost in integer cents.
    *
    * Determinism: each node is reached exactly ONCE (tree — so
    * UNION ALL needs no dedup; Spark rejects UNION-distinct recursion),
    * its path cost accumulates in one fixed order, and all arithmetic is
    * BIGINT cents. Node 0 is its own parent and the seed excludes it, so
    * no cycle is ever entered.
    *
    * Scale: each recursion level is one frontier-to-table hash equi-join
    * on the parent key (the g5 BFS shape — level count is log2(max id),
    * and Spark's recursion-level guard caps runaway graphs); total rows
    * across levels = |parts|, never re-visited. The native iterative
    * operators (g1/g5/PageRank) remain the tuned scale path with
    * memoized edges; q15 proves the SQL front door reaches parity.
    */
  val q15SqlRecursive: Q = Q(
    "q15_sql_recursive",
    (s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("part")
      s.sql(sqlQ15)
    },
    Some(sqlQ15)
  )

  /** Q09: TPC-H Q17-shaped correlated scalar subquery — "orders below 20%
    * of the part's average quantity" — the decorrelation stress test:
    * both engines must rewrite the two per-part correlated aggregates into
    * aggregate joins (Spark: RewriteCorrelatedScalarSubquery → one keyed
    * aggregate + join; a naive per-row re-execution would rescan lineitem
    * once per row). One ANSI text runs on both engines, q07/q08's
    * front-door pattern. The 20%-of-average compare is exact integer
    * cross-multiplication (q·cnt·5 < sum over round(q·100) cents), q07's
    * trick extended to the correlated form, and revenue converts the exact
    * integer-cents sum once at the end.
    */
  private val sqlQ09 =
    """WITH li AS (SELECT l_partkey, CAST(round(l_quantity * 100) AS BIGINT) AS q100,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price100 FROM lineitem)
       SELECT p.p_brand, count(*) AS n_small_orders,
         CAST(CAST(sum(l.price100) AS DOUBLE) / 100.0 AS DOUBLE) AS revenue
       FROM li l JOIN part p ON p.p_partkey = l.l_partkey
       WHERE l.q100 * (SELECT count(*) FROM li l2 WHERE l2.l_partkey = l.l_partkey) * 5
           < (SELECT sum(l2.q100) FROM li l2 WHERE l2.l_partkey = l.l_partkey)
       GROUP BY p.p_brand ORDER BY p.p_brand"""

  val q09SqlCorrelated: Q = Q(
    "q09_sql_correlated",
    (s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("part")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(sqlQ09)
    },
    Some(sqlQ09)
  )

  /** Q10: TPC-H Q21-shaped chained EXISTS + NOT EXISTS, both correlated on
    * the same fact table — "the only supplier who shipped a returned line
    * in a multi-supplier completed order". The planner stress here is
    * turning BOTH quantified subqueries into joins on l_orderkey (Spark:
    * RewritePredicateSubquery → left-semi then left-anti); naive per-row
    * execution would rescan lineitem twice per lineitem row. Counts only,
    * so no numeric-determinism machinery is needed.
    */
  private val sqlQ10 =
    """SELECT s.s_suppkey, s.s_name, count(*) AS numwait
       FROM supplier s
       JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
       JOIN orders o ON o.o_orderkey = l1.l_orderkey
       WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
         AND EXISTS (SELECT 1 FROM lineitem l2
                     WHERE l2.l_orderkey = l1.l_orderkey
                       AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM lineitem l3
                         WHERE l3.l_orderkey = l1.l_orderkey
                           AND l3.l_suppkey <> l1.l_suppkey
                           AND l3.l_returnflag = 'R')
       GROUP BY s.s_suppkey, s.s_name
       ORDER BY numwait DESC, s.s_suppkey"""

  val q10SqlExistsChain: Q = Q(
    "q10_sql_exists_chain",
    (s, dir) => {
      t(s, dir, "supplier").createOrReplaceTempView("supplier")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(sqlQ10)
    },
    Some(sqlQ10)
  )

  /** Q11: IN-subquery over a grouped derivation, with a correlated scalar
    * aggregate inside it (TPC-H Q20 shape, adapted to the corpus's tables:
    * suppliers shipping more than half of some part's total volume). Two
    * decorrelations compose: the IN becomes a left-semi join, and the
    * correlated `sum` subquery becomes a grouped aggregate joined back on
    * the correlation key — naive execution would rescan lineitem once per
    * (part, supplier) group. Quantities are small integers stored as
    * doubles, summed exactly; both engines compute the identical IEEE
    * product for the threshold, so the comparison is deterministic with
    * no quantization machinery. (0.15: TPC-H's uniform part→supplier
    * spread means no supplier ever reaches Q20's half-share — measured
    * max share is ~0.25 at every tested SF.)
    */
  private val sqlQ11 =
    """SELECT s.s_suppkey, s.s_name
       FROM supplier s
       WHERE s.s_suppkey IN (
         SELECT sp.l_suppkey FROM (
           SELECT l_partkey, l_suppkey, sum(l_quantity) AS q
           FROM lineitem GROUP BY l_partkey, l_suppkey) sp
         WHERE sp.q > (SELECT sum(l_quantity) * CAST(0.15 AS DOUBLE)
                       FROM lineitem l2 WHERE l2.l_partkey = sp.l_partkey))
       ORDER BY s.s_suppkey"""

  val q11SqlNestedIn: Q = Q(
    "q11_sql_nested_in",
    (s, dir) => {
      t(s, dir, "supplier").createOrReplaceTempView("supplier")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(sqlQ11)
    },
    Some(sqlQ11)
  )

  /** Q12: top-supplier-by-revenue with a reused derived table (TPC-H Q15
    * shape): the revenue aggregate appears BOTH as the join input and
    * inside the scalar `max` subquery. Catalyst plans the CTE once per
    * reference but AQE's subquery reuse dedups the exchange; the scalar
    * max is a one-row broadcast into the filter, and ties (multiple
    * suppliers at the max) survive, which is why the shape needs the
    * scalar subquery rather than a LIMIT 1. Revenue is the integer-
    * quantized exact sum ([[Q.qsum]] at 4dp), so the max comparison is
    * bit-deterministic on both engines — a float-summed revenue here
    * would make "equals the max" partition-order-dependent, the classic
    * Q15 correctness trap.
    */
  private val sqlQ12 =
    s"""WITH revenue AS (
         SELECT l_suppkey AS supplier_no,
                ${Q.sqlQsum("l_extendedprice * (1 - l_discount)", 4)} AS total_revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         GROUP BY l_suppkey)
       SELECT s.s_suppkey, s.s_name, r.total_revenue
       FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
       WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
       ORDER BY s.s_suppkey"""

  val q12SqlTopSupplier: Q = Q(
    "q12_sql_top_supplier",
    (s, dir) => {
      t(s, dir, "supplier").createOrReplaceTempView("supplier")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(sqlQ12)
    },
    Some(sqlQ12)
  )

  /** Q13: minimum-cost supplier (TPC-H Q2 shape) — the classic
    * correlated-scalar-min pattern: for each small part, keep exactly the
    * suppliers whose observed unit cost equals the per-part minimum, with
    * supplier/nation context joined in. Catalyst decorrelates the
    * correlated `min` subquery into a per-part aggregate + equi-join (no
    * per-row re-execution), and the nation/supplier dims ride broadcast
    * joins. Unit cost is integer cents from `round(price/qty·100)` — both
    * engines evaluate the identical IEEE division and half-away rounding,
    * so "equals the min" is bit-deterministic (the Q2 tie trap) and ties
    * survive as Q2 semantics require. Total ORDER BY + unique (part,
    * supplier) tiebreak keeps LIMIT stable.
    */
  private val sqlQ13 =
    """WITH cost AS (
         SELECT l_partkey AS pk, l_suppkey AS sk,
                min(CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT)) AS unit_c
         FROM lineitem GROUP BY l_partkey, l_suppkey)
       SELECT p.p_partkey, p.p_brand, s.s_suppkey, s.s_name, n.n_name, c.unit_c
       FROM part p
       JOIN cost c ON c.pk = p.p_partkey
       JOIN supplier s ON s.s_suppkey = c.sk
       JOIN nation n ON n.n_nationkey = s.s_nationkey
       WHERE p.p_size <= 15
         AND c.unit_c = (SELECT min(c2.unit_c) FROM cost c2 WHERE c2.pk = p.p_partkey)
       ORDER BY c.unit_c DESC, p.p_partkey, s.s_suppkey
       LIMIT 100"""

  val q13SqlMinCost: Q = Q(
    "q13_sql_min_cost",
    (s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("part")
      t(s, dir, "supplier").createOrReplaceTempView("supplier")
      t(s, dir, "nation").createOrReplaceTempView("nation")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(sqlQ13)
    },
    Some(sqlQ13)
  )

  /** Q16: disjunctive multi-clause join predicate (TPC-H Q19 shape) — three
    * OR'd brand × size × quantity clauses across the part⋈lineitem join.
    * The planner stress: the common `p_partkey = l_partkey` conjunct must
    * stay an equi-join key with the disjunction applied as a post-join
    * filter (a naive reading of the OR forces a nested-loop theta join),
    * and the brand/size IN-range conjuncts common to all three clauses
    * must still prune the part scan. Revenue is the exact 4dp-quantized
    * integer sum surfaced as BIGINT units — no float aggregate anywhere,
    * so the one ANSI text is bit-deterministic on both engines.
    */
  private val sqlQ16 =
    """SELECT l.l_returnflag, count(*) AS n_lines,
         CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                  AS BIGINT)) AS BIGINT) AS rev_u4
       FROM lineitem l
       JOIN part p ON p.p_partkey = l.l_partkey
       WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
              AND l.l_quantity >= 1 AND l.l_quantity <= 11)
          OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
              AND l.l_quantity >= 10 AND l.l_quantity <= 20)
          OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
              AND l.l_quantity >= 20 AND l.l_quantity <= 30)
       GROUP BY l.l_returnflag ORDER BY l.l_returnflag"""

  val q16SqlDisjunctive: Q = Q(
    "q16_sql_disjunctive",
    (s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("part")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(sqlQ16)
    },
    Some(sqlQ16)
  )

  /** Q17: large-volume orders (TPC-H Q18 shape) — a HAVING-filtered
    * aggregate over the fact table joined back to its dimensions. The
    * shape matters at scale because the grouped HAVING derivation is the
    * ONLY full lineitem pass (one keyed hash aggregate with map-side
    * partials); the surviving handful of orderkeys then semi-drive the
    * orders⋈customer joins, so the dimensions never see unfiltered fact
    * rows. Quantities are integer-valued doubles cast to BIGINT before
    * summing (exact, and sidesteps DuckDB's sum(BIGINT)→HUGEINT widening
    * via the outer CAST); the order total surfaces as exact cents.
    */
  private val sqlQ17 =
    """WITH big AS (
         SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         FROM lineitem GROUP BY l_orderkey
         HAVING sum(CAST(l_quantity AS BIGINT)) > 300)
       SELECT c.c_custkey, c.c_name, o.o_orderkey,
              CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
              b.sum_qty
       FROM big b
       JOIN orders o ON o.o_orderkey = b.l_orderkey
       JOIN customer c ON c.c_custkey = o.o_custkey
       ORDER BY total_cents DESC, o.o_orderkey
       LIMIT 100"""

  val q17SqlLargeOrders: Q = Q(
    "q17_sql_large_orders",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(sqlQ17)
    },
    Some(sqlQ17)
  )

  /** Q18: global-benchmark anti-join census (TPC-H Q22 shape) — customers
    * whose balance beats the positive-balance average AND who never
    * placed an urgent order, counted per nation-derived segment. The
    * planner stress is
    * the combination Q22 exists to test: an uncorrelated scalar subquery
    * (the global average — computed once, broadcast as a literal-like
    * single row, never re-evaluated per customer) feeding a filter, then
    * an anti-join against the filtered orders table (which must stay a
    * broadcast/shuffled ANTI join with the priority predicate pushed into
    * the orders scan, never a NOT IN nested loop), then a small-key
    * aggregate.
    *
    * Exactness: the "above average" cut is cross-multiplied in BIGINT
    * cents — `bal_cents · n_pos > sum_cents` — so no engine ever divides
    * (q16's discipline); the reported sum is exact cents.
    */
  private val sqlQ18 =
    """WITH pos AS (
         SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents, c_custkey,
                c_nationkey
         FROM customer WHERE c_acctbal > 0.0),
       bench AS (
         SELECT count(*) AS n_pos, CAST(sum(bal_cents) AS BIGINT) AS sum_cents
         FROM pos),
       rich AS (
         SELECT p.c_custkey, p.c_nationkey, p.bal_cents
         FROM pos p, bench b
         WHERE p.bal_cents * b.n_pos > b.sum_cents),
       quiet AS (
         SELECT r.* FROM rich r
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = r.c_custkey
                             AND o.o_orderpriority = '1-URGENT'))
       SELECT c_nationkey % 5 AS segment, count(*) AS n_cust,
              CAST(sum(bal_cents) AS BIGINT) AS total_cents
       FROM quiet GROUP BY c_nationkey % 5 ORDER BY segment"""

  val q18SqlGlobalAvg: Q = Q(
    "q18_sql_global_avg",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(sqlQ18)
    },
    Some(sqlQ18)
  )

  /** Q19: shipping-priority revenue (TPC-H Q3 shape) — the canonical
    * 3-way star probe: the segment filter prunes customers BEFORE the
    * orders join, both date predicates push into their parquet scans
    * (`PushedFilters` on o_orderdate and l_shipdate), and the top-10
    * revenue orders surface through TakeOrdered over the grouped
    * aggregate — never a global sort of all orders. Revenue is
    * integer-exact in 10⁻⁴ units (q16's rounding discipline), so the
    * one ANSI text is bit-deterministic on both engines.
    *
    * Scale: at 100 TB the segment filter keeps ~1/5 of customers and
    * the date cut prunes most lineitem row groups on min/max stats; the
    * grouped agg keys on orderkey with map-side partials, and the final
    * LIMIT is a per-partition top-k merge, not a sort.
    */
  private val sqlQ19 =
    """SELECT l.l_orderkey,
         CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                  AS BIGINT)) AS BIGINT) AS rev_u4,
         o.o_orderdate, o.o_orderpriority
       FROM customer c
       JOIN orders o ON o.o_custkey = c.c_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE c.c_mktsegment = 'BUILDING'
         AND o.o_orderdate < TIMESTAMP '1998-07-01'
         AND l.l_shipdate > TIMESTAMP '1998-07-01'
       GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
       ORDER BY rev_u4 DESC, l.l_orderkey
       LIMIT 10"""

  val q19SqlShippingPriority: Q = Q(
    "q19_sql_shipping_priority",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(sqlQ19)
    },
    Some(sqlQ19)
  )

  /** Q20: distinct-supplier census with a NOT IN exclusion (TPC-H Q16
    * shape) — the planner stress is the null-aware anti join: `NOT IN
    * (subquery)` must compile to a single anti join against the
    * excluded-supplier set (s_suppkey is non-null, so the null-aware
    * machinery degenerates to a plain anti join rather than a per-row
    * nested loop), followed by a distinct-aggregate keyed on the part
    * attributes. lineitem stands in for partsupp as the part↔supplier
    * association (this corpus has no partsupp table).
    *
    * Scale: the exclusion set is supplier-sized (broadcastable at any
    * SF), the anti join runs pre-aggregation so excluded rows never
    * reach the distinct, and `count(DISTINCT l_suppkey)` expands to the
    * standard two-phase partial-distinct plan.
    */
  private val sqlQ20 =
    """SELECT p.p_brand, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
       FROM lineitem l
       JOIN part p ON p.p_partkey = l.l_partkey
       WHERE p.p_brand <> 'Brand#45'
         AND l.l_suppkey NOT IN
           (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
       GROUP BY p.p_brand, p.p_size
       ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
       LIMIT 50"""

  val q20SqlSupplierCensus: Q = Q(
    "q20_sql_supplier_census",
    (s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("part")
      t(s, dir, "supplier").createOrReplaceTempView("supplier")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(sqlQ20)
    },
    Some(sqlQ20)
  )

  /** Q21: volume shipping between a nation pair (TPC-H Q7 shape) — the
    * planner stress is the DISJUNCTIVE pair predicate over two aliases of
    * the same dimension: `(n1=A ∧ n2=B) ∨ (n1=B ∧ n2=A)` references both
    * nation sides at once, so it cannot push below either dimension join
    * and must survive as a post-join filter — while the non-disjunctive
    * residue (each side's membership in {A, B}) IS separable and a good
    * optimizer pushes `n_name IN (A, B)` into both nation scans,
    * shrinking the broadcast sides before the fact tables join.
    *
    * Scale: all three dimension hops (supplier, customer, nation ×2) are
    * broadcastable at any SF; lineitem⋈orders is the one real shuffle;
    * the year rollup keys on a 3-value group with map-side partials.
    * Revenue is integer-exact in 10⁻⁴ units (the q16 discipline).
    */
  private val sqlQ21 =
    """SELECT supp_nation, cust_nation, l_year,
         CAST(sum(vol_u4) AS BIGINT) AS revenue_u4
       FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(extract(year FROM l.l_shipdate) AS INT) AS l_year,
               CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                    AS BIGINT) AS vol_u4
             FROM supplier s
             JOIN lineitem l ON l.l_suppkey = s.s_suppkey
             JOIN orders o ON o.o_orderkey = l.l_orderkey
             JOIN customer c ON c.c_custkey = o.o_custkey
             JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
             JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
             WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
                OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')) v
       GROUP BY supp_nation, cust_nation, l_year
       ORDER BY supp_nation, cust_nation, l_year"""

  val q21SqlVolumeShipping: Q = Q(
    "q21_sql_volume_shipping",
    (s, dir) => {
      t(s, dir, "supplier").createOrReplaceTempView("supplier")
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "nation").createOrReplaceTempView("nation")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(sqlQ21)
    },
    Some(sqlQ21)
  )

  /** Q22: per-group top-N through a correlated LATERAL subquery — the
    * front-door spelling of "each nation's two richest customers". The
    * planner stress: a naive engine re-executes the inner ORDER BY/LIMIT
    * once per outer row; Spark must DECORRELATE the lateral into a
    * windowed group-limit joined back to the outer — and, since Spark
    * 3.5, push a PARTIAL WindowGroupLimit below the shuffle, so each map
    * task forwards at most N rows per key and the exchange carries
    * O(keys·N), not the table. PlanSpec pins both properties.
    *
    * Scale: customer shuffles once on nationkey with the map-side
    * group-limit bound; the nation side broadcasts. Equivalent to w3's
    * explicit window spelling — the point is that the declarative
    * LATERAL arrives at the SAME physical plan.
    */
  private val sqlQ22 =
    """SELECT n.n_name, t.c_name, t.c_acctbal
       FROM nation n, LATERAL (
         SELECT c_name, c_acctbal FROM customer c
         WHERE c.c_nationkey = n.n_nationkey
         ORDER BY c_acctbal DESC, c_name LIMIT 2) t
       ORDER BY n.n_name, t.c_acctbal DESC, t.c_name"""

  val q22SqlLateralTopN: Q = Q(
    "q22_sql_lateral_topn",
    (s, dir) => {
      t(s, dir, "nation").createOrReplaceTempView("nation")
      t(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql(sqlQ22)
    },
    Some(sqlQ22)
  )

  /** Q23: SQL PIVOT clause through the front door — p9 covers the
    * DataFrame `pivot()` API; this is the declarative spelling (Spark's
    * `PIVOT (agg FOR col IN (...))`), compiled to the SAME two-phase
    * aggregate: the pivot columns become conditional aggregates, partials
    * combine map-side, and NO per-pivot-value scan or join exists. The
    * oracle spells the identical semantics as portable conditional
    * aggregation (engines' PIVOT surface syntaxes differ; the semantics
    * is the contract). Money pivots to integer cents (the q16 rounding
    * discipline) so both engines agree bit-for-bit. One semantic seam is
    * reconciled explicitly: PIVOT null-pads a (group, value) pair with NO
    * rows where conditional `count(*)` says 0 — the outer coalesce pins
    * the count columns to the 0 convention at every SF.
    *
    * Scale: one customer scan, one hash aggregate keyed on nationkey
    * with 2×2 conditional agg slots — pivot width is fixed at plan time,
    * so the row explosion of a naive "join per segment" never happens.
    */
  private val sqlQ23Spark =
    """SELECT c_nationkey,
         coalesce(building_n, 0L) AS building_n, building_bal_c,
         coalesce(automobile_n, 0L) AS automobile_n, automobile_bal_c
       FROM (SELECT c_nationkey, c_mktsegment, c_acctbal FROM customer)
       PIVOT (count(*) AS n,
              CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_c
              FOR c_mktsegment IN ('BUILDING' AS building, 'AUTOMOBILE' AS automobile))
       ORDER BY c_nationkey"""

  val q23SqlPivot: Q = Q(
    "q23_sql_pivot",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql(sqlQ23Spark)
    },
    Some("""SELECT c_nationkey,
         count(*) FILTER (c_mktsegment = 'BUILDING') AS building_n,
         CAST(sum(CASE WHEN c_mktsegment = 'BUILDING'
               THEN CAST(round(c_acctbal * 100) AS BIGINT) END) AS BIGINT)
           AS building_bal_c,
         count(*) FILTER (c_mktsegment = 'AUTOMOBILE') AS automobile_n,
         CAST(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE'
               THEN CAST(round(c_acctbal * 100) AS BIGINT) END) AS BIGINT)
           AS automobile_bal_c
       FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""")
  )

  /** Q24: SQL UNPIVOT clause through the front door — q23's inverse and
    * p10's declarative spelling: wide columns melt to (metric, val) rows
    * via Spark's `UNPIVOT (val FOR metric IN (...))`, compiled to ONE
    * Expand (each input row fans to |metrics| output rows in the scan
    * stage projection — no join, no shuffle before the presentation
    * sort). The oracle spells the identical semantics as a portable
    * UNION ALL (engines' UNPIVOT surface syntaxes differ). Values
    * normalize to integer cents pre-melt so both engines emit
    * bit-identical longs from one shared value column.
    *
    * Scale: Expand is a narrow codegen operator — melting a 100 TB fact
    * table is a map-only pass; UNPIVOT's NULL-dropping default is pinned
    * explicitly (INCLUDE NULLS) so row counts are schema-determined.
    */
  private val sqlQ24Spark =
    """SELECT s_suppkey, metric, val_c FROM (
         SELECT s_suppkey,
                CAST(s_nationkey AS BIGINT) * 100 AS nation_c,
                CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_c
         FROM supplier)
       UNPIVOT INCLUDE NULLS (val_c FOR metric IN
         (nation_c AS nation, acctbal_c AS acctbal))
       ORDER BY s_suppkey, metric"""

  val q24SqlUnpivot: Q = Q(
    "q24_sql_unpivot",
    (s, dir) => {
      t(s, dir, "supplier").createOrReplaceTempView("supplier")
      s.sql(sqlQ24Spark)
    },
    Some("""SELECT s_suppkey, metric, val_c FROM (
         SELECT s_suppkey, 'nation' AS metric,
                CAST(s_nationkey AS BIGINT) * 100 AS val_c FROM supplier
         UNION ALL
         SELECT s_suppkey, 'acctbal',
                CAST(round(s_acctbal * 100) AS BIGINT) FROM supplier)
       ORDER BY s_suppkey, metric""")
  )

  /** Q25: order-priority census gated by a correlated EXISTS with a
    * date-range outer filter (TPC-H Q4's shape — the remaining classic
    * decorrelation stress after q08's NOT EXISTS): count the quarter's
    * orders per priority where at least one line item shipped more than
    * 60 days after the order date. The planner must decorrelate the
    * EXISTS into ONE left-semi join keyed on orderkey — never a per-row
    * subquery — with the non-correlated date predicates pushed to the
    * orders scan (PlanSpec-asserted).
    *
    * Scale: the semi join keeps only the key + the correlated date from
    * lineitem (no payload widens the shuffle); the priority census is a
    * 5-group aggregate with map-side partials.
    */
  private val sqlQ25 =
    """SELECT o.o_orderpriority, count(*) AS order_count
       FROM orders o
       WHERE o.o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
         AND o.o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
         AND EXISTS (SELECT 1 FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey
                       AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
       GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority"""

  val q25SqlExistsRange: Q = Q(
    "q25_sql_exists_range",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(sqlQ25)
    },
    Some(sqlQ25)
  )

  /** Q26: national market share (TPC-H Q8's shape) — one nation's share
    * of a region's ECONOMY-part purchase volume per order year, through
    * an EIGHT-table join chain (part→lineitem→supplier→orders→customer→
    * nation×2→region) with the share as a conditional-sum CASE over the
    * supplier nation. Numerator and denominator are exact integer 10⁻⁴
    * units folded in ONE aggregate (never two scans); the share itself is
    * one IEEE division of identical BIGINT operands per year row (the
    * Q.davg determinism rule).
    *
    * Scale: every dimension hop (part, supplier, customer, nation ×2,
    * region) is broadcastable at any SF — lineitem⋈orders is the single
    * real shuffle; the region/type filters prune the broadcast sides
    * before the fact join; the year rollup has map-side partials.
    */
  private val sqlQ26 =
    """SELECT o_year,
         CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN vol_u4 ELSE 0 END)
              AS BIGINT) AS nation_vol_u4,
         CAST(sum(vol_u4) AS BIGINT) AS total_vol_u4,
         CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN vol_u4 ELSE 0 END)
              AS DOUBLE) / CAST(sum(vol_u4) AS DOUBLE) AS mkt_share
       FROM (SELECT CAST(extract(year FROM o.o_orderdate) AS INT) AS o_year,
               CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                    AS BIGINT) AS vol_u4,
               n2.n_name AS supp_nation
             FROM part p
             JOIN lineitem l ON l.l_partkey = p.p_partkey
             JOIN supplier s ON s.s_suppkey = l.l_suppkey
             JOIN orders o ON o.o_orderkey = l.l_orderkey
             JOIN customer c ON c.c_custkey = o.o_custkey
             JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
             JOIN region r ON r.r_regionkey = n1.n_regionkey
             JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
             WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY') v
       GROUP BY o_year ORDER BY o_year"""

  val q26SqlMarketShare: Q = Q(
    "q26_sql_market_share",
    (s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("part")
      t(s, dir, "supplier").createOrReplaceTempView("supplier")
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "nation").createOrReplaceTempView("nation")
      t(s, dir, "region").createOrReplaceTempView("region")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(sqlQ26)
    },
    Some(sqlQ26)
  )

  /** Q27: priority split per line category (TPC-H Q12's shape — the
    * shipmode CASE aggregate; this corpus's lineitem carries no
    * l_shipmode, so l_returnflag plays the category): per return flag in
    * a one-year shipping window, how many lines belong to high-priority
    * orders vs the rest. The two CASE sums fold in ONE orders⋈lineitem
    * pass — the classic "pivot a predicate into columns" aggregate.
    *
    * Scale: one equi-join shuffle on orderkey (the date filter pushes to
    * the lineitem scan and prunes before the join); the census keys on a
    * 3-value group with map-side partials.
    */
  private val sqlQ27 =
    """SELECT l.l_returnflag,
         CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
       FROM orders o
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY l.l_returnflag ORDER BY l.l_returnflag"""

  val q27SqlPrioritySplit: Q = Q(
    "q27_sql_priority_split",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(sqlQ27)
    },
    Some(sqlQ27)
  )

  /** Q28: product-line profit (TPC-H Q9's shape) — the multi-join
    * aggregate keyed on an EXPRESSION (order year) across five tables:
    * every lineitem selling a '%gear%' part contributes
    * revenue − supply cost to its supplier nation's yearly profit (this
    * corpus has no partsupp, so supply cost is the standard proxy
    * p_retailprice·quantity at a fixed 10 % cost ratio). The planner
    * shapes Q9 exercises and nothing in q01–q27 does together: a LIKE
    * filter pruning the part dimension BEFORE the fact join, a five-table
    * join DAG where every dimension hop must broadcast, and a group key
    * computed from an expression (`extract(year ...)`) rather than a
    * column.
    *
    * Exactness: profit folds in 10⁻⁵ integer units —
    * `10·round(ext·(1−disc)·10⁴) − round(retail·10⁴)·qty` — one exact
    * BIGINT sum, then ONE IEEE division per output row (the Q.davg rule).
    *
    * Scale: part (LIKE-pruned), supplier and nation broadcast at any SF;
    * lineitem⋈orders is the single real shuffle; the (nation, year)
    * rollup has map-side partials.
    */
  private val sqlQ28 =
    """SELECT n.n_name AS nation,
         CAST(extract(year FROM o.o_orderdate) AS INT) AS o_year,
         CAST(sum(10 * CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                       AS BIGINT)
                  - CAST(round(p.p_retailprice * 10000) AS BIGINT)
                    * CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS profit_u5,
         CAST(sum(10 * CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                       AS BIGINT)
                  - CAST(round(p.p_retailprice * 10000) AS BIGINT)
                    * CAST(l.l_quantity AS BIGINT)) AS DOUBLE) / 100000.0
           AS profit
       FROM part p
       JOIN lineitem l ON l.l_partkey = p.p_partkey
       JOIN supplier s ON s.s_suppkey = l.l_suppkey
       JOIN orders o ON o.o_orderkey = l.l_orderkey
       JOIN nation n ON n.n_nationkey = s.s_nationkey
       WHERE p.p_name LIKE '%gear%'
       GROUP BY n.n_name, CAST(extract(year FROM o.o_orderdate) AS INT)
       ORDER BY nation, o_year DESC"""

  val q28SqlProfit: Q = Q(
    "q28_sql_profit",
    (s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("part")
      t(s, dir, "supplier").createOrReplaceTempView("supplier")
      t(s, dir, "nation").createOrReplaceTempView("nation")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(sqlQ28)
    },
    Some(sqlQ28)
  )

  /** Q29: customer order-count distribution (TPC-H Q13's shape) — the
    * OUTER-join-then-count-distribution with the null group: customers
    * left-join orders with the filter in the ON clause (priority ≠
    * '5-LOW'), so a customer with no qualifying orders survives with
    * count 0 — the one planner shape q01–q28 never exercises (a WHERE
    * would silently drop the zero-order customers and collapse the join
    * to inner). `count(o_orderkey)` counts only matched rows by SQL null
    * semantics; the histogram then groups the per-customer counts.
    *
    * Scale: one outer-join shuffle on custkey (orders' ON-filter prunes
    * before the join); the per-customer count has map-side partials; the
    * distribution keys on the O(max orders per customer) count domain.
    */
  private[graft] val sqlQ29 =
    """SELECT c_count, count(*) AS custdist
       FROM (SELECT c.c_custkey,
               count(o.o_orderkey) AS c_count
             FROM customer c
             LEFT JOIN orders o
               ON o.o_custkey = c.c_custkey
              AND o.o_orderpriority <> '5-LOW'
             GROUP BY c.c_custkey) per_cust
       GROUP BY c_count
       ORDER BY custdist DESC, c_count DESC"""

  val q29SqlCustDist: Q = Q(
    "q29_sql_cust_dist",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(sqlQ29)
    },
    Some(sqlQ29)
  )

  val all: Seq[Q] = Seq(
    q01PricingSummary, q07SqlAboveAvg, q08SqlNotExists, q09SqlCorrelated,
    q10SqlExistsChain, q11SqlNestedIn, q12SqlTopSupplier, q13SqlMinCost,
    q14SqlWindow, q15SqlRecursive, q16SqlDisjunctive, q17SqlLargeOrders,
    q18SqlGlobalAvg, q19SqlShippingPriority, q20SqlSupplierCensus,
    q21SqlVolumeShipping, q22SqlLateralTopN, q23SqlPivot, q24SqlUnpivot,
    q25SqlExistsRange, q26SqlMarketShare, q27SqlPrioritySplit,
    q28SqlProfit, q29SqlCustDist,
    p1Drop, p2Rename, p3Project, p4Filter, p5Isin, p6Validity, p8MaskedUpdate,
    f1Respell, f2Case, f3Split, f4StringAgg, f5Concat, f6TimeTrunc, f9TsArith,
    f11CastNull, f13Json,
    o1SortChrono, o2SortLex, o3TopK, o5KeysetPage,
    u1UnionDistinct, u3Except, u4UnionAll, u5Intersect, u6ExceptAll,
    u7IntersectAll, u8UnionByName)
}
