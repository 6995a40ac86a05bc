package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Remaining SURVEY §2 coverage: global counts (A2), exact percentiles,
  * timezone conversion (F8), insert-if-absent set growth (U2), schema diff
  * as rows (V2), file-listing source (S10/O4), and the multimodal binary
  * plumbing (encode → typed metadata extraction over a binary column).
  */
object MiscQueries {
  import Q._

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  /** A2: cardinality census — the reference logs `len(...)` everywhere
    * (`download_historical_price.py:124,155,192,254`).
    */
  val a2Counts: Q = Q(
    "a2_counts",
    (s, dir) =>
      t(s, dir, "events")
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(col("event_type")).as("n_types"),
          count(col("value")).as("n_nonnull_values")),
    Some("""SELECT count(*) AS n_events, count(DISTINCT user_id) AS n_users,
      count(DISTINCT event_type) AS n_types, count(value) AS n_nonnull_values
      FROM events""")
  )

  /** Exact linear-interpolation percentiles per group (rounded to 6 dp so
    * last-ulp interpolation differences can't flip the hash).
    */
  val a11Percentiles: Q = Q(
    "a11_percentiles",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          round(percentile(col("value"), lit(0.25)), 6).as("p25"),
          round(percentile(col("value"), lit(0.5)), 6).as("p50"),
          round(percentile(col("value"), lit(0.75)), 6).as("p75"))
        .orderBy("event_type"),
    Some("""SELECT event_type,
      round(quantile_cont(value, 0.25), 6) AS p25,
      round(quantile_cont(value, 0.5), 6) AS p50,
      round(quantile_cont(value, 0.75), 6) AS p75
      FROM events GROUP BY event_type ORDER BY event_type""")
  )

  /** F8: timezone conversion (`tz_localize`/`tz_convert`,
    * `download_historical_price.py:509-512`). Rows are restricted to
    * January (EST, no DST transition) so the oracle's fixed −5 h offset is
    * exact regardless of the corpus time span.
    */
  val f8Timezone: Q = Q(
    "f8_tz_convert",
    (s, dir) =>
      t(s, dir, "events")
        .filter(
          col("ts") >= lit("2024-01-01").cast("timestamp") &&
            col("ts") < lit("2024-02-01").cast("timestamp"))
        .select(
          col("event_id"), col("ts"),
          from_utc_timestamp(col("ts"), "America/New_York").as("ts_nyc"))
        .orderBy("event_id"),
    Some("""SELECT event_id, ts, ts - INTERVAL 5 HOUR AS ts_nyc
      FROM events WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
        AND ts < TIMESTAMP '2024-02-01 00:00:00'
      ORDER BY event_id""")
  )

  /** U2: insert-if-absent registry growth (`download_historical_price
    * .py:130-144`): existing keys tagged, plus the delta of incoming keys
    * not yet present.
    */
  val u2InsertAbsent: Q = Q(
    "u2_insert_absent",
    (s, dir) => {
      val existing = t(s, dir, "customer")
        .select(col("c_nationkey").as("nationkey")).distinct()
      val incoming = t(s, dir, "supplier")
        .select(col("s_nationkey").as("nationkey")).distinct()
      existing
        .withColumn("src", lit("existing"))
        .unionByName(incoming.except(existing).withColumn("src", lit("inserted")))
        .orderBy("nationkey", "src")
    },
    Some("""WITH existing AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
      incoming AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
      SELECT nationkey, 'existing' AS src FROM existing
      UNION ALL
      SELECT nationkey, 'inserted' AS src
      FROM (SELECT nationkey FROM incoming EXCEPT SELECT nationkey FROM existing)
      ORDER BY nationkey, src""")
  )

  /** V2: schema diff materialized as rows (`compare_parquet.py:47-99` — the
    * 5-way structural comparison, re-expressed as a field-level outer
    * alignment of two live schemas). Oracle-free: the result is driver-side
    * metadata, not DuckDB-reproducible data.
    */
  /** V4: column profiling — the ANALYZE-TABLE shape every warehouse runs
    * before planning: per column, null count / distinct count / min / max,
    * computed in ONE scan (a single multi-expression aggregate, reshaped
    * to rows with `stack`), not one pass per column. String/int columns
    * only — float min/max would hit engine-specific double formatting.
    */
  val v4ColumnProfile: Q = Q(
    "v4_column_profile",
    (s, dir) => {
      val cols = Seq("o_orderstatus", "o_orderpriority", "o_custkey")
      val aggs = cols.flatMap { c =>
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
          countDistinct(col(c)).as(s"${c}_distinct"),
          min(col(c)).cast("string").as(s"${c}_min"),
          max(col(c)).cast("string").as(s"${c}_max"))
      }
      val stackExpr = cols
        .map(c => s"'$c', ${c}_nulls, ${c}_distinct, ${c}_min, ${c}_max")
        .mkString(s"stack(${cols.size}, ", ", ", ")")
      t(s, dir, "orders")
        .agg(aggs.head, aggs.tail: _*)
        .selectExpr(s"$stackExpr AS (column_name, n_nulls, n_distinct, min_s, max_s)")
        .orderBy("column_name")
    },
    Some("""SELECT 'o_custkey' AS column_name,
        CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        count(DISTINCT o_custkey) AS n_distinct,
        CAST(min(o_custkey) AS VARCHAR) AS min_s, CAST(max(o_custkey) AS VARCHAR) AS max_s
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority',
        CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        count(DISTINCT o_orderpriority), min(o_orderpriority), max(o_orderpriority)
      FROM orders
      UNION ALL
      SELECT 'o_orderstatus',
        CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        count(DISTINCT o_orderstatus), min(o_orderstatus), max(o_orderstatus)
      FROM orders
      ORDER BY column_name""")
  )

  /** V2: schema diff as rows. Oracle-checked (round 7, previously
    * rows-only): DuckDB sees the same parquet footers through its
    * registered views, so `DESCRIBE <view>` yields the same field list;
    * the oracle maps DuckDB's type names onto Spark's `simpleString`
    * spelling (BIGINT→bigint, VARCHAR→string, TIMESTAMP→timestamp_ntz —
    * the corpus timestamps are parquet µs `isAdjustedToUTC=false`, which
    * Spark 4 infers as TIMESTAMP_NTZ). `dtypes.json` written by Verify
    * guards the mapping against reader-inference drift.
    */
  val v2SchemaDiff: Q = Q(
    "v2_schema_diff",
    (s, dir) => {
      val a = t(s, dir, "orders").schema
      val b = t(s, dir, "lineitem").schema
      val fields = (a.fields.map(f => (f.name, f.dataType.simpleString, "orders")) ++
        b.fields.map(f => (f.name, f.dataType.simpleString, "lineitem")))
      import s.implicits._
      val rows = fields.toSeq.toDF("field", "dtype", "side")
      rows
        .groupBy("field", "dtype")
        .agg(
          max(when(col("side") === "orders", lit(true)).otherwise(lit(false))).as("in_orders"),
          max(when(col("side") === "lineitem", lit(true)).otherwise(lit(false))).as("in_lineitem"))
        .orderBy("field", "dtype")
    },
    Some("""WITH cols AS (
        SELECT column_name AS field, column_type AS dt,
               true AS in_o, false AS in_l FROM (DESCRIBE orders)
        UNION ALL
        SELECT column_name, column_type, false, true FROM (DESCRIBE lineitem))
      SELECT field,
        CASE dt WHEN 'BIGINT' THEN 'bigint' WHEN 'INTEGER' THEN 'int'
                WHEN 'VARCHAR' THEN 'string' WHEN 'DOUBLE' THEN 'double'
                WHEN 'TIMESTAMP' THEN 'timestamp_ntz' WHEN 'DATE' THEN 'date'
                WHEN 'FLOAT' THEN 'float' WHEN 'BOOLEAN' THEN 'boolean'
                WHEN 'SMALLINT' THEN 'smallint' WHEN 'TINYINT' THEN 'tinyint'
                ELSE lower(dt) END AS dtype,
        bool_or(in_o) AS in_orders, bool_or(in_l) AS in_lineitem
      FROM cols GROUP BY field, dt ORDER BY field, dtype""")
  )

  /** S10/O4: file-listing source — the `glob("*.parquet") → latest N`
    * inspection path (`parquet_details.py:15-23`) via Spark's binaryFile
    * metadata source (no content read; `PathFilter` prunes at listing
    * time).
    *
    * Oracle-checked (round 7, previously rows-only): DuckDB's
    * `read_blob()` exposes `size` and `last_modified` for the same files.
    * Its `last_modified` carries SECOND precision, so the engine
    * truncates `modificationTime` to seconds too and both engines break
    * the resulting ties deterministically on `table_name` — without the
    * truncation Spark would order by millisecond mtimes DuckDB cannot
    * see. read_blob is the one DuckDB table function that can see the
    * filesystem, and it takes a literal path, not a registered view — so
    * the oracle carries the `__GRAFT_SF_DIR__` placeholder that
    * [[graft.Verify]] substitutes with the corpus dir under test at dump
    * time (r8: previously pinned to sf0.01, which made every other leg of
    * the determinism matrix flag o4 by construction).
    */
  val o4FileListing: Q = Q(
    "o4_file_listing",
    (s, dir) =>
      s.read
        .format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(dir)
        .select(
          regexp_extract(col("path"), "([^/]+)\\.parquet$", 1).as("table_name"),
          col("length").as("file_bytes"),
          date_trunc("second", col("modificationTime")).as("mts"))
        .orderBy(col("mts").desc, col("table_name"))
        .limit(5)
        .select("table_name", "file_bytes"),
    Some("""SELECT regexp_extract(filename, '([^/]+)\.parquet$', 1) AS table_name,
        size AS file_bytes
      FROM read_blob('__GRAFT_SF_DIR__/*.parquet')
      ORDER BY last_modified DESC, table_name LIMIT 5""")
  )

  /** M1: multimodal binary plumbing — opaque bytes column + typed metadata
    * extraction (byte length, header bytes as hex, content hash). The
    * "media" here is the utf-8 encoding of `text` (the container ships no
    * image/audio codecs — see `graft.operators.Multimodal` for the stubbed
    * decode path); the Spark-side schema/expression plumbing is real.
    */
  val m1BinaryMeta: Q = Q(
    "m1_binary_meta",
    (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
        .select(
          col("doc_id"),
          octet_length(col("media")).cast("long").as("n_bytes"),
          hex(substring(col("media"), 1, 8)).as("header_hex"),
          md5(col("media")).as("content_md5"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
      octet_length(encode(text)) AS n_bytes,
      hex(encode(substr(text, 1, 8))) AS header_hex,
      md5(text) AS content_md5
      FROM documents ORDER BY doc_id""")
  )

  /** V5: cross-source duplicate overlap — the provenance audit next to
    * c4's split audit: for every pair of sources, how many canonical
    * fingerprints they share and how many document PAIRS that implies
    * (which feeds tell you the same thing — the census behind source
    * weighting and crawl dedup decisions). Scale shape: documents
    * collapse to per-(fp, source) GROUP COUNTS first, and the self-join
    * multiplies counts — doc×doc duplicate pairs never materialize, so a
    * 10 k-copy boilerplate fingerprint costs one row per source, not 10 k²
    * join rows.
    */
  val v5SourceOverlap: Q = Q(
    "v5_source_overlap",
    (s, dir) => {
      import graft.functions.Text
      val fpsrc = t(s, dir, "documents")
        .select(col("source"),
          Text.prefixFingerprint(Text.tokens(col("text")), 8).as("fp"))
        .groupBy("fp", "source")
        .agg(count(lit(1)).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      fpsrc.count() // eager: both self-join sides scan this one census
      val a = fpsrc.select(col("fp"), col("source").as("src_a"), col("c").as("ca"))
      val b = fpsrc.select(col("fp"), col("source").as("src_b"), col("c").as("cb"))
      a.join(b, Seq("fp"))
        .filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(count(lit(1)).as("shared_fps"),
          sum(col("ca") * col("cb")).as("doc_pairs"))
        .orderBy("src_a", "src_b")
    },
    Some("""WITH fpsrc AS (
        SELECT md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS fp,
               source, count(*) AS c
        FROM documents GROUP BY 1, 2)
      SELECT a.source AS src_a, b.source AS src_b,
        count(*) AS shared_fps,
        CAST(sum(a.c * b.c) AS BIGINT) AS doc_pairs
      FROM fpsrc a JOIN fpsrc b ON a.fp = b.fp AND a.source < b.source
      GROUP BY 1, 2 ORDER BY 1, 2""")
  )

  /** V6: shard-skew audit — the straggler detector every sharded training
    * job needs: per shard (x9's `doc_id mod 8` assignment), document and
    * token totals, the load factor (shard tokens ÷ perfectly-balanced
    * share — 1.0 is ideal, the max is the straggler multiplier), and the
    * Lorenz cumulative share (ascending-load order) whose deviation from
    * the diagonal is the Gini skew picture. The corpus is scanned ONCE
    * into the 8-row per-shard census (persisted); every metric after that
    * is arithmetic on 8 rows — the audit stays O(shards) at 100 TB, and
    * the 8-row window is bounded by the shard count, not the data. All
    * ratios are exact-long products/sums divided once at the end, so both
    * engines emit identical doubles.
    */
  val v6ShardSkew: Q = Q(
    "v6_shard_skew",
    (s, dir) => {
      import graft.functions.Text
      val perShard = t(s, dir, "documents")
        .select(pmod(col("doc_id"), lit(8)).cast("int").as("shard"),
          size(Text.tokens(col("text"))).as("n_tokens"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("shard_tokens"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      perShard.count() // totals and the final select both scan it
      val tot = perShard.agg(sum(col("shard_tokens")).as("total"),
        count(lit(1)).as("n_shards"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("shard_tokens"), col("shard"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      perShard.crossJoin(broadcast(tot))
        .select(col("shard"), col("n_docs"), col("shard_tokens"),
          ((col("shard_tokens") * col("n_shards")).cast("double") / col("total"))
            .as("load_factor"),
          (sum(col("shard_tokens")).over(w).cast("double") / col("total"))
            .as("cum_share"))
        .orderBy("shard")
    },
    Some("""WITH d AS (SELECT doc_id % 8 AS shard,
        len(string_split(text, ' ')) AS n_tokens FROM documents),
      ps AS (SELECT CAST(shard AS INT) AS shard, count(*) AS n_docs,
          CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
        FROM d GROUP BY 1),
      tot AS (SELECT CAST(sum(shard_tokens) AS BIGINT) AS total,
          count(*) AS n_shards FROM ps)
      SELECT shard, n_docs, shard_tokens,
        CAST(shard_tokens * n_shards AS DOUBLE) / total AS load_factor,
        CAST(sum(shard_tokens) OVER (ORDER BY shard_tokens, shard
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / total
          AS cum_share
      FROM ps CROSS JOIN tot ORDER BY shard""")
  )

  /** V7: per-source data card — the datasheet table published alongside a
    * corpus release (Gebru et al. 2021, "Datasheets for Datasets"; every
    * open-corpus paper ships one): for each source, document and token
    * totals, language spread, exact-duplicate rate (via d1's opening-phrase
    * fingerprint), and the short-document fraction — the five numbers a
    * consumer checks before training on a slice.
    *
    * One hash aggregate on source over a narrow projection; the dup rate
    * rides the same pass as a count(DISTINCT fp) (Spark plans the distinct
    * as a partial expand, still map-side combinable). O(sources) output —
    * at 100 TB the answer is still twenty rows.
    */
  val v7DataCard: Q = Q(
    "v7_data_card",
    (s, dir) => {
      import graft.functions.Text
      val toks = Text.tokens(col("text"))
      t(s, dir, "documents")
        .select(col("source"), col("lang"),
          size(toks).as("n_tokens"),
          Text.prefixFingerprint(toks, 8).as("fp"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("fp")).as("n_distinct_fp"),
          sum(when(col("n_tokens") < 20, 1L).otherwise(0L)).as("n_short"))
        .select(col("source"), col("n_docs"), col("total_tokens"),
          col("n_langs"),
          (lit(1.0) - col("n_distinct_fp").cast("double") / col("n_docs"))
            .as("dup_rate"),
          (col("n_short").cast("double") / col("n_docs")).as("short_frac"))
        .orderBy("source")
    },
    Some("""WITH d AS (SELECT source, lang,
        len(string_split(text, ' ')) AS n_tokens,
        md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS fp
      FROM documents)
      SELECT source, count(*) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        count(DISTINCT lang) AS n_langs,
        1.0 - CAST(count(DISTINCT fp) AS DOUBLE) / count(*) AS dup_rate,
        CAST(sum(CASE WHEN n_tokens < 20 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
          AS short_frac
      FROM d GROUP BY source ORDER BY source""")
  )

  /** V8: pipeline-yield funnel — the release-note table every corpus build
    * publishes: how many documents each admission gate dropped, in gate
    * order (language allowlist → length floor → type-token-ratio quality
    * floor → prefix-fingerprint dedup), with per-stage yield. Each doc is
    * attributed to its FIRST failing gate; the dedup gate keeps the
    * minimum-doc_id representative among docs that survived the earlier
    * gates (a later-gate reject must not steal a dup group's canonical
    * slot — the conditional window min encodes exactly that).
    *
    * Scale: one corpus scan computes every flag; the only shuffle is the
    * fingerprint window; the funnel itself is a single-row aggregate
    * unpivoted with `stack`. Yield divisions are the same IEEE long/long
    * divide on both engines.
    */
  val v8PipelineYield: Q = Q(
    "v8_pipeline_yield",
    (s, dir) => {
      import graft.functions.Text
      val toks = Text.tokens(col("text"))
      val base = t(s, dir, "documents")
        .select(col("doc_id"),
          col("lang").isin("en", "de", "es", "fr", "zh").as("p1"),
          (size(toks) >= 20).as("p2"),
          (size(array_distinct(toks)).cast("double") / size(toks) >= 0.35).as("p3"),
          Text.prefixFingerprint(toks, 8).as("fp"))
      val wfp = org.apache.spark.sql.expressions.Window.partitionBy("fp")
      val ff = base
        .withColumn("canon",
          min(when(col("p1") && col("p2") && col("p3"), col("doc_id"))).over(wfp))
        .select(
          when(!col("p1"), 1).when(!col("p2"), 2).when(!col("p3"), 3)
            .when(col("doc_id") =!= col("canon"), 4).otherwise(5).as("first_fail"))
      ff.agg(
          count(lit(1)).as("n"),
          sum(when(col("first_fail") === 1, 1L).otherwise(0L)).as("d1"),
          sum(when(col("first_fail") === 2, 1L).otherwise(0L)).as("d2"),
          sum(when(col("first_fail") === 3, 1L).otherwise(0L)).as("d3"),
          sum(when(col("first_fail") === 4, 1L).otherwise(0L)).as("d4"))
        .selectExpr(
          """stack(4,
               '1_lang',    n,              d1,
               '2_length',  n - d1,         d2,
               '3_quality', n - d1 - d2,    d3,
               '4_dedup',   n - d1 - d2 - d3, d4) AS (stage, n_in, n_dropped)""")
        .select(col("stage"), col("n_in"), col("n_dropped"),
          (col("n_in") - col("n_dropped")).as("n_out"),
          ((col("n_in") - col("n_dropped")).cast("double") / col("n_in"))
            .as("yield_frac"))
        .orderBy("stage")
    },
    Some("""WITH base AS (
        SELECT doc_id,
          lang IN ('en','de','es','fr','zh') AS p1,
          len(string_split(text, ' ')) >= 20 AS p2,
          CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / len(string_split(text, ' ')) >= 0.35 AS p3,
          md5(array_to_string((string_split(text, ' '))[1:8], ' ')) AS fp
        FROM documents),
      canon AS (
        SELECT *, min(CASE WHEN p1 AND p2 AND p3 THEN doc_id END)
                    OVER (PARTITION BY fp) AS canon
        FROM base),
      ff AS (
        SELECT CASE WHEN NOT p1 THEN 1 WHEN NOT p2 THEN 2 WHEN NOT p3 THEN 3
                    WHEN doc_id <> canon THEN 4 ELSE 5 END AS first_fail
        FROM canon),
      agg AS (
        SELECT count(*) AS n,
          CAST(sum(CASE WHEN first_fail = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
          CAST(sum(CASE WHEN first_fail = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
          CAST(sum(CASE WHEN first_fail = 3 THEN 1 ELSE 0 END) AS BIGINT) AS d3,
          CAST(sum(CASE WHEN first_fail = 4 THEN 1 ELSE 0 END) AS BIGINT) AS d4
        FROM ff),
      st AS (
        SELECT '1_lang' AS stage, n AS n_in, d1 AS n_dropped FROM agg
        UNION ALL SELECT '2_length', n - d1, d2 FROM agg
        UNION ALL SELECT '3_quality', n - d1 - d2, d3 FROM agg
        UNION ALL SELECT '4_dedup', n - d1 - d2 - d3, d4 FROM agg)
      SELECT stage, n_in, n_dropped, n_in - n_dropped AS n_out,
        CAST(n_in - n_dropped AS DOUBLE) / n_in AS yield_frac
      FROM st ORDER BY stage""")
  )

  /** V9: data-quality expectations audit — the Deequ-style constraint
    * suite a pipeline runs before publishing a table: key uniqueness,
    * completeness, accepted value domains, numeric ranges, and referential
    * integrity, each emitted as one (table, check, n_checked, n_violations,
    * status) row. The events accepted-values domain deliberately EXCLUDES
    * the corpus's 'error' type, so the report demonstrably catches a
    * violation class instead of rubber-stamping everything green.
    *
    * Scale: every row-local constraint family is ONE multi-expression
    * aggregate over its table (all counters map-side combinable), the two
    * referential checks are anti-join counts on the key, and the five
    * resulting 1-row aggregates assemble into a single row (1-row cross
    * joins are broadcast-trivial) that ONE `stack` unpivots — so each
    * table is scanned once per role it plays (orders: own audit, RI fact,
    * RI dim), never once per constraint. All counters are integer-exact.
    */
  val v9Expectations: Q = Q(
    "v9_expectations",
    (s, dir) => {
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val ordAgg = ord.agg(
        count(lit(1)).as("ord_n"),
        countDistinct(col("o_orderkey")).as("ord_nd"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("ord_nnull"),
        sum(when(col("o_orderstatus").isin("F", "O", "P"), 0L).otherwise(1L))
          .as("ord_nbad"))
      val liAgg = li.agg(
        count(lit(1)).as("li_n"),
        countDistinct(col("l_orderkey"), col("l_linenumber")).as("li_nd"),
        sum(when(col("l_quantity") < 1.0 || col("l_quantity") > 50.0, 1L)
          .otherwise(0L)).as("li_nqty"),
        sum(when(col("l_discount") < 0.0 || col("l_discount") > 0.1, 1L)
          .otherwise(0L)).as("li_ndisc"))
      val evAgg = t(s, dir, "events").agg(
        count(lit(1)).as("ev_n"),
        sum(when(col("event_type").isin("click", "view", "purchase", "signup"),
          0L).otherwise(1L)).as("ev_nbad"))
      val ri1 = ord
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"),
          "left_anti")
        .agg(count(lit(1)).as("ri1_v"))
      val ri2 = li
        .join(ord, col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("ri2_v"))
      ordAgg.crossJoin(liAgg).crossJoin(evAgg).crossJoin(ri1).crossJoin(ri2)
        .selectExpr("""stack(9,
            'orders',   'o_orderkey.unique',            ord_n, ord_n - ord_nd,
            'orders',   'o_custkey.complete',           ord_n, ord_nnull,
            'orders',   'o_orderstatus.accepted_values', ord_n, ord_nbad,
            'orders',   'o_custkey.ref_customer',       ord_n, ri1_v,
            'lineitem', 'pk.unique',                    li_n,  li_n - li_nd,
            'lineitem', 'l_quantity.range_1_50',        li_n,  li_nqty,
            'lineitem', 'l_discount.range_0_01',        li_n,  li_ndisc,
            'lineitem', 'l_orderkey.ref_orders',        li_n,  ri2_v,
            'events',   'event_type.accepted_values',   ev_n,  ev_nbad)
            AS (tbl, check_name, n_checked, n_violations)""")
        .withColumn("status",
          when(col("n_violations") === 0, lit("pass")).otherwise(lit("fail")))
        .orderBy("tbl", "check_name")
    },
    Some("""WITH ord AS (SELECT count(*) AS n, count(DISTINCT o_orderkey) AS nd,
          CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nnull,
          CAST(sum(CASE WHEN o_orderstatus IN ('F','O','P') THEN 0 ELSE 1 END) AS BIGINT) AS nbad
        FROM orders),
      li AS (SELECT count(*) AS n, count(DISTINCT (l_orderkey, l_linenumber)) AS nd,
          CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS nqty,
          CAST(sum(CASE WHEN l_discount < 0 OR l_discount > CAST(0.1 AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT) AS ndisc
        FROM lineitem),
      ev AS (SELECT count(*) AS n,
          CAST(sum(CASE WHEN event_type IN ('click','view','purchase','signup') THEN 0 ELSE 1 END) AS BIGINT) AS nbad
        FROM events),
      rws AS (
        SELECT 'orders' AS tbl, 'o_orderkey.unique' AS check_name, n AS n_checked, n - nd AS n_violations FROM ord
        UNION ALL SELECT 'orders', 'o_custkey.complete', n, nnull FROM ord
        UNION ALL SELECT 'orders', 'o_orderstatus.accepted_values', n, nbad FROM ord
        UNION ALL SELECT 'lineitem', 'pk.unique', n, n - nd FROM li
        UNION ALL SELECT 'lineitem', 'l_quantity.range_1_50', n, nqty FROM li
        UNION ALL SELECT 'lineitem', 'l_discount.range_0_01', n, ndisc FROM li
        UNION ALL SELECT 'events', 'event_type.accepted_values', n, nbad FROM ev
        UNION ALL SELECT 'orders', 'o_custkey.ref_customer', (SELECT n FROM ord),
          (SELECT count(*) FROM orders o WHERE NOT EXISTS
             (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        UNION ALL SELECT 'lineitem', 'l_orderkey.ref_orders', (SELECT n FROM li),
          (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
             (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)))
      SELECT tbl, check_name, n_checked, n_violations,
        CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS status
      FROM rws ORDER BY tbl, check_name""")
  )

  /** V10: population-stability-index drift monitor — the
    * distribution-shift alarm a production pipeline runs between a
    * reference window and the current one ("did order values shift since
    * H1?"): fixed price buckets, Laplace-smoothed shares on each side,
    * and the per-bucket PSI contribution `(p−q)·ln(p/q)` (industry rule
    * of thumb: Σ > 0.2 = significant drift).
    *
    * Exactness: counts are integers; each output row does ONE smoothed
    * share division per side and ONE `ln` on bit-identical doubles — the
    * bucket contributions are emitted as rows, never float-summed, so
    * there is no association order to drift. Rounded to 6dp.
    *
    * Scale: one map-side-combinable groupBy on the 10 fixed buckets; the
    * totals window runs over those 10 rows (bounded at any corpus size —
    * the deliberate unpartitioned-window shape). Nothing but (bucket,
    * long, long) triples ever shuffles.
    */
  val v10PsiDrift: Q = Q(
    "v10_psi_drift",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy()
      val split = lit("1998-07-01 00:00:00").cast("timestamp")
      val pd = (col("n_p") + lit(1.0)) / (col("tot_p") + lit(10.0))
      val qd = (col("n_q") + lit(1.0)) / (col("tot_q") + lit(10.0))
      t(s, dir, "orders")
        .select(
          least(lit(9L), floor(col("o_totalprice") / 50000).cast("long")).as("bucket"),
          (col("o_orderdate") < split).as("isp"))
        .groupBy("bucket")
        .agg(sum(when(col("isp"), 1L).otherwise(0L)).as("n_p"),
          sum(when(col("isp"), 0L).otherwise(1L)).as("n_q"))
        .withColumn("tot_p", sum(col("n_p")).over(w))
        .withColumn("tot_q", sum(col("n_q")).over(w))
        .select(col("bucket"), col("n_p"), col("n_q"),
          round((pd - qd) * log(pd / qd), 6).as("psi_r6"))
        .orderBy("bucket")
    },
    Some("""WITH b AS (SELECT least(9, CAST(floor(o_totalprice / 50000) AS BIGINT)) AS bucket,
               o_orderdate < TIMESTAMP '1998-07-01 00:00:00' AS isp
             FROM orders),
      c AS (SELECT bucket,
              CAST(sum(CASE WHEN isp THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
              CAST(sum(CASE WHEN isp THEN 0 ELSE 1 END) AS BIGINT) AS n_q
            FROM b GROUP BY bucket),
      w AS (SELECT bucket, n_p, n_q,
              CAST(sum(n_p) OVER () AS BIGINT) AS tot_p,
              CAST(sum(n_q) OVER () AS BIGINT) AS tot_q
            FROM c)
      SELECT bucket, n_p, n_q,
        round(((n_p + 1.0) / (tot_p + 10.0) - (n_q + 1.0) / (tot_q + 10.0))
          * ln(((n_p + 1.0) / (tot_p + 10.0)) / ((n_q + 1.0) / (tot_q + 10.0))), 6)
          AS psi_r6
      FROM w ORDER BY bucket""")
  )

  /** V11: per-stream freshness audit — the staleness monitor an ingest
    * fleet runs before publishing ("how far behind the newest landed data
    * is each stream, and is it still flowing"): per event-type last-seen
    * timestamp, its lag in seconds behind the GLOBAL high-water mark, and
    * recent-window liveness (events in the trailing 7 days before the
    * watermark).
    *
    * Exactness: all lag arithmetic is integer epoch-seconds (`floor ∘
    * epoch` on the same µs timestamps in both engines); liveness counts
    * are integers.
    *
    * Scale: one map-side-combinable groupBy on the stream key carrying
    * (max-ts, count) partials; the global watermark is a scalar over the
    * ALREADY-AGGREGATED per-stream rows (bounded by stream cardinality,
    * not corpus size) via an unpartitioned window over that tiny set. The
    * fact table is scanned twice — the 7-day liveness cut needs the
    * watermark, which doesn't exist until the first aggregate finishes —
    * but the second scan filters against the BROADCAST per-stream
    * watermark table, so it carries no extra shuffle of fact rows (a
    * single-scan formulation would have to shuffle every event's
    * timestamp to a global reducer before knowing the cutoff).
    */
  val v11Freshness: Q = Q(
    "v11_freshness",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy()
      val per = t(s, dir, "events")
        .select(col("event_type"),
          unix_timestamp(col("ts")).as("es"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), max(col("es")).as("last_es"))
      val wm = per.withColumn("wm_es", max(col("last_es")).over(w))
      val recent = t(s, dir, "events")
        .select(col("event_type"),
          unix_timestamp(col("ts")).as("es"))
        .join(broadcast(wm.select(col("event_type"), col("wm_es"))), Seq("event_type"))
        .filter(col("es") >= col("wm_es") - lit(7L * 86400))
        .groupBy("event_type").agg(count(lit(1)).as("n_recent_7d"))
      wm.join(recent, Seq("event_type"), "left")
        .select(col("event_type"), col("n_events"),
          (col("wm_es") - col("last_es")).as("lag_s"),
          coalesce(col("n_recent_7d"), lit(0L)).as("n_recent_7d"),
          when(col("wm_es") - col("last_es") <= 86400, lit("fresh"))
            .otherwise(lit("stale")).as("status"))
        .orderBy("event_type")
    },
    Some("""WITH e AS (SELECT event_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
      per AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
                     max(es) AS last_es
              FROM e GROUP BY event_type),
      wm AS (SELECT *, max(last_es) OVER () AS wm_es FROM per),
      rec AS (SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_recent_7d
              FROM e JOIN wm ON wm.event_type = e.event_type
              WHERE e.es >= wm.wm_es - 7 * 86400
              GROUP BY e.event_type)
      SELECT w.event_type, w.n_events, w.wm_es - w.last_es AS lag_s,
             coalesce(r.n_recent_7d, 0) AS n_recent_7d,
             CASE WHEN w.wm_es - w.last_es <= 86400 THEN 'fresh'
                  ELSE 'stale' END AS status
      FROM wm w LEFT JOIN rec r ON r.event_type = w.event_type
      ORDER BY w.event_type""")
  )

  /** P15: Z-order data layout manifest — the multi-dimensional file-
    * skipping technique (bit-interleaved sort keys, as in Delta's
    * OPTIMIZE ZORDER) evaluated against the naive single-key layout on
    * the same table. Rows are tiled by the interleaving of two bucketed
    * dimensions (256 z-buckets = aligned 16×16 tiles of the dim plane);
    * the manifest reports each target file's min/max on BOTH dims — the
    * row-group stats a scan would prune on — plus whether a fixed 2-D
    * box probe (px∈[32,47] ∧ sy∈[64,79]) must read that file. Under
    * z-order the box touches the few tiles it overlaps; under the
    * single-key sort every probe on the second dim reads every matching
    * first-dim file in full.
    *
    * Scale: the z-value is pure codegen bit arithmetic in the scan
    * projection; the manifest is ONE map-side-combinable aggregate on
    * ≤512 (layout, bucket) cells. In production the same `z div W`
    * expression drives `repartitionByRange(z)` at write time, so this
    * query IS the layout's cost model: min/max spans shrink on both
    * dims, and the probe-hit column is the file-skip decision.
    */
  /** 16-bit Morton interleave of two 8-bit dims: px bit i → z bit 2i,
    * sy bit i → z bit 2i+1. Pure codegen bit arithmetic; the identity
    * `zInterleave8(px, sy) div 256 == zInterleave8(px div 16, sy div 16)`
    * (PropertySpec) is what makes each 256-z-value bucket an ALIGNED
    * 16×16 tile of the dim plane — the file-skipping guarantee.
    */
  private[graft] def zInterleave8(px: org.apache.spark.sql.Column,
      sy: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 8).map { i =>
      shiftleft(px.bitwiseAND(lit(1L << i)), i) +
        shiftleft(sy.bitwiseAND(lit(1L << i)), i + 1)
    }.reduce(_ + _)

  val p15ZorderLayout: Q = Q(
    "p15_zorder_layout",
    (s, dir) => {
      val base = t(s, dir, "lineitem")
        .select((col("l_partkey") % 256).as("px"), (col("l_suppkey") % 256).as("sy"))
        .withColumn("z", zInterleave8(col("px"), col("sy")))
      def manifest(tagged: org.apache.spark.sql.DataFrame) = tagged
        .groupBy("layout", "bucket_id")
        .agg(count(lit(1)).as("n_rows"),
          min(col("px")).as("min_px"), max(col("px")).as("max_px"),
          min(col("sy")).as("min_sy"), max(col("sy")).as("max_sy"))
      val z = manifest(base.select(lit("zorder").as("layout"),
        expr("z div 256").as("bucket_id"), col("px"), col("sy")))
      val naive = manifest(base.select(lit("rowkey").as("layout"),
        col("px").as("bucket_id"), col("px"), col("sy")))
      z.unionByName(naive)
        .withColumn("probe_hit",
          when(col("max_px") >= 32 && col("min_px") <= 47 &&
            col("max_sy") >= 64 && col("min_sy") <= 79, 1L).otherwise(0L))
        .orderBy("layout", "bucket_id")
    },
    Some {
      val sqlZ = (0 until 8).map { i =>
        s"(((l_partkey % 256) & ${1L << i}) << $i) + (((l_suppkey % 256) & ${1L << i}) << ${i + 1})"
      }.mkString(" + ")
      s"""WITH base AS (
          SELECT l_partkey % 256 AS px, l_suppkey % 256 AS sy, ($sqlZ) AS z
          FROM lineitem),
        m AS (
          SELECT 'zorder' AS layout, z // 256 AS bucket_id,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 min(px) AS min_px, max(px) AS max_px,
                 min(sy) AS min_sy, max(sy) AS max_sy
          FROM base GROUP BY 1, 2
          UNION ALL
          SELECT 'rowkey', px, CAST(count(*) AS BIGINT),
                 min(px), max(px), min(sy), max(sy)
          FROM base GROUP BY 1, 2)
        SELECT layout, bucket_id, n_rows, min_px, max_px, min_sy, max_sy,
               CAST(CASE WHEN max_px >= 32 AND min_px <= 47
                          AND max_sy >= 64 AND min_sy <= 79
                         THEN 1 ELSE 0 END AS BIGINT) AS probe_hit
        FROM m ORDER BY layout, bucket_id"""
    }
  )

  /** P18: layout cost model over a PROBE WORKLOAD — p15 generalized from
    * one box probe to the decision a table owner actually makes: given
    * eight deterministic 16×16 box probes over (px, sy), how many bucket
    * reads and rows does each candidate layout force? Three layouts
    * compete on identical data: z-order tiles (`z div 256` — aligned
    * 16×16 tiles), px single-key, and sy single-key. A bucket is READ by
    * a probe iff its (min, max) envelope on both dims overlaps the box —
    * exactly the row-group zone-map pruning rule — and the layout's cost
    * is Σ rows over (probe, bucket-hit) pairs. The single-key layouts win
    * probes aligned to their own key and read ~everything for the other
    * dim; z-order pays a small bounded overhead on both — the read_pm
    * column IS the file-skipping argument for multi-dimensional layout
    * at 100 TB, computed from the table's own stats.
    *
    * Exactness: all counts are BIGINTs; read_pm is one floor division of
    * non-negative longs (Spark `div` ≡ DuckDB `//`); the probe set is
    * the same 8 literal rows inlined into both engines.
    *
    * Scale: one narrow codegen projection builds (px, sy, z) once
    * (persisted — three manifests scan it); each manifest is a
    * map-side-combinable ≤256-cell aggregate; the probe join is an 8-row
    * broadcast against ≤768 manifest cells; the rollup is O(layouts).
    */
  val p18LayoutCost: Q = {
    val probes: Seq[(Int, Int, Int, Int, Int)] = (0 until 8).map { j =>
      val pxlo = 16 * ((5 * j) % 16)
      val sylo = 16 * ((7 * j) % 16)
      (j, pxlo, pxlo + 15, sylo, sylo + 15)
    }
    Q(
      "p18_layout_cost",
      (s, dir) => {
        import s.implicits._
        val base = t(s, dir, "lineitem")
          .select((col("l_partkey") % 256).as("px"), (col("l_suppkey") % 256).as("sy"))
          .withColumn("z", zInterleave8(col("px"), col("sy")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nTotal = base.count() // eager: three manifests + the total
        def manifest(layout: String, bucket: org.apache.spark.sql.Column) = base
          .select(lit(layout).as("layout"), bucket.as("b"), col("px"), col("sy"))
          .groupBy("layout", "b")
          .agg(count(lit(1)).as("n_rows"),
            min(col("px")).as("min_px"), max(col("px")).as("max_px"),
            min(col("sy")).as("min_sy"), max(col("sy")).as("max_sy"))
        val m = manifest("zorder", expr("z div 256"))
          .unionByName(manifest("px_key", col("px")))
          .unionByName(manifest("sy_key", col("sy")))
        val p = probes.toDF("pid", "pxlo", "pxhi", "sylo", "syhi")
        m.join(broadcast(p),
            col("max_px") >= col("pxlo") && col("min_px") <= col("pxhi") &&
              col("max_sy") >= col("sylo") && col("min_sy") <= col("syhi"))
          .groupBy("layout")
          .agg(count(lit(1)).as("buckets_read"),
            sum(col("n_rows")).cast("long").as("rows_read"))
          .select(col("layout"), col("buckets_read"), col("rows_read"),
            expr(s"(1000 * rows_read) div ${nTotal * probes.size}").as("read_pm"))
          .orderBy("layout")
      },
      Some {
        val sqlZ = (0 until 8).map { i =>
          s"(((l_partkey % 256) & ${1L << i}) << $i) + (((l_suppkey % 256) & ${1L << i}) << ${i + 1})"
        }.mkString(" + ")
        val vals = probes
          .map { case (j, a, b, c, d) => s"($j, $a, $b, $c, $d)" }.mkString(", ")
        s"""WITH base AS (
            SELECT l_partkey % 256 AS px, l_suppkey % 256 AS sy, ($sqlZ) AS z
            FROM lineitem),
          m AS (
            SELECT 'zorder' AS layout, z // 256 AS b,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   min(px) AS min_px, max(px) AS max_px,
                   min(sy) AS min_sy, max(sy) AS max_sy
            FROM base GROUP BY 1, 2
            UNION ALL
            SELECT 'px_key', px, CAST(count(*) AS BIGINT),
                   min(px), max(px), min(sy), max(sy)
            FROM base GROUP BY 1, 2
            UNION ALL
            SELECT 'sy_key', sy, CAST(count(*) AS BIGINT),
                   min(px), max(px), min(sy), max(sy)
            FROM base GROUP BY 1, 2),
          probes(pid, pxlo, pxhi, sylo, syhi) AS (VALUES $vals),
          hits AS (SELECT m.layout, m.n_rows FROM m JOIN probes p
                   ON m.max_px >= p.pxlo AND m.min_px <= p.pxhi
                  AND m.max_sy >= p.sylo AND m.min_sy <= p.syhi),
          tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM base)
          SELECT layout, count(*) AS buckets_read,
            CAST(sum(n_rows) AS BIGINT) AS rows_read,
            (1000 * CAST(sum(n_rows) AS BIGINT))
              // (SELECT n_total * 8 FROM tot) AS read_pm
          FROM hits GROUP BY layout ORDER BY layout"""
      }
    )
  }

  /** Unrolled DuckDB mirror of [[graft.functions.GraftCurve.hilbertXY2D]]
    * at 8 bits: one CTE per curve level carrying the rotation state
    * (hx, hy) and the accumulated index hd — the quadrant contribution
    * `s² · ((3·rx) XOR ry)` plus the conditional flip-and-swap, exactly
    * the loop body the codegen expression runs (FastCurveSpec pins the
    * two equal on the full 256×256 grid through this same unroll shape).
    * `carry` lists the columns to thread through unchanged.
    */
  private def sqlHilbertCtes(fromCte: String, carry: String): String = {
    val init =
      s"h_init AS (SELECT $carry, px AS hx, sy AS hy, CAST(0 AS BIGINT) AS hd FROM $fromCte)"
    val steps = (0 until 8).map { k =>
      val sBit = 1L << (7 - k)
      val s2 = sBit * sBit
      val prev = if (k == 0) "h_init" else s"h${k - 1}"
      s"""h$k AS (
        SELECT $carry,
          hd + $s2 * xor(3 * rx, ry) AS hd,
          CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${sBit - 1} - hy ELSE hy END)
               ELSE hx END AS hx,
          CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${sBit - 1} - hx ELSE hx END)
               ELSE hy END AS hy
        FROM (SELECT *, CASE WHEN (hx & $sBit) > 0 THEN 1 ELSE 0 END AS rx,
                        CASE WHEN (hy & $sBit) > 0 THEN 1 ELSE 0 END AS ry FROM $prev))"""
    }
    (init +: steps).mkString(",\n      ")
  }

  /** P19: Hilbert-curve layout vs z-order — the SEEK-count half of the
    * multi-dimensional layout decision p18's cost model prices in bytes.
    * Both curves tile (px, sy) into the SAME aligned 16×16 tiles at
    * `div 256` (FastCurveSpec proves the Hilbert prefix property), so
    * zone-map pruning reads the identical tile set for every probe —
    * `buckets_read` and `rows_read` come out EQUAL by construction, and
    * the column that differs is `n_runs`: the number of CONTIGUOUS
    * bucket-id ranges a probe's tile set fragments into, i.e. how many
    * separate range reads (seeks) the storage layer issues for the same
    * bytes. The Hilbert walk is adjacency-preserving (consecutive ids are
    * always grid neighbors), so a 2-D box's tiles coalesce into ~half the
    * runs Morton's power-of-two jumps leave (25 vs 46 on this workload) —
    * the published reason Iceberg/Delta offer Hilbert next to Morton, here
    * computed from the table's own stats.
    *
    * Exactness: the curve index is pure integer arithmetic (codegen
    * expression vs the oracle's unrolled CTE chain — bit-identical);
    * run detection is a lag-compare on integer bucket ids; all counts are
    * BIGINTs.
    *
    * Scale: one narrow codegen projection builds (px, sy, z, h) once
    * (persisted — two manifests scan it); manifests are map-side-
    * combinable ≤512-cell aggregates; the probe join is an 8-row
    * broadcast; the runs window orders ≤96 hit rows per (layout, probe).
    * In production the same `h div W` drives `repartitionByRange` at
    * write time — identical skipping, half the seeks per probe.
    */
  val p19HilbertLayout: Q = {
    // 40×56 boxes offset 8 off the tile grid: each overlaps 3×4 = 12
    // aligned tiles, so the tile SET matches across curves and only the
    // id ORDER (run structure) differs.
    val probes: Seq[(Int, Int, Int, Int, Int)] = (0 until 8).map { j =>
      val pxlo = 8 + 16 * ((5 * j) % 12)
      val sylo = 8 + 16 * ((7 * j) % 12)
      (j, pxlo, pxlo + 39, sylo, sylo + 55)
    }
    Q(
      "p19_hilbert_layout",
      (s, dir) => {
        import s.implicits._
        graft.functions.FastVec.register(s)
        val base = t(s, dir, "lineitem")
          .select((col("l_partkey") % 256).as("px"), (col("l_suppkey") % 256).as("sy"))
          .withColumn("z", zInterleave8(col("px"), col("sy")))
          .withColumn("h",
            graft.functions.FastCurve.hilbert(col("px"), col("sy"), 8))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        base.count() // eager: both manifests scan it
        def manifest(layout: String, bucket: org.apache.spark.sql.Column) = base
          .select(lit(layout).as("layout"), bucket.as("b"), col("px"), col("sy"))
          .groupBy("layout", "b")
          .agg(count(lit(1)).as("n_rows"),
            min(col("px")).as("min_px"), max(col("px")).as("max_px"),
            min(col("sy")).as("min_sy"), max(col("sy")).as("max_sy"))
        val m = manifest("zorder", expr("z div 256"))
          .unionByName(manifest("hilbert", expr("h div 256")))
        val p = probes.toDF("pid", "pxlo", "pxhi", "sylo", "syhi")
        val hits = m.join(broadcast(p),
            col("max_px") >= col("pxlo") && col("min_px") <= col("pxhi") &&
              col("max_sy") >= col("sylo") && col("min_sy") <= col("syhi"))
          .select(col("layout"), col("pid"), col("b"), col("n_rows"))
        val wOrd = Window.partitionBy("layout", "pid").orderBy("b")
        hits
          .withColumn("brk",
            when(col("b") - lag("b", 1).over(wOrd) === 1, 0L).otherwise(1L))
          .groupBy("layout")
          .agg(count(lit(1)).as("buckets_read"),
            sum(col("n_rows")).cast("long").as("rows_read"),
            sum(col("brk")).as("n_runs"))
          .orderBy("layout")
      },
      Some {
        val sqlZ = (0 until 8).map { i =>
          s"(((l_partkey % 256) & ${1L << i}) << $i) + (((l_suppkey % 256) & ${1L << i}) << ${i + 1})"
        }.mkString(" + ")
        val vals = probes
          .map { case (j, a, b, c, d) => s"($j, $a, $b, $c, $d)" }.mkString(", ")
        s"""WITH base0 AS (
            SELECT l_partkey % 256 AS px, l_suppkey % 256 AS sy, ($sqlZ) AS z
            FROM lineitem),
          ${sqlHilbertCtes("base0", "px, sy, z")},
          base AS (SELECT px, sy, z, hd AS h FROM h7),
          m AS (
            SELECT 'zorder' AS layout, z // 256 AS b,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   min(px) AS min_px, max(px) AS max_px,
                   min(sy) AS min_sy, max(sy) AS max_sy
            FROM base GROUP BY 1, 2
            UNION ALL
            SELECT 'hilbert', h // 256, CAST(count(*) AS BIGINT),
                   min(px), max(px), min(sy), max(sy)
            FROM base GROUP BY 1, 2),
          probes(pid, pxlo, pxhi, sylo, syhi) AS (VALUES $vals),
          hits AS (SELECT m.layout, p.pid, m.b, m.n_rows FROM m JOIN probes p
                   ON m.max_px >= p.pxlo AND m.min_px <= p.pxhi
                  AND m.max_sy >= p.sylo AND m.min_sy <= p.syhi),
          runs AS (SELECT layout, pid, b, n_rows,
              CASE WHEN b - lag(b) OVER (PARTITION BY layout, pid ORDER BY b) = 1
                   THEN 0 ELSE 1 END AS brk
            FROM hits)
          SELECT layout, count(*) AS buckets_read,
            CAST(sum(n_rows) AS BIGINT) AS rows_read,
            CAST(sum(brk) AS BIGINT) AS n_runs
          FROM runs GROUP BY layout ORDER BY layout"""
      }
    )
  }

  /** P20: CDC apply — op-coded change-data-capture applied to a keyed
    * snapshot, the `APPLY CHANGES` / `MERGE ... WHEN MATCHED DELETE`
    * primitive every lakehouse ships and the one mutation shape the
    * merge family didn't yet cover: A6 is upsert-without-tombstones,
    * h1/h3 keep history, this FOLDS an ordered I/U/D stream to final
    * state — last op per key wins in (ts, event_id) sequence order, a
    * trailing D tombstones the key (alive = false, payload nulled), and
    * the per-key op census is the audit a CDC pipeline publishes next to
    * the applied table. Op codes derive deterministically from the event
    * stream (signup → I, error → D, else U — the reference's insert-vs-
    * update date-mask decision `update_live_price.py:250-258` extended
    * with the delete branch it lacks).
    *
    * Scale: ONE user-keyed exchange serves the sequence rank and the
    * census (the h7 discipline — rank window + conditional aggregates
    * share the partitioning); no join, no second scan. Integer counts
    * and a carried double/timestamp — nothing float-folds.
    */
  val p20CdcApply: Q = Q(
    "p20_cdc_apply",
    (s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"),
          when(col("event_type") === "signup", lit("I"))
            .when(col("event_type") === "error", lit("D"))
            .otherwise(lit("U")).as("op"))
        .withColumn("rn", row_number().over(w))
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_ops"),
          sum(when(col("op") === "I", 1L).otherwise(0L)).as("n_inserts"),
          sum(when(col("op") === "U", 1L).otherwise(0L)).as("n_updates"),
          sum(when(col("op") === "D", 1L).otherwise(0L)).as("n_deletes"),
          max(when(col("rn") === 1, col("op"))).as("last_op"),
          max(when(col("rn") === 1 && col("op") =!= "D", col("value"))).as("live_value"),
          max(when(col("rn") === 1 && col("op") =!= "D", col("ts"))).as("live_ts"))
        .select(col("user_id"), col("n_ops"), col("n_inserts"), col("n_updates"),
          col("n_deletes"), (col("last_op") =!= "D").as("alive"),
          col("live_value"), col("live_ts"))
        .orderBy("user_id")
    },
    Some("""WITH c AS (SELECT user_id, ts, event_id, value,
          CASE WHEN event_type = 'signup' THEN 'I'
               WHEN event_type = 'error' THEN 'D'
               ELSE 'U' END AS op
        FROM events),
      r AS (SELECT *, row_number() OVER (PARTITION BY user_id
              ORDER BY ts DESC, event_id DESC) AS rn FROM c)
      SELECT user_id, count(*) AS n_ops,
        CAST(sum(CASE WHEN op = 'I' THEN 1 ELSE 0 END) AS BIGINT) AS n_inserts,
        CAST(sum(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT) AS n_updates,
        CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes,
        max(CASE WHEN rn = 1 THEN op END) <> 'D' AS alive,
        max(CASE WHEN rn = 1 AND op <> 'D' THEN value END) AS live_value,
        max(CASE WHEN rn = 1 AND op <> 'D' THEN ts END) AS live_ts
      FROM r GROUP BY user_id ORDER BY user_id""")
  )

  /** V12: Benford first-digit audit — the classic fabricated-data detector
    * for monetary columns: the distribution of leading digits of `value`
    * against Benford's law log10(1 + 1/d), reported as per-digit deviation
    * in permille (v10 tests distribution drift between halves; this tests
    * against a CLOSED-FORM expected distribution — the forensic shape).
    *
    * Determinism: the leading digit comes from the decimal STRING of the
    * exact integer cents (`round(value·100)` — the corpus carries 2dp
    * money), so no float log/pow touches the digit extraction; shares are
    * integer-permille floor divisions; the expected permille is
    * round(1000·log10(1+1/d)) on the identical 9 small doubles in both
    * engines.
    *
    * Scale: one narrow codegen projection into a 9-cell census; the
    * total rides a window over those 9 rows. Same one-scan shape as a21.
    */
  val v12Benford: Q = Q(
    "v12_benford",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy()
      t(s, dir, "events")
        .select(round(col("value") * 100).cast("long").as("cents"))
        .filter(col("cents") > 0)
        .select(substring(col("cents").cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy("digit")
        .agg(count(lit(1)).as("n"))
        .withColumn("total", sum(col("n")).over(w))
        .select(col("digit"), col("n"),
          expr("(1000 * n) div total").as("share_pm"),
          round(log(10.0, lit(1.0) + lit(1.0) / col("digit")) * 1000)
            .cast("long").as("benford_pm"))
        .withColumn("dev_pm", col("share_pm") - col("benford_pm"))
        .orderBy("digit")
    },
    Some("""WITH cents AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events
        WHERE CAST(round(value * 100) AS BIGINT) > 0),
      census AS (
        SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit,
               count(*) AS n
        FROM cents GROUP BY 1),
      t AS (SELECT *, CAST(sum(n) OVER () AS BIGINT) AS total FROM census)
      SELECT digit, n, (1000 * n) // total AS share_pm,
             CAST(round(log10(1.0 + 1.0 / digit) * 1000) AS BIGINT) AS benford_pm,
             (1000 * n) // total - CAST(round(log10(1.0 + 1.0 / digit) * 1000) AS BIGINT) AS dev_pm
      FROM t ORDER BY digit""")
  )

  /** V13: sequence-continuity audit — per stream (user), gaps in the
    * event_id sequence: the dropped-message detector every sequenced feed
    * runs per partition (Kafka offsets, FIX MsgSeqNum, CDC LSNs). A
    * stream's ids should be its own arrivals; id jumps measure what the
    * pipeline never received — v11 asks "is the stream fresh", this asks
    * "is it COMPLETE".
    *
    * Scale: one user-keyed window (lag) feeding a map-side-combinable
    * per-key rollup — (key, id) pairs only; no global sort (a global-id
    * variant would take the a24 bucket decomposition).
    */
  val v13SeqGaps: Q = Q(
    "v13_seq_gaps",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("event_id")
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"))
        .withColumn("gap", col("event_id") - lag(col("event_id"), 1).over(w) - 1)
        .filter(col("gap").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_steps"),
          sum(when(col("gap") > 0, 1L).otherwise(0L)).as("n_gaps"),
          sum(col("gap")).as("missing_total"),
          max(col("gap")).as("max_gap"))
        .orderBy("user_id")
    },
    Some("""WITH g AS (
        SELECT user_id,
               event_id - lag(event_id) OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS gap
        FROM events)
      SELECT user_id, count(*) AS n_steps,
        CAST(sum(CASE WHEN gap > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
        CAST(sum(gap) AS BIGINT) AS missing_total,
        CAST(max(gap) AS BIGINT) AS max_gap
      FROM g WHERE gap IS NOT NULL
      GROUP BY user_id ORDER BY user_id""")
  )

  /** V14: referential-integrity audit — the foreign-key orphan census a
    * warehouse runs after every load (and the one check `v9_expectations`'
    * single-table constraints can't express): for each FK relation of the
    * star schema (lineitem→orders, lineitem→part, lineitem→supplier,
    * orders→customer, customer→nation), the referencing row count, the
    * count whose key has NO match in the referenced table, and the orphan
    * permille. One row per relation, integer-exact.
    *
    * Scale: each relation is ONE left-anti join from the fact side onto
    * the referenced KEY COLUMN only (dimension sides are key-projected
    * scans — broadcast when small, shuffled-hash past the threshold, both
    * fine: the anti join ships only keys) followed by a map-side count;
    * relations union as 1-row aggregates, so the output never shuffles
    * fact rows twice. At 100 TB this is the canonical "keys-only" audit
    * shape: no payload column is ever read (ReadSchema carries only the
    * two key columns per relation).
    */
  val v14RefIntegrity: Q = Q(
    "v14_ref_integrity",
    (s, dir) => {
      def rel(name: String, fact: org.apache.spark.sql.DataFrame, fk: String,
              dim: org.apache.spark.sql.DataFrame, pk: String) = {
        val f = fact.select(col(fk).as("k"))
        val orphans = f.join(dim.select(col(pk).as("k")), Seq("k"), "left_anti")
        f.agg(count(lit(1)).as("n_rows")).crossJoin(
          orphans.agg(count(lit(1)).as("n_orphans")))
          .select(lit(name).as("relation"), col("n_rows"), col("n_orphans"),
            expr("(1000 * n_orphans) div n_rows").as("orphan_pm"))
      }
      val li = t(s, dir, "lineitem")
      val od = t(s, dir, "orders")
      val cu = t(s, dir, "customer")
      Seq(
        rel("lineitem_orders", li, "l_orderkey", od, "o_orderkey"),
        rel("lineitem_part", li, "l_partkey", t(s, dir, "part"), "p_partkey"),
        rel("lineitem_supplier", li, "l_suppkey", t(s, dir, "supplier"), "s_suppkey"),
        rel("orders_customer", od, "o_custkey", cu, "c_custkey"),
        rel("customer_nation", cu, "c_nationkey", t(s, dir, "nation"), "n_nationkey"))
        .reduce(_ unionByName _)
        .orderBy("relation")
    },
    Some("""WITH r1 AS (
        SELECT 'lineitem_orders' AS relation, count(*) AS n_rows,
          CAST(count(*) FILTER (o_orderkey IS NULL) AS BIGINT) AS n_orphans
        FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey),
      r2 AS (
        SELECT 'lineitem_part', count(*),
          CAST(count(*) FILTER (p_partkey IS NULL) AS BIGINT)
        FROM lineitem l LEFT JOIN part p ON p.p_partkey = l.l_partkey),
      r3 AS (
        SELECT 'lineitem_supplier', count(*),
          CAST(count(*) FILTER (s_suppkey IS NULL) AS BIGINT)
        FROM lineitem l LEFT JOIN supplier s ON s.s_suppkey = l.l_suppkey),
      r4 AS (
        SELECT 'orders_customer', count(*),
          CAST(count(*) FILTER (c_custkey IS NULL) AS BIGINT)
        FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey),
      r5 AS (
        SELECT 'customer_nation', count(*),
          CAST(count(*) FILTER (n_nationkey IS NULL) AS BIGINT)
        FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey),
      u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL
            SELECT * FROM r3 UNION ALL SELECT * FROM r4 UNION ALL
            SELECT * FROM r5)
      SELECT relation, n_rows, n_orphans,
             (1000 * n_orphans) // n_rows AS orphan_pm
      FROM u ORDER BY relation""")
  )

  /** V15: primary-key uniqueness audit — v14's sibling on the OTHER side of
    * each FK relation (orphans are harmless if the dimension key isn't even
    * unique — this is the check that makes v14's verdict meaningful): per
    * table, the row count, the distinct-PK count, and the surplus rows
    * carrying an already-seen key. Composite keys (lineitem's (l_orderkey,
    * l_linenumber)) fold into ONE injective BIGINT — `orderkey·8 +
    * linenumber` (linenumber ∈ [1,7] per the TPC-H contract) — rather than
    * a tuple-distinct, because the two engines disagree on tuple NULL
    * semantics (Spark's multi-column COUNT DISTINCT drops any-NULL rows;
    * DuckDB's row-value distinct keeps them) and integer folding sidesteps
    * the divergence entirely.
    *
    * Scale: one two-phase distinct aggregate per table over the KEY column
    * only (partial distinct map-side, one exchange on the key — never a
    * payload column in any ReadSchema); per-table results union as 1-row
    * aggregates. The canonical post-load audit pair with [[v14RefIntegrity]].
    */
  val v15PkUnique: Q = Q(
    "v15_pk_unique",
    (s, dir) => {
      def tab(name: String, df: org.apache.spark.sql.DataFrame, key: org.apache.spark.sql.Column) =
        df.select(key.as("k"))
          .agg(count(lit(1)).as("n_rows"), count_distinct(col("k")).as("n_keys"))
          .select(lit(name).as("tbl"), col("n_rows"), col("n_keys"),
            (col("n_rows") - col("n_keys")).as("n_dup_rows"))
      Seq(
        tab("customer", t(s, dir, "customer"), col("c_custkey")),
        tab("documents", t(s, dir, "documents"), col("doc_id")),
        tab("embeddings", t(s, dir, "embeddings"), col("vec_id")),
        tab("events", t(s, dir, "events"), col("event_id")),
        tab("lineitem", t(s, dir, "lineitem"),
          col("l_orderkey") * 8 + col("l_linenumber")),
        tab("orders", t(s, dir, "orders"), col("o_orderkey")),
        tab("part", t(s, dir, "part"), col("p_partkey")),
        tab("supplier", t(s, dir, "supplier"), col("s_suppkey")))
        .reduce(_ unionByName _)
        .orderBy("tbl")
    },
    Some("""WITH u AS (
        SELECT 'customer' AS tbl, count(*) AS n_rows,
               count(DISTINCT c_custkey) AS n_keys FROM customer
        UNION ALL SELECT 'documents', count(*), count(DISTINCT doc_id) FROM documents
        UNION ALL SELECT 'embeddings', count(*), count(DISTINCT vec_id) FROM embeddings
        UNION ALL SELECT 'events', count(*), count(DISTINCT event_id) FROM events
        UNION ALL SELECT 'lineitem', count(*),
               count(DISTINCT l_orderkey * 8 + l_linenumber) FROM lineitem
        UNION ALL SELECT 'orders', count(*), count(DISTINCT o_orderkey) FROM orders
        UNION ALL SELECT 'part', count(*), count(DISTINCT p_partkey) FROM part
        UNION ALL SELECT 'supplier', count(*), count(DISTINCT s_suppkey) FROM supplier)
      SELECT tbl, n_rows, n_keys, n_rows - n_keys AS n_dup_rows
      FROM u ORDER BY tbl""")
  )

  /** V16: two-sample distribution drift — Kolmogorov–Smirnov D and the
    * Mann–Whitney probability-of-superiority (AUC), BOTH derived from one
    * shared per-value census: English vs non-English document lengths.
    * v10's PSI needs pre-chosen bins; these two are the bin-free pair a
    * monitoring stack runs when the binning itself is in question. KS
    * reads the worst pointwise ECDF gap; AUC reads stochastic dominance
    * (≈500‰ means neither group tends longer).
    *
    * Exactness: with per-value counts (a_v, b_v), cumulative (ca, cb) and
    * totals (n1, n2): `D·n1·n2 = max|ca·n2 − cb·n1|` and the tie-averaged
    * `2U = Σ a_v·(2·cb_v − b_v)` — every term an integer; cross products
    * run in DECIMAL(38,0)/HUGEINT (headroom to ~10¹⁸ rows per side), and
    * the two permilles are truncating divisions of non-negative operands
    * (U ≤ n1·n2 and D ≤ 1 guarantee the ranges).
    *
    * Scale: ONE documents scan → value census (map-side-combinable; the
    * value domain — distinct doc lengths — is bounded the x20/a21 way, so
    * the single ordered cumulative window runs over a census, never over
    * rows); totals broadcast; the final max/sum is one more O(values)
    * aggregate.
    */
  val v16TwoSampleDrift: Q = Q(
    "v16_two_sample_drift",
    (s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val census = t(s, dir, "documents")
        .select(col("n_chars"),
          when(col("lang") === "en", 1L).otherwise(0L).as("ia"))
        .groupBy("n_chars")
        .agg(sum(col("ia")).as("a"), sum(lit(1L) - col("ia")).as("b"))
      val wOrd = W.orderBy("n_chars")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      val cum = census
        .withColumn("ca", sum(col("a")).over(wOrd))
        .withColumn("cb", sum(col("b")).over(wOrd))
      val tot = census.agg(sum(col("a")).as("n1"), sum(col("b")).as("n2"))
      cum.crossJoin(broadcast(tot))
        .select(col("n1"), col("n2"),
          expr("abs(CAST(ca AS DECIMAL(38,0)) * n2 - CAST(cb AS DECIMAL(38,0)) * n1)")
            .as("dev"),
          expr("CAST(a AS DECIMAL(38,0)) * (2 * cb - b)").as("uc"))
        .groupBy("n1", "n2")
        .agg(max(col("dev")).as("d_num"), sum(col("uc")).as("u2"))
        .select(col("n1"), col("n2"),
          expr("CAST(d_num AS BIGINT)").as("d_num"),
          expr("CAST((CAST(1000 AS DECIMAL(38,0)) * d_num) div " +
            "(CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)").as("ks_pm"),
          expr("CAST(u2 AS BIGINT)").as("u2"),
          expr("CAST((CAST(1000 AS DECIMAL(38,0)) * u2) div " +
            "(CAST(2 AS DECIMAL(38,0)) * n1 * n2) AS BIGINT)").as("auc_pm"))
    },
    Some("""WITH census AS (
        SELECT n_chars,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS a,
               CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS b
        FROM documents GROUP BY n_chars),
      cum AS (SELECT n_chars, a, b,
               CAST(sum(a) OVER (ORDER BY n_chars
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
               CAST(sum(b) OVER (ORDER BY n_chars
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb
             FROM census),
      tot AS (SELECT CAST(sum(a) AS BIGINT) AS n1, CAST(sum(b) AS BIGINT) AS n2
              FROM census),
      dev AS (SELECT n1, n2,
               abs(CAST(ca AS HUGEINT) * n2 - CAST(cb AS HUGEINT) * n1) AS dev,
               CAST(a AS HUGEINT) * (2 * cb - b) AS uc
              FROM cum, tot)
      SELECT n1, n2, CAST(max(dev) AS BIGINT) AS d_num,
        CAST((1000 * max(dev)) // (CAST(n1 AS HUGEINT) * n2) AS BIGINT) AS ks_pm,
        CAST(sum(uc) AS BIGINT) AS u2,
        CAST((1000 * sum(uc)) // (2 * CAST(n1 AS HUGEINT) * n2) AS BIGINT) AS auc_pm
      FROM dev GROUP BY n1, n2""")
  )

  /** P17: small-file compaction planner — the lakehouse OPTIMIZE/bin-pack
    * step (Delta OPTIMIZE, Iceberg rewrite_data_files): given per-file
    * stats, pack order-adjacent small files into target-sized compaction
    * groups and report each group's fill. Files here are the corpus's
    * natural write granules — (source, doc_id div 20) — with bytes =
    * Σ n_chars; a file is assigned to group `exclusive-prefix-bytes div
    * target` within its source, the streaming first-fit that preserves
    * doc_id order (so compacted files stay range-prunable on doc_id).
    * Groups can overfill past the target by at most one file — the
    * planner reports fill_pm so the overflow is visible, matching how
    * OPTIMIZE emits one oversized file rather than splitting a source
    * file across outputs.
    *
    * Scale: the plan runs entirely over file METADATA — at 100 TB with
    * ~10⁶ files the stats table is megabytes; the per-source cumulative
    * window is the only ordered step and partitions by source, never a
    * global sort. The data itself is touched only by the (separate)
    * rewrite jobs this plan drives, one per group, each bounded by the
    * target size.
    */
  val p17CompactionPlan: Q = {
    val target = 20000L // target compacted size, chars
    Q(
      "p17_compaction_plan",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val files = t(s, dir, "documents")
          .groupBy(col("source"), expr("doc_id div 20").as("file_id"))
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("bytes"))
        val w = Window.partitionBy("source").orderBy("file_id")
        files
          .withColumn("cum", sum("bytes").over(w))
          .withColumn("cgroup", expr(s"(cum - bytes) div ${target}L"))
          .groupBy("source", "cgroup")
          .agg(
            count(lit(1)).as("n_files"),
            sum("n_docs").as("n_docs"),
            sum("bytes").as("bytes"),
            min("file_id").as("first_file"),
            max("file_id").as("last_file"))
          .withColumn("fill_pm", expr(s"bytes * 1000 div ${target}L"))
          .orderBy("source", "cgroup")
      },
      Some(s"""WITH files AS (
          SELECT source, doc_id // 20 AS file_id,
                 count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS bytes
          FROM documents GROUP BY source, doc_id // 20),
        plan AS (
          SELECT *, CAST(sum(bytes) OVER (PARTITION BY source ORDER BY file_id
                      ROWS UNBOUNDED PRECEDING) - bytes AS BIGINT) AS prior
          FROM files)
        SELECT source, prior // $target AS cgroup, count(*) AS n_files,
          CAST(sum(n_docs) AS BIGINT) AS n_docs,
          CAST(sum(bytes) AS BIGINT) AS bytes,
          min(file_id) AS first_file, max(file_id) AS last_file,
          CAST(sum(bytes) AS BIGINT) * 1000 // $target AS fill_pm
        FROM plan GROUP BY source, prior // $target
        ORDER BY source, cgroup""")
    )
  }

  /** V17: rule-provenance quarantine census — v9's expectation suite
    * reports PER-RULE failure counts; production quarantine needs the
    * JOINT picture: each row carries a BITMASK of every rule it failed
    * (the dead-letter "reasons" column), and the census groups by mask,
    * so co-occurring failures ("high outliers are always off-hours")
    * surface as one row instead of being double-counted across rules.
    * The mask doubles as the routing key: mask 0 ships, anything else
    * quarantines with its reasons attached.
    *
    * Scale: the mask is four codegen'd CASE expressions summed in the
    * scan projection — ONE pass, no joins, no second scan per rule (the
    * per-rule-count antipattern is R scans); the census aggregate keys
    * on ≤2^R masks with map-side combine. Adding a rule is one more
    * conditional, not another pass.
    */
  val v17RuleQuarantine: Q = Q(
    "v17_rule_quarantine",
    (s, dir) => {
      val masked = t(s, dir, "events").select(
        col("event_id"),
        (when(col("value") > 250.0, 1L).otherwise(0L) +
          when(col("value") < 1.0, 2L).otherwise(0L) +
          when(col("event_type") === "error", 4L).otherwise(0L) +
          when(hour(col("ts")) < 6 || hour(col("ts")) >= 22, 8L)
            .otherwise(0L)).as("mask"))
      masked
        .groupBy("mask")
        .agg(count(lit(1)).as("n_rows"),
          min(col("event_id")).as("first_id"),
          max(col("event_id")).as("last_id"))
        .withColumn("reasons", concat_ws(",", array_remove(array(
          when(expr("mask & 1") =!= 0, "outlier_high").otherwise(""),
          when(expr("mask & 2") =!= 0, "suspicious_low").otherwise(""),
          when(expr("mask & 4") =!= 0, "error_channel").otherwise(""),
          when(expr("mask & 8") =!= 0, "off_hours").otherwise("")), "")))
        .withColumn("verdict",
          when(col("mask") === 0, "ship").otherwise("quarantine"))
        .orderBy("mask")
    },
    Some("""WITH m AS (SELECT event_id,
          (CASE WHEN value > 250.0 THEN 1 ELSE 0 END +
           CASE WHEN value < 1.0 THEN 2 ELSE 0 END +
           CASE WHEN event_type = 'error' THEN 4 ELSE 0 END +
           CASE WHEN extract(hour FROM ts) < 6 OR extract(hour FROM ts) >= 22
                THEN 8 ELSE 0 END) AS mask
        FROM events)
      SELECT CAST(mask AS BIGINT) AS mask, count(*) AS n_rows,
        min(event_id) AS first_id, max(event_id) AS last_id,
        coalesce(array_to_string(list_filter([
          CASE WHEN mask & 1 <> 0 THEN 'outlier_high' ELSE '' END,
          CASE WHEN mask & 2 <> 0 THEN 'suspicious_low' ELSE '' END,
          CASE WHEN mask & 4 <> 0 THEN 'error_channel' ELSE '' END,
          CASE WHEN mask & 8 <> 0 THEN 'off_hours' ELSE '' END],
          x -> x <> ''), ','), '') AS reasons,
        CASE WHEN mask = 0 THEN 'ship' ELSE 'quarantine' END AS verdict
      FROM m GROUP BY mask ORDER BY mask""")
  )

  /** V18: k-anonymity audit — the re-identification check a dataset
    * passes before release (Sweeney 2002): group rows by their
    * quasi-identifier combination (nation × market segment here — the
    * columns an adversary can link externally), and grade each
    * equivalence class against k=5. Classes below k are re-identifiable;
    * the summary rows (one per class, plus the suppression tally a
    * release pipeline acts on) quantify how many records generalization
    * or suppression must touch. Sits beside x16's PII scrub: scrubbing
    * direct identifiers does NOT fix small quasi-identifier classes.
    *
    * Scale: one scan, one map-side-combinable census bounded at the QI
    * domain product; the verdict is a codegen CASE over census rows.
    */
  val v18KAnonymity: Q = {
    val k = 5L
    Q(
      "v18_k_anonymity",
      (s, dir) =>
        t(s, dir, "customer")
          .groupBy(col("c_nationkey").as("nationkey"),
            col("c_mktsegment").as("segment"))
          .agg(count(lit(1)).as("class_size"))
          .withColumn("k_anonymous",
            when(col("class_size") >= k, 1L).otherwise(0L))
          .withColumn("at_risk_rows",
            when(col("class_size") < k, col("class_size")).otherwise(0L))
          .orderBy("nationkey", "segment"),
      Some(s"""SELECT c_nationkey AS nationkey, c_mktsegment AS segment,
          count(*) AS class_size,
          CAST(CASE WHEN count(*) >= $k THEN 1 ELSE 0 END AS BIGINT) AS k_anonymous,
          CAST(CASE WHEN count(*) < $k THEN count(*) ELSE 0 END AS BIGINT) AS at_risk_rows
        FROM customer GROUP BY c_nationkey, c_mktsegment
        ORDER BY nationkey, segment""")
    )
  }

  /** V19: split-balance chi-square audit — is p14's train/val/test hash
    * assignment independent of `source`? A contaminated or skewed split
    * (one source over-represented in test) silently biases every eval;
    * the release gate is Pearson's chi-square over the source×split
    * contingency table, emitted per cell plus the table total. Uses
    * p14's EXACT assignment expression (seed-14 60-bit hash mod 100,
    * 96/2/2) so the audit measures the shipped split, not a twin.
    *
    * Exactness: each cell's statistic is (obs·T − rt·ct)²/(rt·ct·T)
    * cross-multiplied — the square is computed in DECIMAL(38,0) (obs·T
    * reaches 10¹¹ at sf1; its square overflows BIGINT, the g8/e20
    * headroom rule), then ONE cast to double and two divisions by exact
    * integers: identical IEEE inputs → identical doubles → identical
    * round-to-permille on both engines. The total is a sum of integer
    * permilles — order-independent.
    *
    * Scale: one corpus scan into a map-side-combinable (source, split)
    * census; everything after is bounded at |sources|·3 cells (the
    * single-partition window is over those cells, the v6 Lorenz rule).
    */
  val v19SplitBalance: Q = Q(
    "v19_split_balance",
    (s, dir) => {
      val cells = t(s, dir, "documents")
        .select(col("source"),
          MixtureQueries.splitSlot(col("doc_id")).as("slot"))
        .withColumn("split", MixtureQueries.splitOf(col("slot")))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_obs"))
      val w = Window.partitionBy(lit(1))
      val wr = Window.partitionBy("source")
      val wc = Window.partitionBy("split")
      val chi = cells
        .withColumn("rt", sum(col("n_obs")).over(wr))
        .withColumn("ct", sum(col("n_obs")).over(wc))
        .withColumn("tt", sum(col("n_obs")).over(w))
        .withColumn("dev",
          (col("n_obs") * col("tt") - col("rt") * col("ct"))
            .cast(DecimalType(19, 0)))
        .withColumn("chi2_cell_pm",
          round((col("dev") * col("dev")).cast("double")
            / (col("rt") * col("ct")).cast("double")
            / col("tt").cast("double") * 1000).cast("long"))
      chi
        .withColumn("chi2_total_pm", sum(col("chi2_cell_pm")).over(w))
        .select("source", "split", "n_obs", "chi2_cell_pm", "chi2_total_pm")
        .orderBy("source", "split")
    },
    Some("""WITH d AS (SELECT source,
          CAST('0x' || substr(md5('14|' || CAST(doc_id AS VARCHAR)), 1, 15)
               AS BIGINT) % 100 AS slot
        FROM documents),
      cells AS (SELECT source,
          CASE WHEN slot < 96 THEN 'train' WHEN slot < 98 THEN 'val'
               ELSE 'test' END AS split,
          count(*) AS n_obs
        FROM d GROUP BY 1, 2),
      m AS (SELECT source, split, n_obs,
          CAST(sum(n_obs) OVER (PARTITION BY source) AS BIGINT) AS rt,
          CAST(sum(n_obs) OVER (PARTITION BY split) AS BIGINT) AS ct,
          CAST(sum(n_obs) OVER () AS BIGINT) AS tt
        FROM cells),
      c AS (SELECT source, split, n_obs,
          CAST(round(
            CAST(CAST(n_obs * tt - rt * ct AS DECIMAL(19,0))
                 * CAST(n_obs * tt - rt * ct AS DECIMAL(19,0)) AS DOUBLE)
            / CAST(rt * ct AS DOUBLE) / CAST(tt AS DOUBLE) * 1000)
          AS BIGINT) AS chi2_cell_pm
        FROM m)
      SELECT source, split, n_obs, chi2_cell_pm,
        CAST(sum(chi2_cell_pm) OVER () AS BIGINT) AS chi2_total_pm
      FROM c ORDER BY source, split""")
  )

  val all: Seq[Q] = Seq(
    a2Counts, a11Percentiles, f8Timezone, u2InsertAbsent, v2SchemaDiff, v4ColumnProfile,
    v5SourceOverlap, o4FileListing, m1BinaryMeta, v6ShardSkew, v7DataCard,
    v8PipelineYield, v9Expectations, v10PsiDrift, v11Freshness, p15ZorderLayout,
    p18LayoutCost, p19HilbertLayout, p20CdcApply,
    v12Benford, v13SeqGaps, v14RefIntegrity, v15PkUnique, v16TwoSampleDrift,
    p17CompactionPlan, v17RuleQuarantine, v18KAnonymity, v19SplitBalance)
}
