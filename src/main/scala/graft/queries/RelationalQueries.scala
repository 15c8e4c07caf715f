package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** One declared query: a Spark builder plus (optionally) the equivalent ANSI
  * SQL for the DuckDB oracle. Column names/aliases MUST match between the two
  * (the driver sorts columns by name before hashing values).
  *
  * Determinism rules used throughout (Spark vs DuckDB must hash-match):
  *   - money/qty doubles are cast to DECIMAL before SUM (exact,
  *     order-independent), and the final aggregate is cast back to DOUBLE;
  *   - averages/ratios are computed as exact-int-or-decimal numerator over
  *     count, rounded to 6 dp;
  *   - event time is always the microsecond long `ts_us` (both engines
  *     truncate the parquet ns column to µs — see [[graft.sources.Tables]]);
  *   - every ORDER BY used under a LIMIT / row_number carries a unique
  *     tie-break key.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** Included in the Bench headline set. Entries with `bench = false`
      * still get wall-clock history via Bench's lifecycle lane. */
    bench: Boolean = true,
    /** `build` EXECUTES work (streams, store/index mutations over a
      * scratch dir) rather than returning a lazy plan — so "build the
      * plan" costs the whole lifecycle. The catalog plan-build loop
      * skips these (they are smoked separately), and Bench's lifecycle
      * lane times them once instead of min-of-3. */
    eagerLifecycle: Boolean = false)

/** Relational query inventory Q1–Q22 (SURVEY.md §2.7, re-based onto the
  * driver's tables: `events` plays the role of the reference's
  * `processing_results` stream table — user_id ↔ camera_id, ts ↔
  * frame_timestamp).
  *
  * Reference semantics covered here (file:line refs are into
  * /root/reference): per-key counting over the results table
  * (CassandraService.java:125-145's (camera_id, day) layout → q02/q11),
  * prev-frame deltas (VideoProcessor.java:155-205's ValueState → q03 lag /
  * q19 as-of), newest-first reads (CLUSTERING ORDER BY frame_timestamp DESC,
  * CassandraService.java:140 → q04/q16).
  */
object RelationalQueries {

  private def ev(s: SparkSession, dir: String) = Tables.events(s, dir)

  val defs: Seq[QueryDef] = Seq(

    // ---------------------------------------------------------------- q01
    // Full-table hash aggregate with partial/map-side combine; the plan is a
    // single scan + HashAggregate pair — at 100 TB the partial agg reduces
    // shuffle volume to |groups| per task.
    QueryDef(
      "q01_pricing_summary",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") <= lit("1999-12-01").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            expr("cast(sum(cast(l_quantity as decimal(18,2))) as double)").as("sum_qty"),
            expr("cast(sum(cast(l_extendedprice as decimal(18,2))) as double)").as("sum_base_price"),
            expr("cast(sum(cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(18,2)))) as double)").as("sum_disc_price"),
            expr("round(cast(sum(cast(l_quantity as decimal(18,2))) as double) / count(*), 6)").as("avg_qty"),
            expr("round(cast(sum(cast(l_discount as decimal(18,2))) as double) / count(*), 6)").as("avg_disc"),
            count(lit(1)).as("count_order")),
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
               ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
      """)),

    // ---------------------------------------------------------------- q02
    // Filter + projection battery: IN / BETWEEN / LIKE / CASE WHEN. All
    // predicates are Catalyst-pushable to the parquet scan.
    QueryDef(
      "q02_filter_project",
      (s, dir) =>
        Tables.orders(s, dir)
          .filter(col("o_orderstatus").isin("O", "F") &&
            col("o_orderpriority").like("%URGENT%") &&
            col("o_totalprice").between(2000, 400000))
          .select(
            col("o_orderkey"),
            col("o_orderstatus"),
            upper(col("o_orderpriority")).as("prio"),
            col("o_orderdate").cast("date").as("odate"),
            expr("case when o_totalprice > 200000 then 'big' when o_totalprice >= 50000 then 'mid' else 'small' end").as("bucket")),
      Some("""
        SELECT o_orderkey, o_orderstatus, UPPER(o_orderpriority) AS prio,
               CAST(o_orderdate AS DATE) AS odate,
               CASE WHEN o_totalprice > 200000 THEN 'big'
                    WHEN o_totalprice >= 50000 THEN 'mid' ELSE 'small' END AS bucket
        FROM orders
        WHERE o_orderstatus IN ('O','F') AND o_orderpriority LIKE '%URGENT%'
          AND o_totalprice BETWEEN 2000 AND 400000
      """)),

    // ---------------------------------------------------------------- q03
    // Inter-event gap per user — the batch restatement of the reference's
    // per-camera prev-frame ValueState (VideoProcessor.java:155-205). One
    // shuffle on the partition key; window runs sorted within partitions.
    QueryDef(
      "q03_gaps",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
        ev(s, dir).select(
          col("user_id"), col("event_id"),
          (col("ts_us") - lag("ts_us", 1).over(w)).as("gap_us"))
      },
      Some("""
        SELECT user_id, event_id,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
        FROM events
      """)),

    // ---------------------------------------------------------------- q04
    // Newest-first top-k per key (Cassandra `CLUSTERING ORDER BY
    // frame_timestamp DESC` reads). row_number ≤ k prunes in one window pass.
    QueryDef(
      "q04_topk_per_user",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts_us").desc, col("event_id").desc)
        ev(s, dir)
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("user_id", "event_id", "event_type", "rn")
      },
      Some("""
        SELECT user_id, event_id, event_type, rn FROM (
          SELECT user_id, event_id, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
          FROM events) WHERE rn <= 3
      """)),

    // ---------------------------------------------------------------- q05
    // Fact ⋈ two dims, kept shuffle-free for the fact table
    // (BroadcastHashJoin both times — plan-guarded).
    //
    // BROADCAST-HINT POLICY (applies to the whole catalog): only
    // FIXED-cardinality tables (nation 25 rows, region 5, literal band/dim
    // tables) carry an explicit broadcast() hint — those are safe at any
    // scale. part/supplier/customer GROW with the dataset, so their joins
    // are left to Catalyst stats + AQE: broadcast while they fit the
    // threshold, shuffle when they outgrow it — a forced hint would OOM at
    // 100 TB exactly like ext13's removed vocabulary broadcast.
    QueryDef(
      "q05_star_join",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
          .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
          .filter(col("p_size") < 30 && col("s_acctbal") >= 0)
          .groupBy("p_brand")
          .agg(
            count(lit(1)).as("n_items"),
            expr("cast(sum(cast(l_extendedprice as decimal(18,2))) as double)").as("revenue")),
      Some("""
        SELECT p_brand, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
                      JOIN supplier ON l_suppkey = s_suppkey
        WHERE p_size < 30 AND s_acctbal >= 0
        GROUP BY p_brand
      """)),

    // ---------------------------------------------------------------- q06
    // Multi-way inner + left-outer join with agg over the outer side.
    QueryDef(
      "q06_multi_join",
      (s, dir) =>
        Tables.customer(s, dir)
          .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
          .join(Tables.orders(s, dir), col("o_custkey") === col("c_custkey"), "left")
          .groupBy("r_name", "n_name")
          .agg(
            countDistinct(col("c_custkey")).as("n_cust"),
            count(col("o_orderkey")).as("n_orders")),
      Some("""
        SELECT r_name, n_name, COUNT(DISTINCT c_custkey) AS n_cust, COUNT(o_orderkey) AS n_orders
        FROM customer JOIN nation ON c_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
                      LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY r_name, n_name
      """)),

    // ---------------------------------------------------------------- q07
    // Left-semi join (EXISTS). Semi joins never duplicate the probe side, so
    // output stays bounded by the left table at any scale.
    QueryDef(
      "q07_semi_join",
      (s, dir) =>
        Tables.customer(s, dir)
          .join(
            Tables.orders(s, dir).filter(col("o_totalprice") > 300000),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name"),
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
      """)),

    // ---------------------------------------------------------------- q08
    // Left-anti join (NOT EXISTS): customers with no orders.
    QueryDef(
      "q08_anti_join",
      (s, dir) =>
        Tables.customer(s, dir)
          .join(Tables.orders(s, dir).filter(col("o_totalprice") > 400000),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name"),
      Some("""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      """)),

    // ---------------------------------------------------------------- q09
    // Range join with an equi prefix: error → purchase conversion within one
    // hour. The user_id equi key keeps this a hash join + residual range
    // filter — never a cartesian — so it scales with the key cardinality.
    QueryDef(
      "q09_range_join",
      (s, dir) => {
        val e = ev(s, dir)
        val err = e.filter(col("event_type") === "error")
          .select(col("user_id").as("u"), col("event_id").as("error_id"), col("ts_us").as("t0"))
        val pur = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("u2"), col("event_id").as("purchase_id"), col("ts_us").as("t1"))
        err.join(pur, col("u") === col("u2") && col("t1") > col("t0") && col("t1") <= col("t0") + expr("3600000000L"))
          .select(col("u").as("user_id"), col("error_id"), col("purchase_id"), (col("t1") - col("t0")).as("gap_us"))
      },
      Some("""
        SELECT e1.user_id AS user_id, e1.event_id AS error_id, e2.event_id AS purchase_id,
               epoch_us(e2.ts) - epoch_us(e1.ts) AS gap_us
        FROM events e1 JOIN events e2
          ON e1.user_id = e2.user_id
         AND epoch_us(e2.ts) > epoch_us(e1.ts)
         AND epoch_us(e2.ts) <= epoch_us(e1.ts) + 3600000000
        WHERE e1.event_type = 'error' AND e2.event_type = 'purchase'
      """)),

    // ---------------------------------------------------------------- q10
    // Pure theta (band) join against a tiny inline dimension → broadcast
    // nested-loop, the right physical plan when no equi key exists.
    QueryDef(
      "q10_band_join",
      (s, dir) => {
        val bands = s.createDataFrame(Seq(
          (0.0, 905.0, "low"), (905.0, 915.0, "mid"), (915.0, 100000.0, "high")))
          .toDF("lo", "hi", "band")
        Tables.part(s, dir)
          .join(broadcast(bands), col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
          .groupBy("band")
          .agg(count(lit(1)).as("n_parts"),
            expr("cast(sum(cast(p_retailprice as decimal(18,2))) as double)").as("total_price"))
      },
      Some("""
        SELECT band, COUNT(*) AS n_parts,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM part JOIN (VALUES (0.0, 905.0, 'low'), (905.0, 915.0, 'mid'), (915.0, 100000.0, 'high')) b(lo, hi, band)
          ON p_retailprice >= lo AND p_retailprice < hi
        GROUP BY band
      """)),

    // ---------------------------------------------------------------- q11
    // ROLLUP over (event_type, day) — the (camera_id, day) partition-key
    // derivation of CassandraService.java:153 as a multi-granularity agg.
    QueryDef(
      "q11_rollup",
      (s, dir) => {
        val e = ev(s, dir).withColumn("day", col("ts").cast("date"))
        e.rollup("event_type", "day")
          .agg(count(lit(1)).as("n"),
            grouping(col("event_type")).cast("int").as("g_type"),
            grouping(col("day")).cast("int").as("g_day"))
      },
      Some("""
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n,
               CAST(GROUPING(event_type) AS INT) AS g_type,
               CAST(GROUPING(CAST(date_trunc('day', ts) AS DATE)) AS INT) AS g_day
        FROM events GROUP BY ROLLUP (event_type, CAST(date_trunc('day', ts) AS DATE))
      """)),

    // ---------------------------------------------------------------- q12
    // CUBE + exact decimal sum.
    QueryDef(
      "q12_cube",
      (s, dir) =>
        Tables.orders(s, dir)
          .cube("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"),
            expr("cast(sum(cast(o_totalprice as decimal(18,2))) as double)").as("total")),
      Some("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      """)),

    // ---------------------------------------------------------------- q13
    // Exact COUNT(DISTINCT) — expands to a two-phase agg in Spark (partial
    // distinct per partition, then final), shuffle-bounded by |keys|.
    QueryDef(
      "q13_count_distinct",
      (s, dir) =>
        ev(s, dir).groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("n_users"),
            count(lit(1)).as("n_events"),
            min(col("ts_us")).as("first_us"),
            max(col("ts_us")).as("last_us"),
            round(min(col("value")), 6).as("min_v"),
            round(max(col("value")), 6).as("max_v")),
      Some("""
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events,
               MIN(epoch_us(ts)) AS first_us, MAX(epoch_us(ts)) AS last_us,
               ROUND(MIN(value), 6) AS min_v, ROUND(MAX(value), 6) AS max_v
        FROM events GROUP BY event_type
      """)),

    // approx_count_distinct (HLL) — tolerance-based, not hash-comparable
    // across engines, so declared without an oracle (rows-only check).
    QueryDef(
      "q13b_approx_distinct",
      (s, dir) =>
        ev(s, dir).groupBy("event_type")
          .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users")),
      None, bench = false),

    // ---------------------------------------------------------------- q14
    // INTERSECT (distinct semantics in both engines).
    QueryDef(
      "q14_intersect",
      (s, dir) => {
        val e = ev(s, dir).withColumn("day", col("ts").cast("date"))
        e.filter(col("event_type") === "purchase").select("user_id", "day")
          .intersect(e.filter(col("event_type") === "error").select("user_id", "day"))
      },
      Some("""
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events WHERE event_type = 'purchase'
        INTERSECT
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) FROM events WHERE event_type = 'error'
      """)),

    // ---------------------------------------------------------------- q15
    // EXCEPT: users who viewed but never purchased.
    QueryDef(
      "q15_except",
      (s, dir) => {
        val e = ev(s, dir).withColumn("day", col("ts").cast("date"))
        e.filter(col("event_type") === "click").select("user_id", "day")
          .except(e.filter(col("event_type") === "purchase").select("user_id", "day"))
      },
      Some("""
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) FROM events WHERE event_type = 'purchase'
      """)),

    // ---------------------------------------------------------------- q16
    // Global top-100 newest — Spark plans TakeOrderedAndProject (per-partition
    // heap + driver merge), never a full sort at scale.
    QueryDef(
      "q16_sort_limit",
      (s, dir) =>
        ev(s, dir)
          .orderBy(col("ts_us").desc, col("event_id").desc)
          .limit(100)
          .select("event_id", "user_id", "event_type", "ts_us"),
      Some("""
        SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
        FROM events ORDER BY epoch_us(ts) DESC, event_id DESC LIMIT 100
      """)),

    // ---------------------------------------------------------------- q17
    // Scalar-function battery: string / date / math (all codegen'd built-ins,
    // no UDFs in the hot path).
    QueryDef(
      "q17_scalar_battery",
      (s, dir) =>
        ev(s, dir).select(
          col("event_id"),
          concat(col("event_type"), lit("-"), col("user_id").cast("string")).as("tag"),
          substring(col("event_type"), 1, 3).as("et3"),
          length(col("event_type")).cast("long").as("et_len"),
          upper(col("event_type")).as("et_up"),
          regexp_replace(col("event_type"), "[aeiou]", "*").as("et_starred"),
          year(col("ts")).cast("long").as("y"), month(col("ts")).cast("long").as("m"),
          dayofmonth(col("ts")).cast("long").as("d"), hour(col("ts")).cast("long").as("h"),
          date_format(col("ts"), "yyyy-MM-dd").as("day_str"),
          abs(col("value")).as("v_abs"),
          round(col("value"), 1).as("v_round"),
          ceil(col("value")).as("v_ceil"),
          floor(col("value")).as("v_floor"),
          expr("round(sqrt(value), 6)").as("v_sqrt"),
          expr("round(ln(1 + value), 6)").as("v_ln"),
          sha2(col("event_type"), 256).as("et_sha"),
          base64(col("event_type").cast("binary")).as("et_b64"),
          format_string("%s|%04d", col("event_type"), col("user_id").cast("int")).as("et_fmt"),
          unbase64(base64(col("event_type").cast("binary"))).cast("string").as("et_rt")),
      Some("""
        SELECT event_id,
               concat(event_type, '-', CAST(user_id AS VARCHAR)) AS tag,
               substring(event_type, 1, 3) AS et3,
               length(event_type) AS et_len,
               upper(event_type) AS et_up,
               regexp_replace(event_type, '[aeiou]', '*', 'g') AS et_starred,
               year(ts) AS y, month(ts) AS m, day(ts) AS d, hour(ts) AS h,
               strftime(ts, '%Y-%m-%d') AS day_str,
               abs(value) AS v_abs,
               round(value, 1) AS v_round,
               CAST(ceil(value) AS BIGINT) AS v_ceil,
               CAST(floor(value) AS BIGINT) AS v_floor,
               round(sqrt(value), 6) AS v_sqrt,
               round(ln(1 + value), 6) AS v_ln,
               sha256(event_type) AS et_sha,
               to_base64(CAST(event_type AS BLOB)) AS et_b64,
               printf('%s|%04d', event_type, CAST(user_id AS INT)) AS et_fmt,
               CAST(from_base64(to_base64(CAST(event_type AS BLOB))) AS VARCHAR) AS et_rt
        FROM events
      """)),

    // ---------------------------------------------------------------- q18
    // JSON extraction from the props column.
    QueryDef(
      "q18_json",
      (s, dir) =>
        ev(s, dir).select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
          .filter(col("k") > 50),
      Some("""
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        FROM events WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50
      """)),

    // ---------------------------------------------------------------- q19
    // As-of join, union+window formulation: last signup at-or-before each
    // purchase per user. One shuffle on user_id, no join explosion — this is
    // the scalable as-of shape (vs the O(n·m) join+row_number one).
    QueryDef(
      "q19_asof",
      (s, dir) => graft.operators.AsOf.lastEventBefore(
        ev(s, dir), refType = "signup", queryType = "purchase"),
      Some("""
        WITH tagged AS (
          SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
                 CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS is_ref
          FROM events WHERE event_type IN ('signup', 'purchase')
        ), w AS (
          SELECT *, MAX(CASE WHEN is_ref = 1 THEN ts_us END) OVER (
                   PARTITION BY user_id
                   ORDER BY ts_us, is_ref DESC, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ref_ts_us
          FROM tagged)
        SELECT event_id, user_id, ref_ts_us FROM w WHERE event_type = 'purchase'
      """)),

    // ---------------------------------------------------------------- q20
    // Correlated EXISTS / NOT EXISTS — exercises Catalyst subquery
    // decorrelation (RewritePredicateSubquery → semi/anti joins).
    QueryDef(
      "q20_exists",
      (s, dir) => {
        // query-scoped view names: Verify runs the catalog concurrently
        Tables.customer(s, dir).createOrReplaceTempView("customer_q20")
        Tables.orders(s, dir).createOrReplaceTempView("orders_q20")
        s.sql("""
          SELECT c_custkey, c_name FROM customer_q20 c
          WHERE EXISTS (SELECT 1 FROM orders_q20 o
                        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
            AND NOT EXISTS (SELECT 1 FROM orders_q20 o2
                            WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'P')
        """)
      },
      Some("""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'P')
      """)),

    // ---------------------------------------------------------------- q21
    // GROUPING SETS + HAVING + grouping_id-style flags.
    QueryDef(
      "q21_grouping_sets",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders_q21")
        s.sql("""
          SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
                 CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
                 CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
          FROM orders_q21
          GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
          HAVING COUNT(*) > 5
        """)
      },
      Some("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        HAVING COUNT(*) > 5
      """)),

    // ---------------------------------------------------------------- q22
    // UNION (distinct) of two slices.
    QueryDef(
      "q22_union",
      (s, dir) => {
        val e = ev(s, dir)
        e.filter(col("event_type") === "click").select("user_id")
          .union(e.filter(col("event_type") === "view").select("user_id"))
          .distinct()
      },
      Some("""
        SELECT user_id FROM events WHERE event_type = 'click'
        UNION
        SELECT user_id FROM events WHERE event_type = 'view'
      """)),

    // ---------------------------------------------------------------- q23
    // Window aggregates with explicit frames: running count + sliding sum
    // (rowsBetween), plus first/last per partition.
    QueryDef(
      "q23_window_frames",
      (s, dir) => {
        val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
        val sliding = byUser.rowsBetween(-2, 0)
        // RANGE frame: trailing 1 s of event time (value-based, not row-based)
        val trailing1s = Window.partitionBy("user_id").orderBy(col("ts_us"))
          .rangeBetween(-1000000L, 0L)
        val whole = Window.partitionBy("user_id")
          .orderBy(col("ts_us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ev(s, dir).select(
          col("user_id"), col("event_id"),
          row_number().over(byUser).cast("long").as("seq"),
          sum(col("value").cast("decimal(18,2)")).over(sliding).cast("double").as("sliding_sum"),
          count(lit(1)).over(trailing1s).as("n_last_sec"),
          first("event_id").over(whole).as("first_event"),
          last("event_id").over(whole).as("last_event"))
      },
      Some("""
        SELECT user_id, event_id,
               ROW_NUMBER() OVER w AS seq,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sliding_sum,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 1000000 PRECEDING AND CURRENT ROW) AS n_last_sec,
               FIRST_VALUE(event_id) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_event,
               LAST_VALUE(event_id) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      """)),

    // ---------------------------------------------------------------- q24
    // Array-function battery (split / sort_array / array_contains / size /
    // sequence+aggregate / slice / element_at / array_distinct), emitted as
    // scalars/joined strings so results hash identically across engines.
    QueryDef(
      "q24_array_battery",
      (s, dir) => {
        val e = ev(s, dir)
        val arr = split(
          concat(col("event_type"), lit("-"), (col("user_id") % 10).cast("string")), "-")
        val seq1n = sequence(lit(1), month(col("ts")))
        e.select(
          col("event_id"),
          array_join(sort_array(arr), "|").as("arr_joined"),
          array_contains(arr, "click").as("has_click"),
          size(arr).cast("long").as("arr_size"),
          aggregate(seq1n, lit(0L), (acc, x) => acc + x).as("seq_sum"),
          array_join(slice(seq1n, 1, 2), ",").as("sliced"),
          element_at(arr, 1).as("first_tok"),
          size(array_distinct(array(col("event_type"), col("event_type"), lit("x"))))
            .cast("long").as("distinct_n"))
      },
      Some("""
        SELECT event_id,
          array_to_string(list_sort(string_split(concat(event_type, '-', CAST(user_id % 10 AS VARCHAR)), '-')), '|') AS arr_joined,
          list_contains(string_split(concat(event_type, '-', CAST(user_id % 10 AS VARCHAR)), '-'), 'click') AS has_click,
          CAST(len(string_split(concat(event_type, '-', CAST(user_id % 10 AS VARCHAR)), '-')) AS BIGINT) AS arr_size,
          CAST(list_aggregate(range(1, month(ts) + 1), 'sum') AS BIGINT) AS seq_sum,
          array_to_string(list_slice(range(1, month(ts) + 1), 1, 2), ',') AS sliced,
          string_split(concat(event_type, '-', CAST(user_id % 10 AS VARCHAR)), '-')[1] AS first_tok,
          CAST(len(list_distinct([event_type, event_type, 'x'])) AS BIGINT) AS distinct_n
        FROM events
      """)),

    // ---------------------------------------------------------------- q25
    // Map + JSON battery: map construction/keys/element_at, from_json typed
    // field access, to_json round-trip.
    QueryDef(
      "q25_map_json",
      (s, dir) => {
        val e = ev(s, dir)
        val mp = map(
          lit("type"), col("event_type"),
          lit("uid"), col("user_id").cast("string"))
        e.select(
          col("event_id"),
          array_join(map_keys(mp), ",").as("mkeys"),
          element_at(mp, "type").as("mval"),
          (from_json(col("props"), lit("k INT")).getField("k") + 1).as("k1"),
          get_json_object(
            to_json(struct(col("event_type").as("t"))), "$.t").as("rt"))
      },
      Some("""
        SELECT event_id,
          array_to_string(map_keys(MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}), ',') AS mkeys,
          (MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}['type'])[1] AS mval,
          CAST(json_extract_string(props, '$.k') AS INT) + 1 AS k1,
          json_extract_string(to_json({'t': event_type}), '$.t') AS rt
        FROM events
      """)),

    // ---------------------------------------------------------------- q26
    // Ranking-function family: rank (ties share), dense_rank, ntile, lead —
    // all partitioned by user_id so no global single-partition window.
    QueryDef(
      "q26_rank_funcs",
      (s, dir) => {
        val byType = Window.partitionBy("user_id").orderBy(col("event_type"))
        val byTime = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
        ev(s, dir).select(
          col("user_id"), col("event_id"),
          rank().over(byType).cast("long").as("rk"),
          dense_rank().over(byType).cast("long").as("drk"),
          ntile(4).over(byTime).cast("long").as("nt"),
          lead("event_id", 1).over(byTime).as("nxt"))
      },
      Some("""
        SELECT user_id, event_id,
               CAST(RANK() OVER (PARTITION BY user_id ORDER BY event_type) AS BIGINT) AS rk,
               CAST(DENSE_RANK() OVER (PARTITION BY user_id ORDER BY event_type) AS BIGINT) AS drk,
               CAST(NTILE(4) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS BIGINT) AS nt,
               LEAD(event_id) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS nxt
        FROM events
      """)),

    // ---------------------------------------------------------------- q27
    // Order-normalized collect: sorted distinct list rendered as a string
    // (the only portable form — unsorted collect_list is nondeterministic).
    QueryDef(
      "q27_collect_sorted",
      (s, dir) =>
        ev(s, dir).filter(col("user_id") < 5)
          .groupBy("event_type")
          .agg(array_join(
            transform(sort_array(collect_set(col("user_id"))), _.cast("string")),
            ",").as("users")),
      Some("""
        SELECT event_type, array_to_string(list(DISTINCT user_id ORDER BY user_id), ',') AS users
        FROM events WHERE user_id < 5 GROUP BY event_type
      """)),

    // ---------------------------------------------------------------- q28
    // Right + full-outer joins over two aggregates, then UNION ALL
    // (duplicate-preserving) — completing the join/set-op matrix.
    QueryDef(
      "q28_outer_union",
      (s, dir) => {
        val big = Tables.orders(s, dir).filter(col("o_totalprice") > 350000)
          .groupBy(col("o_custkey").as("k1")).agg(count(lit(1)).as("n_big"))
        val urgent = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
          .groupBy(col("o_custkey").as("k2")).agg(count(lit(1)).as("n_urgent"))
        val full = big.join(urgent, col("k1") === col("k2"), "full_outer")
          .select(coalesce(col("k1"), col("k2")).as("custkey"),
            col("n_big"), col("n_urgent"))
        full.unionAll(full.filter(col("n_big").isNotNull))
      },
      Some("""
        WITH big AS (
          SELECT o_custkey AS k1, COUNT(*) AS n_big FROM orders
          WHERE o_totalprice > 350000 GROUP BY o_custkey),
        urgent AS (
          SELECT o_custkey AS k2, COUNT(*) AS n_urgent FROM orders
          WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey),
        f AS (
          SELECT COALESCE(k1, k2) AS custkey, n_big, n_urgent
          FROM big FULL OUTER JOIN urgent ON k1 = k2)
        SELECT custkey, n_big, n_urgent FROM f
        UNION ALL
        SELECT custkey, n_big, n_urgent FROM f WHERE n_big IS NOT NULL
      """)),

    // ---------------------------------------------------------------- q29
    // Date/time battery: truncation, day difference, interval arithmetic,
    // month addition (end-of-month clamped in both engines), last_day,
    // quarter, epoch seconds.
    QueryDef(
      "q29_datetime",
      (s, dir) =>
        Tables.orders(s, dir).select(
          col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
          datediff(lit("1998-06-01").cast("date"), col("o_orderdate").cast("date"))
            .cast("long").as("days_to"),
          (col("o_orderdate") + expr("INTERVAL 3 DAY")).cast("date").as("plus3"),
          add_months(col("o_orderdate").cast("date"), 2).as("plus2m"),
          last_day(col("o_orderdate").cast("date")).as("eom"),
          quarter(col("o_orderdate")).cast("long").as("q"),
          unix_timestamp(date_trunc("day", col("o_orderdate")).cast("timestamp"))
            .as("day_epoch")),
      Some("""
        SELECT o_orderkey,
          CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
          CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-06-01') AS BIGINT) AS days_to,
          CAST(o_orderdate + INTERVAL 3 DAY AS DATE) AS plus3,
          CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m,
          last_day(CAST(o_orderdate AS DATE)) AS eom,
          CAST(quarter(o_orderdate) AS BIGINT) AS q,
          CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT) AS day_epoch
        FROM orders
      """)),

    // ---------------------------------------------------------------- q30
    // Pivot (explicit value list keeps the output schema deterministic —
    // inferred pivot values would force an extra distinct scan anyway).
    QueryDef(
      "q30_pivot",
      (s, dir) =>
        ev(s, dir)
          .withColumn("day", col("ts").cast("date"))
          .groupBy("day")
          .pivot("event_type", Seq("click", "view", "purchase", "error", "signup"))
          .count()
          .na.fill(0L),
      Some("""
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               COUNT(*) FILTER (event_type = 'click') AS click,
               COUNT(*) FILTER (event_type = 'view') AS view,
               COUNT(*) FILTER (event_type = 'purchase') AS purchase,
               COUNT(*) FILTER (event_type = 'error') AS error,
               COUNT(*) FILTER (event_type = 'signup') AS signup
        FROM events GROUP BY 1
      """)),

    // ---------------------------------------------------------------- q32
    // TPC-H Q3 shape (shipping priority): 3-way join, filtered both sides,
    // agg, global top-10 — the canonical fact-to-fact join-agg at scale.
    // The segment-filtered customer side is dimension-sized relative to the
    // two fact tables, but customer still scales with the dataset — no
    // forced hint (q05 policy): stats/AQE broadcast it while it fits, so
    // neither fact shuffles for the first join at bench SFs, and the plan
    // degrades to a shuffle join instead of an OOM at 100 TB.
    QueryDef(
      "q32_shipping_priority",
      (s, dir) =>
        Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
          .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
          .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
          .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
          .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
          .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("odate"))
          .agg(expr("cast(sum(cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(18,2)))) as double)").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10),
      Some("""
        SELECT l_orderkey, CAST(o_orderdate AS DATE) AS odate,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        ORDER BY revenue DESC, l_orderkey LIMIT 10
      """)),

    // ---------------------------------------------------------------- q33
    // TPC-H Q5 shape (local supplier volume): 5-way snowflake join with the
    // supplier-nation = customer-nation equi constraint.
    QueryDef(
      "q33_local_volume",
      (s, dir) =>
        Tables.customer(s, dir)
          .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
          .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
          // supplier is 1/10 the size of customer in this schema's ratios;
          // stats/AQE broadcast it at bench SFs (q05 hint policy), keeping
          // the fact stream partitioned on l_orderkey only
          .join(Tables.supplier(s, dir),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(expr("cast(sum(cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(18,2)))) as double)").as("revenue"),
            count(lit(1)).as("n_items")),
      Some("""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON o_orderkey = l_orderkey
                      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                      JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
      """)),

    // ---------------------------------------------------------------- q34
    // TPC-H Q16-ish: agg over an anti-joined dimension with a grouped
    // distinct count — join + NOT IN + count(distinct) in one plan.
    QueryDef(
      "q34_supplier_parts",
      (s, dir) => {
        val excluded = Tables.supplier(s, dir).filter(col("s_acctbal") < 0)
          .select(col("s_suppkey"))
        Tables.lineitem(s, dir)
          .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
          .join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy("p_brand", "p_type")
          .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
            count(lit(1)).as("n_lines"))
      },
      Some("""
        SELECT p_brand, p_type,
               COUNT(DISTINCT l_suppkey) AS n_suppliers, COUNT(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type
      """)),

    // ---------------------------------------------------------------- q31
    // Exact percentiles: Spark `percentile` and DuckDB `quantile_cont` share
    // the continuous-interpolation definition.
    //
    // SCALE NOTE: exact `percentile` buffers every value of a group in the
    // aggregation buffer — O(|group|) memory, an OOM at 100 TB group sizes.
    // It is kept because the oracle gate needs exact interpolation;
    // q31b_approx_percentiles below is the production path (t-digest sketch,
    // constant memory per group) and its error vs this query is pinned by
    // ApproxSpec.
    QueryDef(
      "q31_percentiles",
      (s, dir) =>
        ev(s, dir).groupBy("event_type")
          .agg(
            round(expr("percentile(value, 0.5)"), 6).as("p50"),
            round(expr("percentile(value, 0.9)"), 6).as("p90"),
            round(expr("percentile(value, array(0.25, 0.75))[1] - percentile(value, array(0.25, 0.75))[0]"), 6).as("iqr")),
      Some("""
        SELECT event_type,
               ROUND(quantile_cont(value, 0.5), 6) AS p50,
               ROUND(quantile_cont(value, 0.9), 6) AS p90,
               ROUND(quantile_cont(value, 0.75) - quantile_cont(value, 0.25), 6) AS iqr
        FROM events GROUP BY event_type
      """)),

    // ---------------------------------------------------------------- q35
    // Batch sessionization with Spark's NATIVE session_window (the same
    // primitive the streaming pipeline uses), pinned against an independent
    // gaps-and-islands formulation in DuckDB: new session when the gap from
    // the previous event reaches 4 h; session end = last event + gap
    // (Spark's [start, last+gap) window). One shuffle on user_id; the
    // session merge is per-group — the scale shape of streaming state.
    QueryDef(
      "q35_sessionize",
      (s, dir) =>
        ev(s, dir)
          .groupBy(col("user_id"), session_window(col("ts"), "4 hours").as("sw"))
          .agg(count(lit(1)).as("n_events"))
          .select(
            col("user_id"),
            unix_micros(col("sw.start")).as("session_start_us"),
            unix_micros(col("sw.end")).as("session_end_us"),
            col("n_events")),
      Some("""
        WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        m AS (
          SELECT user_id, us,
                 CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                        OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) >= 14400000000
                      THEN 1 ELSE 0 END AS new_s
          FROM e),
        s AS (
          SELECT user_id, us,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM m)
        SELECT user_id, MIN(us) AS session_start_us,
               MAX(us) + 14400000000 AS session_end_us, COUNT(*) AS n_events
        FROM s GROUP BY user_id, sid
      """)),

    // ---------------------------------------------------------------- q36
    // Cohort retention: cohort = a user's first active day; for offsets
    // 0..7 count distinct users of each cohort active again `offset` days
    // later. The product-analytics staple. Shape: per-user min-day agg +
    // distinct (user, day) activity share the user_id partitioning, the
    // cohort join is equi on user_id, then one (cohort, offset) agg —
    // distinct-day dedup happens BEFORE the join, so per-user fanout is
    // bounded by active days, never raw event count.
    QueryDef(
      "q36_retention",
      (s, dir) => {
        val days = ev(s, dir).select(col("user_id"), to_date(col("ts")).as("day"))
        val act = days.distinct()
        val cohort = act.groupBy("user_id").agg(min("day").as("cohort_day"))
        act.join(cohort, "user_id")
          .withColumn("offset", datediff(col("day"), col("cohort_day")).cast("long"))
          .where(col("offset") <= 7)
          .groupBy("cohort_day", "offset")
          .agg(count_distinct(col("user_id")).as("n_users"))
      },
      Some("""
        WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        c AS (SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY user_id)
        SELECT c.cohort_day, CAST(act.day - c.cohort_day AS BIGINT) AS "offset",
               CAST(COUNT(DISTINCT act.user_id) AS BIGINT) AS n_users
        FROM act JOIN c USING (user_id)
        WHERE act.day - c.cohort_day <= 7
        GROUP BY 1, 2
      """)),

    // ---------------------------------------------------------------- q37
    // Ordered conversion funnel signup → click → purchase with a 24 h
    // per-stage conversion window: each stage's timestamp must STRICTLY
    // follow the previous stage's earliest timestamp and land within 24 h
    // of it (min-ts chaining, the standard funnel semantics — without the
    // window the dense fixture converts everyone and the query stops
    // discriminating). Three per-user min aggs chained by equi joins on
    // user_id — co-partitioned under AQE, no window function, no ordering
    // shuffle; the per-user frame collapses to one row per stage before
    // any join.
    QueryDef(
      "q37_funnel",
      (s, dir) => {
        val winUs = 24L * 3600L * 1000000L
        val e = ev(s, dir).select(col("user_id"), col("event_type"), col("ts_us"))
        val t1 = e.where(col("event_type") === "signup")
          .groupBy("user_id").agg(min("ts_us").as("t1"))
        val t2 = e.where(col("event_type") === "click").join(t1, "user_id")
          .where(col("ts_us") > col("t1") && col("ts_us") <= col("t1") + winUs)
          .groupBy("user_id").agg(min("ts_us").as("t2"))
        val t3 = e.where(col("event_type") === "purchase").join(t2, "user_id")
          .where(col("ts_us") > col("t2") && col("ts_us") <= col("t2") + winUs)
          .groupBy("user_id").agg(min("ts_us").as("t3"))
        t1.join(t2.select("user_id", "t2"), Seq("user_id"), "left")
          .join(t3.select("user_id", "t3"), Seq("user_id"), "left")
          .select(when(col("t3").isNotNull, 3L)
            .when(col("t2").isNotNull, 2L).otherwise(1L).as("stage"))
          .groupBy("stage").agg(count(lit(1)).as("n_users"))
      },
      Some("""
        WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        t1 AS (SELECT user_id, MIN(ts_us) AS t1 FROM e WHERE event_type = 'signup' GROUP BY user_id),
        t2 AS (SELECT e.user_id, MIN(e.ts_us) AS t2 FROM e JOIN t1 USING (user_id)
               WHERE e.event_type = 'click' AND e.ts_us > t1.t1
                 AND e.ts_us <= t1.t1 + 86400000000 GROUP BY e.user_id),
        t3 AS (SELECT e.user_id, MIN(e.ts_us) AS t3 FROM e JOIN t2 USING (user_id)
               WHERE e.event_type = 'purchase' AND e.ts_us > t2.t2
                 AND e.ts_us <= t2.t2 + 86400000000 GROUP BY e.user_id)
        SELECT CAST(CASE WHEN t3.t3 IS NOT NULL THEN 3 WHEN t2.t2 IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS stage,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)
        GROUP BY 1
      """)),

    // ---------------------------------------------------------------- q38
    // Correlated SCALAR subqueries — the decorrelation shape q20 covers
    // for EXISTS: a per-user "above average" predicate and a per-user max
    // in the projection, all of which Catalyst must rewrite into
    // aggregate-then-join (no per-row re-execution exists in a batch
    // engine). The above-average comparison is value·n > sum over
    // DECIMAL(18,6) — exact arithmetic, per the q01 decimal-sum
    // convention: a raw double AVG would make borderline rows depend on
    // float summation ORDER, which differs between engines.
    QueryDef(
      "q38_scalar_subquery",
      (s, dir) => {
        Tables.events(s, dir).createOrReplaceTempView("events_q38")
        s.sql("""
          SELECT e.event_id, e.user_id, ROUND(e.value, 6) AS value,
                 (SELECT CAST(MAX(e3.event_id) AS BIGINT) FROM events_q38 e3
                  WHERE e3.user_id = e.user_id AND e3.event_type = 'error') AS last_error_id
          FROM events_q38 e
          WHERE e.event_type = 'purchase'
            AND CAST(e.value AS DECIMAL(18,6)) *
                (SELECT COUNT(*) FROM events_q38 e2
                 WHERE e2.user_id = e.user_id AND e2.event_type = 'purchase') >
                (SELECT SUM(CAST(e2.value AS DECIMAL(18,6))) FROM events_q38 e2
                 WHERE e2.user_id = e.user_id AND e2.event_type = 'purchase')
        """)
      },
      Some("""
        SELECT e.event_id, e.user_id, ROUND(e.value, 6) AS value,
               (SELECT CAST(MAX(e3.event_id) AS BIGINT) FROM events e3
                WHERE e3.user_id = e.user_id AND e3.event_type = 'error') AS last_error_id
        FROM events e
        WHERE e.event_type = 'purchase'
          AND CAST(e.value AS DECIMAL(18,6)) *
              (SELECT COUNT(*) FROM events e2
               WHERE e2.user_id = e.user_id AND e2.event_type = 'purchase') >
              (SELECT SUM(CAST(e2.value AS DECIMAL(18,6))) FROM events e2
               WHERE e2.user_id = e.user_id AND e2.event_type = 'purchase')
      """)),

    // ---------------------------------------------------------------- q39
    // percent_rank / cume_dist — the distribution half of the window-rank
    // family (q26 covers rank/dense_rank/ntile/lead). The (value,
    // event_id) order key is collision-free, so both functions are
    // rank-determined and engine-portable; one window shuffle on
    // event_type.
    QueryDef(
      "q39_rank_dist",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
        ev(s, dir).where(col("value") > 90)
          .select(col("event_id"), col("event_type"),
            round(col("value"), 6).as("value"),
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cume"))
      },
      Some("""
        SELECT event_id, event_type, ROUND(value, 6) AS value,
               ROUND(percent_rank() OVER w, 6) AS pct_rank,
               ROUND(cume_dist() OVER w, 6) AS cume
        FROM events WHERE value > 90
        WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
      """)),

    // ---------------------------------------------------------------- q40
    // Statistical-moments battery: corr / covar_pop / stddev_samp /
    // skewness / kurtosis per group — computed from EXACT integer power
    // sums, not the engines' builtin aggregates. The builtins disagree
    // across engines twice over: (a) float accumulation order differs, and
    // (b) DuckDB's skewness/kurtosis are sample-bias-corrected while
    // Spark's are population moments. Here l_quantity is an exact 1–50
    // integer and l_extendedprice is exact cents, so Σx, Σx², Σx³, Σx⁴,
    // Σxy are exact BIGINT/DECIMAL sums (order-independent), and both
    // engines then evaluate the SAME double expression tree over the same
    // exact inputs. One scan + one partial/final hash agg — the sums are
    // mergeable, so at 100 TB the shuffle carries |groups| rows of seven
    // longs, the same shape as q01. Magnitude audit at sf0.1 (600 k rows):
    // Σq⁴ ≤ 3.8e12, Σpq ≤ 3.2e14, Σp ≤ 6.3e12 — all < 2^62 (ANSI-safe);
    // Σp² ≤ 6.6e19 > int64 → DECIMAL(38,0) on the Spark side, HUGEINT
    // (automatic for SUM(BIGINT)) on DuckDB.
    QueryDef(
      "q40_stats_battery",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val q = col("l_quantity").cast("long")
        val p = round(col("l_extendedprice") * 100, 0).cast("long") // exact cents
        val sums = li.select(col("l_returnflag"), q.as("q"), p.as("p"))
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            sum(col("q")).as("sq"),
            sum(col("q") * col("q")).as("sq2"),
            sum(col("q") * col("q") * col("q")).as("sq3"),
            sum(col("q") * col("q") * col("q") * col("q")).as("sq4"),
            sum(col("p")).as("sp"),
            sum((col("p") * col("p")).cast("decimal(38,0)")).as("sp2"),
            sum(col("p") * col("q")).as("spq"))
        // identical double expression tree on both engines (see oracle)
        val nD = col("n").cast("double")
        def d(c: String) = col(c).cast("double")
        val meanQ = d("sq") / nD
        val meanP = d("sp") / nD
        val varQ = d("sq2") / nD - meanQ * meanQ
        val varP = d("sp2") / nD - meanP * meanP
        val covQP = d("spq") / nD - meanQ * meanP
        val m3 = d("sq3") / nD - lit(3.0) * meanQ * (d("sq2") / nD) +
          lit(2.0) * meanQ * meanQ * meanQ
        val m4 = d("sq4") / nD - lit(4.0) * meanQ * (d("sq3") / nD) +
          lit(6.0) * meanQ * meanQ * (d("sq2") / nD) -
          lit(3.0) * meanQ * meanQ * meanQ * meanQ
        sums.select(
          col("l_returnflag"),
          col("n"),
          round(covQP / sqrt(varQ * varP), 6).as("corr_qty_price"),
          round(covQP / lit(100.0), 6).as("covar_pop_qty_price"),
          round(sqrt((d("sq2") - d("sq") * d("sq") / nD) / (nD - lit(1.0))), 6)
            .as("stddev_qty"),
          round(m3 / sqrt(varQ * varQ * varQ), 6).as("skew_qty"),
          round(m4 / (varQ * varQ) - lit(3.0), 6).as("kurt_qty"))
      },
      Some("""
        WITH s AS (
          SELECT l_returnflag,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(q) AS sq, SUM(q*q) AS sq2, SUM(q*q*q) AS sq3,
                 SUM(q*q*q*q) AS sq4,
                 SUM(p) AS sp, SUM(p*p) AS sp2, SUM(p*q) AS spq
          FROM (SELECT l_returnflag,
                       CAST(l_quantity AS BIGINT) AS q,
                       CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS p
                FROM lineitem)
          GROUP BY l_returnflag),
        -- double stage: the SAME expression tree as the Spark side (explicit
        -- multiplications, no power() — pow may differ from repeated * in ulps)
        d AS (
          SELECT l_returnflag, n,
                 CAST(n AS DOUBLE) AS nd,
                 CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) AS mq,
                 CAST(sp AS DOUBLE) / CAST(n AS DOUBLE) AS mp,
                 CAST(sq AS DOUBLE) AS sqd, CAST(sq2 AS DOUBLE) AS sq2d,
                 CAST(sq3 AS DOUBLE) AS sq3d, CAST(sq4 AS DOUBLE) AS sq4d,
                 CAST(sp2 AS DOUBLE) AS sp2d, CAST(spq AS DOUBLE) AS spqd
          FROM s),
        m AS (
          SELECT l_returnflag, n, nd, mq, mp, sqd, sq2d, sq3d, sq4d,
                 sq2d / nd - mq * mq AS vq,
                 sp2d / nd - mp * mp AS vp,
                 spqd / nd - mq * mp AS cov
          FROM d)
        SELECT l_returnflag, n,
          ROUND(cov / sqrt(vq * vp), 6) AS corr_qty_price,
          ROUND(cov / 100.0, 6) AS covar_pop_qty_price,
          ROUND(sqrt((sq2d - sqd * sqd / nd) / (nd - 1.0)), 6) AS stddev_qty,
          ROUND((sq3d / nd - 3.0 * mq * (sq2d / nd) + 2.0 * mq * mq * mq)
                / sqrt(vq * vq * vq), 6) AS skew_qty,
          ROUND((sq4d / nd - 4.0 * mq * (sq3d / nd)
                 + 6.0 * mq * mq * (sq2d / nd) - 3.0 * mq * mq * mq * mq)
                / (vq * vq) - 3.0, 6) AS kurt_qty
        FROM m
      """)),

    // ---------------------------------------------------------------- q41
    // NATIVE unpivot (wide → long): q30 covers the conditional-agg
    // formulation; this exercises Spark's melt/Expand operator itself —
    // the Expand emits |measures| rows per input row map-side (no shuffle
    // until the downstream agg, whose partials collapse the 4× expansion
    // back to |groups| before the exchange). Decimal-exact sums, min/max
    // order-independent, avg derived from the exact sum.
    QueryDef(
      "q41_unpivot",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select("l_returnflag", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
        li.unpivot(
            Array(col("l_returnflag")),
            Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
            "measure", "val")
          .groupBy("l_returnflag", "measure")
          .agg(
            count(lit(1)).as("n"),
            round(sum(col("val").cast("decimal(18,6)")).cast("double"), 6).as("total"),
            round(sum(col("val").cast("decimal(18,6)")).cast("double") / count(lit(1)), 6).as("avg_val"),
            round(min(col("val")), 6).as("min_val"),
            round(max(col("val")), 6).as("max_val"))
      },
      Some("""
        SELECT l_returnflag, measure,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(CAST(SUM(CAST(val AS DECIMAL(18,6))) AS DOUBLE), 6) AS total,
               ROUND(CAST(SUM(CAST(val AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_val,
               ROUND(MIN(val), 6) AS min_val,
               ROUND(MAX(val), 6) AS max_val
        FROM (UNPIVOT (SELECT l_returnflag, l_quantity, l_extendedprice, l_discount, l_tax
                       FROM lineitem)
              ON l_quantity, l_extendedprice, l_discount, l_tax
              INTO NAME measure VALUE val)
        GROUP BY l_returnflag, measure
      """)),

    // ---------------------------------------------------------------- q42
    // Gap-filling (LOCF + backfill) via IGNORE NULLS window functions —
    // the time-series repair surface the frame battery (q23) doesn't
    // touch: error events null their reading, forward-fill carries the
    // last good value, backfill the next good one. One window shuffle on
    // user_id serves both directions (same partitioning, mirrored
    // frames); (ts_us, event_id) ordering is collision-free.
    QueryDef(
      "q42_gap_fill",
      (s, dir) => {
        val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
        val ffillW = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val bfillW = byUser.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        ev(s, dir)
          .select(col("user_id"), col("event_id"), col("ts_us"),
            when(col("event_type") === "error", lit(null).cast("double"))
              .otherwise(round(col("value"), 6)).as("v"))
          .select(col("user_id"), col("event_id"), col("v"),
            round(last(col("v"), ignoreNulls = true).over(ffillW), 6).as("ffill"),
            round(first(col("v"), ignoreNulls = true).over(bfillW), 6).as("bfill"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                 CASE WHEN event_type = 'error' THEN NULL ELSE ROUND(value, 6) END AS v
          FROM events)
        SELECT user_id, event_id, v,
               ROUND(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS ffill,
               ROUND(first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 6) AS bfill
        FROM e
      """)),

    // ---------------------------------------------------------------- q43
    // TPC-H Q18 shape (large-volume orders): HAVING-filtered fact
    // aggregate joined back to facts + a broadcast dim. The decimal-exact
    // quantity sum gates BEFORE the joins, so the order join only sees the
    // surviving keys (Catalyst pushes the aggregate below the join — at
    // 100 TB the big-orders side is a small fraction of lineitem).
    QueryDef(
      "q43_big_orders",
      (s, dir) => {
        val big = Tables.lineitem(s, dir)
          .groupBy("l_orderkey")
          .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
          .filter(col("sum_qty") > 150)
        big.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("o_totalprice"), col("sum_qty"))
      },
      Some("""
        WITH big AS (
          SELECT l_orderkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150)
        SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
        FROM big JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
      """)),

    // ---------------------------------------------------------------- q44
    // TPC-H Q21 shape (suppliers who kept orders waiting): one correlated
    // EXISTS + one correlated NOT EXISTS over the same derived "late"
    // relation — the hardest decorrelation pattern in the TPC-H set
    // (Catalyst rewrites to a semi join + an anti join on l_orderkey with
    // the <> residual). "Late" = shipped more than 90 days after the
    // order date (this schema has no receipt/commit dates).
    QueryDef(
      "q44_waiting_suppliers",
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_q44")
        Tables.orders(s, dir).createOrReplaceTempView("orders_q44")
        Tables.supplier(s, dir).createOrReplaceTempView("supplier_q44")
        s.sql("""
          WITH l1 AS (SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
                      FROM lineitem_q44 JOIN orders_q44 ON l_orderkey = o_orderkey),
          late AS (SELECT * FROM l1 WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY)
          SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
          FROM late l JOIN supplier_q44 s ON s.s_suppkey = l.l_suppkey
          WHERE EXISTS (SELECT 1 FROM lineitem_q44 l2
                        WHERE l2.l_orderkey = l.l_orderkey AND l2.l_suppkey <> l.l_suppkey)
            AND NOT EXISTS (SELECT 1 FROM late l3
                            WHERE l3.l_orderkey = l.l_orderkey AND l3.l_suppkey <> l.l_suppkey)
          GROUP BY s_name
        """)
      },
      Some("""
        WITH l1 AS (SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
                    FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        late AS (SELECT * FROM l1 WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY)
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM late l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        WHERE EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l.l_orderkey AND l2.l_suppkey <> l.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late l3
                          WHERE l3.l_orderkey = l.l_orderkey AND l3.l_suppkey <> l.l_suppkey)
        GROUP BY s_name
      """)),

    // ---------------------------------------------------------------- q45
    // Snowflake join: the fact chains through THREE nested dimension hops
    // (supplier → nation → region) — q33 exercises two. All three dims
    // broadcast, so the fact side never shuffles; the rollup is one
    // partial/final agg on r_name. Revenue decimal-exact per q01.
    QueryDef(
      "q45_snowflake",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(
            count(lit(1)).as("n_items"),
            sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
              .cast("decimal(18,6)")).cast("double").as("revenue"))
      },
      Some("""
        SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
      """)),

    // ---------------------------------------------------------------- q46
    // RECURSIVE CTE (new engine surface in Spark 4): calendar fill — a
    // recursively generated day spine left-joined to a sparse daily
    // aggregate, zero-filling missing days (at sf0.001, 11 of the 30 days
    // have no qualifying purchase and must still appear). The recursion
    // is bounded by the literal date range, so the plan is a 30-row local
    // spine + one broadcast-able join against the aggregated facts.
    QueryDef(
      "q46_calendar_fill",
      (s, dir) => {
        Tables.events(s, dir).createOrReplaceTempView("events_q46")
        s.sql("""
          WITH RECURSIVE days(day) AS (
            SELECT DATE '2024-01-01'
            UNION ALL
            SELECT date_add(day, 1) FROM days WHERE day < DATE '2024-01-30'),
          p AS (SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS rev
                FROM events_q46 WHERE event_type = 'purchase' AND value > 99 GROUP BY 1)
          SELECT days.day, CAST(COALESCE(p.n, 0) AS BIGINT) AS n_purchases,
                 COALESCE(p.rev, 0.0D) AS revenue
          FROM days LEFT JOIN p ON days.day = p.day
        """)
      },
      Some("""
        WITH RECURSIVE days(day) AS (
          SELECT DATE '2024-01-01'
          UNION ALL
          SELECT day + 1 FROM days WHERE day < DATE '2024-01-30'),
        p AS (SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS rev
              FROM events WHERE event_type = 'purchase' AND value > 99 GROUP BY 1)
        SELECT days.day, CAST(COALESCE(p.n, 0) AS BIGINT) AS n_purchases,
               COALESCE(p.rev, 0.0) AS revenue
        FROM days LEFT JOIN p ON days.day = p.day
      """)),

    // ---------------------------------------------------------------- q47
    // Null-safe equality join (<=> ≙ IS NOT DISTINCT FROM): both sides
    // derive a NULLABLE bucket key (readings ≥ 99 are anonymized to NULL),
    // and the NULL buckets must MATCH each other — the semantics a plain
    // equi join silently drops. Spark folds EqualNullSafe into the hash
    // join key (coalesce-wrapped), so this still plans a hash join, not a
    // nested loop.
    QueryDef(
      "q47_null_safe_join",
      (s, dir) => {
        def bucketed(eventType: String, outCol: String) =
          ev(s, dir).filter(col("event_type") === eventType)
            .select(when(col("value") >= 99, lit(null).cast("long"))
              .otherwise(floor(col("value") / 10).cast("long")).as("k"))
            .groupBy("k").agg(count(lit(1)).as(outCol))
        val p = bucketed("purchase", "n_purchases")
        val v = bucketed("view", "n_views")
        p.join(v, p("k") <=> v("k"))
          .select(p("k").as("bucket"), col("n_purchases"), col("n_views"))
      },
      Some("""
        WITH p AS (SELECT CASE WHEN value >= 99 THEN NULL
                               ELSE CAST(FLOOR(value / 10) AS BIGINT) END AS k,
                          CAST(COUNT(*) AS BIGINT) AS n_purchases
                   FROM events WHERE event_type = 'purchase' GROUP BY 1),
        v AS (SELECT CASE WHEN value >= 99 THEN NULL
                          ELSE CAST(FLOOR(value / 10) AS BIGINT) END AS k,
                     CAST(COUNT(*) AS BIGINT) AS n_views
              FROM events WHERE event_type = 'view' GROUP BY 1)
        SELECT p.k AS bucket, n_purchases, n_views
        FROM p JOIN v ON p.k IS NOT DISTINCT FROM v.k
      """)),

    // ---------------------------------------------------------------- q48
    // Aggregate FILTER clause — conditional aggregation as first-class
    // syntax (q30's pivot does it via CASE WHEN; FILTER is the standard
    // form both engines parse): several differently-filtered measures out
    // of ONE scan + ONE agg, no self-joins.
    QueryDef(
      "q48_filtered_agg",
      (s, dir) => {
        ev(s, dir).createOrReplaceTempView("events_q48")
        s.sql("""
          SELECT user_id % 50 AS cohort,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
                 CAST(COUNT(*) FILTER (WHERE value > 90) AS BIGINT) AS n_high,
                 CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase_value,
                 CAST(COUNT(DISTINCT user_id) FILTER (WHERE event_type = 'error') AS BIGINT) AS err_users
          FROM events_q48 GROUP BY user_id % 50
        """)
      },
      Some("""
        SELECT user_id % 50 AS cohort,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
               CAST(COUNT(*) FILTER (WHERE value > 90) AS BIGINT) AS n_high,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase_value,
               CAST(COUNT(DISTINCT user_id) FILTER (WHERE event_type = 'error') AS BIGINT) AS err_users
        FROM events GROUP BY user_id % 50
      """)),

    // ---------------------------------------------------------------- q49
    // Correlated LATERAL subquery with ORDER BY + LIMIT — per-row top-k
    // as first-class syntax (q04 is the window formulation; LATERAL is
    // the decorrelation path Catalyst rewrites via
    // DecorrelateInnerQuery). Bounded driver set (user_id < 20), unique
    // (value, event_id) ordering.
    QueryDef(
      "q49_lateral_topk",
      (s, dir) => {
        ev(s, dir).createOrReplaceTempView("events_q49")
        s.sql("""
          WITH u AS (SELECT DISTINCT user_id FROM events_q49 WHERE user_id < 20)
          SELECT u.user_id, l.event_id, ROUND(l.value, 6) AS value
          FROM u, LATERAL (
            SELECT event_id, value FROM events_q49 e
            WHERE e.user_id = u.user_id AND e.event_type = 'purchase'
            ORDER BY e.value DESC, e.event_id LIMIT 3) l
        """)
      },
      Some("""
        WITH u AS (SELECT DISTINCT user_id FROM events WHERE user_id < 20)
        SELECT u.user_id, l.event_id, ROUND(l.value, 6) AS value
        FROM u, LATERAL (
          SELECT event_id, value FROM events e
          WHERE e.user_id = u.user_id AND e.event_type = 'purchase'
          ORDER BY e.value DESC, e.event_id LIMIT 3) l
      """)),

    // ---------------------------------------------------------------- q50
    // Rolling anomaly detection: per-user z-score of each reading against
    // its TRAILING 24 HOURS (a value-based RANGE frame on µs event time —
    // q23's frame battery is row/value-based; this is the time-window
    // member; at the gate SF ~1.9k readings clear the n ≥ 5 threshold, so
    // the arithmetic is genuinely exercised). Determinism is q40's trick
    // applied to windows: the frame aggregates are EXACT decimal sums of
    // value and value² (order-free), and only the final mean/std/z formula
    // runs in doubles — identical expression tree on both engines. The
    // guard tests the variance RADICAND, not the sqrt: catastrophic
    // cancellation on a constant-valued frame can make it a tiny NEGATIVE,
    // where Spark's sqrt returns NaN (and NaN compares greatest) while
    // DuckDB's sqrt hard-errors.
    QueryDef(
      "q50_rolling_anomaly",
      (s, dir) => {
        val day = 24L * 3600L * 1000000L
        val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
          .rangeBetween(-day, Window.currentRow)
        val s1 = sum(col("value").cast("decimal(18,6)")).over(w).cast("double")
        val n = count(lit(1)).over(w).cast("double")
        val s2 = sum((col("value").cast("decimal(18,6)") * col("value").cast("decimal(18,6)"))
          .cast("decimal(38,12)")).over(w).cast("double")
        val mean = s1 / n
        val rad = (s2 - s1 * s1 / n) / (n - lit(1.0))
        // numerator uses the 6-dp-rounded reading — the same value the
        // oracle's output column carries (raw doubles may differ past 6dp)
        val z = when(n >= 5 && rad > 0, round((round(col("value"), 6) - mean) / sqrt(rad), 6))
        ev(s, dir)
          .select(col("user_id"), col("event_id"), col("ts_us"),
            round(col("value"), 6).as("value"),
            n.cast("long").as("n_window"),
            z.as("zscore"))
          .withColumn("is_anomaly", col("zscore").isNotNull && abs(col("zscore")) > 2)
      },
      Some("""
        WITH w AS (
          SELECT user_id, event_id, epoch_us(ts) AS ts_us, ROUND(value, 6) AS value,
                 CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER win AS DOUBLE) AS s1,
                 CAST(COUNT(*) OVER win AS DOUBLE) AS n,
                 CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))
                           AS DECIMAL(38,12))) OVER win AS DOUBLE) AS s2
          FROM events
          WINDOW win AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                         RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW))
        SELECT user_id, event_id, ts_us, value,
               CAST(n AS BIGINT) AS n_window,
               CASE WHEN n >= 5 AND (s2 - s1 * s1 / n) / (n - 1.0) > 0
                    THEN ROUND((value - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1.0)), 6)
               END AS zscore,
               COALESCE(ABS(CASE WHEN n >= 5 AND (s2 - s1 * s1 / n) / (n - 1.0) > 0
                    THEN ROUND((value - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1.0)), 6)
               END) > 2, FALSE) AS is_anomaly
        FROM w
      """)),

    // ---------------------------------------------------------------- q51
    // VARIANT (new semi-structured type in Spark 4; q18/q25 are the
    // string-path JSON queries): parse_json once into a variant column,
    // then typed variant_get extraction feeding a grouped aggregate — the
    // parse-once/extract-many pattern the binary-encoded type exists for.
    QueryDef(
      "q51_variant",
      (s, dir) => {
        ev(s, dir).createOrReplaceTempView("events_q51")
        s.sql("""
          WITH v AS (SELECT event_type, parse_json(props) AS pv FROM events_q51
                     WHERE props IS NOT NULL)
          SELECT event_type,
                 CAST(FLOOR(variant_get(pv, '$.k', 'bigint') / 10.0) AS BIGINT)
                   AS k_decile,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(variant_get(pv, '$.k', 'bigint')) AS BIGINT) AS k_sum
          FROM v
          GROUP BY event_type,
                   CAST(FLOOR(variant_get(pv, '$.k', 'bigint') / 10.0) AS BIGINT)
        """)
      },
      Some("""
        SELECT event_type,
               CAST(FLOOR(CAST(json_extract_string(props, '$.k') AS BIGINT) / 10.0) AS BIGINT) AS k_decile,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
        FROM events WHERE props IS NOT NULL
        GROUP BY 1, 2
      """)),

    // approx_percentile: the constant-memory-per-group percentile path that
    // actually survives 100 TB group sizes (see the q31 scale note).
    // Sketch-based → not hash-comparable across engines → rows-only; the
    // |approx − exact| bound is asserted by ApproxSpec.
    QueryDef(
      "q31b_approx_percentiles",
      (s, dir) =>
        ev(s, dir).groupBy("event_type")
          .agg(
            round(expr("approx_percentile(value, 0.5, 10000)"), 6).as("p50"),
            round(expr("approx_percentile(value, 0.9, 10000)"), 6).as("p90")),
      None, bench = false),

    // ---------------------------------------------------------------- q52
    // LISTAGG WITHIN GROUP (Spark 4 surface; SQL:2023): per market
    // segment, the keys of the 3 highest-value orders as one ordered CSV
    // cell — the "top-k as a report column" shape. Deterministic by
    // construction: row_number with a unique o_orderkey tie-break feeds
    // the WITHIN GROUP order, so the string is stable on any engine.
    // Plan: one window over the segment (customer dim broadcast) + one
    // hash agg — the only full-sort is within 5 groups of 3 rows.
    QueryDef(
      "q52_listagg",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders_q52")
        Tables.customer(s, dir).createOrReplaceTempView("customer_q52")
        s.sql("""
          WITH ranked AS (
            SELECT c_mktsegment, o_orderkey,
                   ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                     ORDER BY o_totalprice DESC, o_orderkey) AS rk
            FROM orders_q52 JOIN customer_q52 ON o_custkey = c_custkey)
          SELECT c_mktsegment,
                 listagg(CAST(o_orderkey AS STRING), ',')
                   WITHIN GROUP (ORDER BY rk) AS top_orders,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM ranked WHERE rk <= 3
          GROUP BY c_mktsegment
        """)
      },
      Some("""
        WITH ranked AS (
          SELECT c_mktsegment, o_orderkey,
                 ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                   ORDER BY o_totalprice DESC, o_orderkey) AS rk
          FROM orders JOIN customer ON o_custkey = c_custkey)
        SELECT c_mktsegment,
               string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY rk) AS top_orders,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM ranked WHERE rk <= 3
        GROUP BY c_mktsegment
      """)),

    // ---------------------------------------------------------------- q53
    // SQL pipe syntax (Spark 4 surface, |> operators): q01's
    // filter → aggregate → having chain restated as a pipeline. Same
    // Catalyst plan as the nested form — the surface is sugar, the scan +
    // partial/final agg pair underneath is identical (and the oracle IS
    // the nested form, proving the equivalence end-to-end).
    QueryDef(
      "q53_pipe_syntax",
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_q53")
        s.sql("""
          FROM lineitem_q53
          |> WHERE l_shipdate <= DATE '1998-09-02'
          |> AGGREGATE CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
                       CAST(COUNT(*) AS BIGINT) AS n_rows
             GROUP BY l_returnflag, l_linestatus
          |> WHERE n_rows > 10
        """)
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        HAVING COUNT(*) > 10
      """)),

    // ---------------------------------------------------------------- q54
    // TPC-H Q17 (small-quantity-order revenue): a correlated scalar
    // AGGREGATE subquery in WHERE — the decorrelation shape q38's scalar
    // subqueries don't cover (the per-partkey average must become a
    // grouped aggregate joined back, or the plan degenerates to a
    // per-row nested loop; PlanRegressionSpec pins the join form).
    // Determinism: the brand-filtered revenue and the per-part average
    // both run on decimal-exact sums, doubles appear only at the final
    // ROUND and the 0.2× threshold — identical chains on both engines.
    QueryDef(
      "q54_small_qty_revenue",
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_q54")
        Tables.part(s, dir).createOrReplaceTempView("part_q54")
        s.sql("""
          SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue,
                 ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                       / 7.0, 6) AS avg_yearly
          FROM lineitem_q54 JOIN part_q54 ON p_partkey = l_partkey
          WHERE p_brand = 'Brand#4'
            AND l_quantity <
                (SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,6)))
                                    AS DOUBLE) / COUNT(*))
                 FROM lineitem_q54 l2 WHERE l2.l_partkey = p_partkey)
        """)
      },
      Some("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                     / 7.0, 6) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#4'
          AND l_quantity <
              (SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,6)))
                                  AS DOUBLE) / COUNT(*))
               FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
      """)),

    // ---------------------------------------------------------------- q55
    // ANSI-safety battery: this engine runs Spark 4 with ANSI mode ON
    // (divide-by-zero and bad casts THROW), so `try_divide`/`try_cast`
    // are the production idiom for dirty data — NULL instead of a killed
    // job. Each try-site is row-MIXED (some rows succeed, some null) so
    // neither branch is dead, and the outputs are pure counts — no
    // float-sum ordering to disagree on.
    QueryDef(
      "q55_ansi_safety",
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_q55")
        s.sql("""
          SELECT l_returnflag,
                 CAST(COUNT(*) AS BIGINT) AS n_rows,
                 CAST(SUM(CASE WHEN try_divide(l_extendedprice, l_quantity - 25)
                                    IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_div_by_zero,
                 CAST(SUM(CASE WHEN try_cast(
                        CASE WHEN l_quantity > 25
                             THEN CAST(CAST(l_quantity AS BIGINT) AS STRING)
                             ELSE l_returnflag END AS INT) IS NULL
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_cast_fail,
                 CAST(SUM(CASE WHEN try_cast(
                        CASE WHEN l_quantity > 25
                             THEN CAST(CAST(l_quantity AS BIGINT) AS STRING)
                             ELSE l_returnflag END AS INT) IS NOT NULL
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_cast_ok
          FROM lineitem_q55
          GROUP BY l_returnflag
        """)
      },
      Some("""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN l_extendedprice / NULLIF(l_quantity - 25, 0)
                                  IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_div_by_zero,
               CAST(SUM(CASE WHEN TRY_CAST(
                      CASE WHEN l_quantity > 25
                           THEN CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)
                           ELSE l_returnflag END AS INTEGER) IS NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_cast_fail,
               CAST(SUM(CASE WHEN TRY_CAST(
                      CASE WHEN l_quantity > 25
                           THEN CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)
                           ELSE l_returnflag END AS INTEGER) IS NOT NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_cast_ok
        FROM lineitem
        GROUP BY l_returnflag
      """)),

    // ---------------------------------------------------------------- q56
    // Per-key CUSUM changepoint statistic (Page 1954): a SEQUENTIAL
    // recurrence — S_t depends on S_{t−1}'s RESULT, which no window frame
    // can express — run with the secondary-sort fold (repartition +
    // sortWithinPartitions + one streaming pass; see
    // [[graft.operators.Monitoring]]), the shape that survives unbounded
    // per-key groups. Exact decimal arithmetic end to end, so even a
    // 2000-step recurrence hash-matches the oracle's recursive CTE.
    // Dials sized to the fixture: drift 100 / threshold 300 → alarms AND
    // resets both fire at the gate SF (14 vs 8081 of 10000 rows).
    // Final projection casts x/cusum to DOUBLE (catalog convention: no
    // DECIMAL columns in gate outputs — fixed-scale decimal rendering
    // trips the driver's hasher; arithmetic stays decimal-exact inside).
    QueryDef(
      "q56_cusum",
      (s, dir) => graft.operators.Monitoring.cusum(
          ev(s, dir), "event_type", "ts_us", "event_id", "value",
          drift = "100", threshold = "300")
        .select(col("key").as("event_type"), col("ord").as("ts_us"),
          col("tie").as("event_id"), col("x").cast("double").as("x"),
          col("cusum").cast("double").as("cusum"), col("alarm")),
      Some("""
        WITH RECURSIVE ordered AS (
          SELECT event_type, event_id, epoch_us(ts) AS ts_us,
                 CAST(ROUND(value, 6) AS DECIMAL(18,6)) AS x,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY epoch_us(ts), event_id) AS rn
          FROM events WHERE value IS NOT NULL),
        c AS (
          SELECT event_type, event_id, ts_us, x, rn,
                 GREATEST(CAST(0 AS DECIMAL(28,6)),
                          CAST(x - 100 AS DECIMAL(28,6))) AS cusum
          FROM ordered WHERE rn = 1
          UNION ALL
          SELECT o.event_type, o.event_id, o.ts_us, o.x, o.rn,
                 GREATEST(CAST(0 AS DECIMAL(28,6)),
                          CAST(c.cusum + o.x - 100 AS DECIMAL(28,6)))
          FROM c JOIN ordered o
            ON o.event_type = c.event_type AND o.rn = c.rn + 1)
        SELECT event_type, ts_us, event_id, CAST(x AS DOUBLE) AS x,
               CAST(ROUND(cusum, 6) AS DOUBLE) AS cusum,
               ROUND(cusum, 6) > 300 AS alarm
        FROM c
      """)),

    // ---------------------------------------------------------------- q57
    // Autocorrelation function per event type, lags 1–3 — the "is this
    // metric stream independent or drifting" dial next to q56's CUSUM.
    // q40's exact-moment discipline on LAGGED pairs: micro-unit integer
    // values, exact integer/decimal power sums (one window pass + one
    // agg), the scale-invariant corr formula evaluated in doubles only at
    // the end — identical expression tree on both engines.
    QueryDef(
      "q57_acf",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = ev(s, dir).select(col("event_type"), col("ts_us"), col("event_id"),
          round(col("value") * 1e6, 0).cast("long").as("v"))
        val w = Window.partitionBy("event_type").orderBy(col("ts_us"), col("event_id"))
        val lagged = e.select(
          (col("event_type") +: col("v").as("x") +:
            (1 to 3).map(k => lag(col("v"), k).over(w).as(s"y$k"))): _*)
        val perLag = (1 to 3).map { k =>
          lagged.filter(col(s"y$k").isNotNull)
            .select(col("event_type"), lit(k.toLong).as("lag"),
              col("x"), col(s"y$k").as("y"))
        }.reduce(_ unionAll _)
        val sums = perLag.groupBy("event_type", "lag").agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x").cast("decimal(19,0)") * col("x").cast("decimal(19,0)")).as("sxx"),
          sum(col("y").cast("decimal(19,0)") * col("y").cast("decimal(19,0)")).as("syy"),
          sum(col("x").cast("decimal(19,0)") * col("y").cast("decimal(19,0)")).as("sxy"))
        val nD = col("n").cast("double")
        def d(c: String) = col(c).cast("double")
        val num = nD * d("sxy") - d("sx") * d("sy")
        val den = sqrt((nD * d("sxx") - d("sx") * d("sx")) *
          (nD * d("syy") - d("sy") * d("sy")))
        sums.select(col("event_type"), col("lag"), col("n").as("n_pairs"),
          round(num / den, 6).as("acf"))
      },
      Some("""
        WITH v AS (
          SELECT event_type, epoch_us(ts) AS ts_us, event_id,
                 CAST(ROUND(value * 1000000, 0) AS BIGINT) AS v
          FROM events),
        lagged AS (
          SELECT event_type, v AS x,
                 LAG(v, 1) OVER w AS y1, LAG(v, 2) OVER w AS y2,
                 LAG(v, 3) OVER w AS y3
          FROM v
          WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id)),
        pairs AS (
          SELECT event_type, CAST(1 AS BIGINT) AS lag, x, y1 AS y FROM lagged WHERE y1 IS NOT NULL
          UNION ALL
          SELECT event_type, CAST(2 AS BIGINT), x, y2 FROM lagged WHERE y2 IS NOT NULL
          UNION ALL
          SELECT event_type, CAST(3 AS BIGINT), x, y3 FROM lagged WHERE y3 IS NOT NULL),
        s AS (
          SELECT event_type, lag, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                 SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx,
                 SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS syy,
                 SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS sxy
          FROM pairs GROUP BY event_type, lag)
        SELECT event_type, lag, n AS n_pairs,
               ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
                 AS acf
        FROM s
      """)),

    // ---------------------------------------------------------------- q58
    // GROUP BY ALL / ORDER BY ALL (the Spark-4 analyst-SQL sugar both
    // engines now share): grouping keys inferred from the non-aggregate
    // projection, ordering over the whole output row left-to-right. The
    // RESOLUTION is the surface under test — a column the inference
    // wrongly pulls into (or drops from) the grouping set changes the
    // row count and fails the hash — while the aggregates themselves
    // follow the q53 convention (integral quantity sums as BIGINT, no
    // decimal output columns).
    QueryDef(
      "q58_group_by_all",
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_q58")
        s.sql("""
          SELECT l_returnflag, l_linestatus,
                 CAST(COUNT(*) AS BIGINT) AS n_rows,
                 CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
          FROM lineitem_q58
          WHERE l_shipdate <= DATE '1998-09-02'
          GROUP BY ALL
          ORDER BY ALL
        """)
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY ALL
        ORDER BY ALL
      """)),

    // ---------------------------------------------------------------- q59
    // Correlated LATERAL subquery with ORDER BY + LIMIT — the top-k-per-
    // group shape written the analyst way (q04's window restated as a
    // lateral): for each nation, its two richest customers. The surface
    // under test is the DECORRELATION of a limit-bearing lateral (a naive
    // plan re-runs the inner query per outer row; nation's 25-row bound
    // keeps even that harmless, but the hash check pins the semantics —
    // per-group ordering, tie-break, inner-join drop of empty groups).
    // acctbal leaves as exact integer cents (no float output column).
    QueryDef(
      "q59_lateral_topk",
      (s, dir) => {
        Tables.nation(s, dir).createOrReplaceTempView("nation_q59")
        Tables.customer(s, dir).createOrReplaceTempView("customer_q59")
        s.sql("""
          SELECT n_name, t.c_custkey,
                 CAST(ROUND(t.c_acctbal * 100, 0) AS BIGINT) AS acctbal_cents
          FROM nation_q59 n,
          LATERAL (SELECT c_custkey, c_acctbal
                   FROM customer_q59
                   WHERE c_nationkey = n.n_nationkey
                   ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        """)
      },
      Some("""
        SELECT n_name, t.c_custkey,
               CAST(ROUND(t.c_acctbal * 100, 0) AS BIGINT) AS acctbal_cents
        FROM nation n,
        LATERAL (SELECT c_custkey, c_acctbal
                 FROM customer
                 WHERE c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
      """))
  )
}
