package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType}

import graft.queries.Q.{dsum, t}
import graft.queries.QueryDef.of

/** The engine's relational surface (SURVEY §2.4-2.9): aggregation, joins of
  * every flavor, windows, sorts/top-k, set ops, rollup, scalar/string/date/
  * JSON functions, explode. Each query is paired with its DuckDB oracle; all
  * queries carry a total ORDER BY (unique tiebreak) so row order matches, and
  * money aggregates go through the exact-decimal pattern in [[Q.dsum]].
  *
  * Scale notes (100 TB design stance): aggregations rely on Catalyst's
  * partial/final hash-agg split (map-side combine before the shuffle); joins
  * to the small dimension tables are explicitly `broadcast()` so the fact
  * table never shuffles; AQE handles skew/coalescing at runtime.
  */
object RelationalQueries {

  /** The CDC fixture shared by q51 (batch apply) and e29 (streaming
    * apply): base = orders < 3000 projected; changelog = two generations
    * for every %5 key (gen-2 supersedes gen-1; %15 keys delete) plus
    * brand-new insert keys — so supersession, overwrite, delete and
    * insert all exercise. Returned split (base, gen1, gen2+inserts) so
    * the streaming twin can feed the generations as separate
    * micro-batches and supersession crosses the batch boundary.
    */
  private[queries] def cdcParts(s: org.apache.spark.sql.SparkSession, d: String):
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) = {
    // fraction window, same rationale as pitHistory (2% at any scale);
    // read through the residue layout so the window PRUNES (r15 #5)
    val o = Q.ordersWindow(s, d, 60)
    val base = o.select("o_orderkey", "o_orderstatus", "o_totalprice")
    val c1 = o.filter(pmod(col("o_orderkey"), lit(5)) === 0)
      .select(col("o_orderkey"), lit("U").as("op"), col("o_orderstatus"),
        (col("o_totalprice") * 1.05).as("o_totalprice"),
        (col("o_orderdate").cast("timestamp") + expr("INTERVAL 10 DAYS")).as("ts"))
    val c2 = o.filter(pmod(col("o_orderkey"), lit(5)) === 0)
      .select(col("o_orderkey"),
        when(pmod(col("o_orderkey"), lit(15)) === 0, "D").otherwise("U").as("op"),
        col("o_orderstatus"), (col("o_totalprice") * 1.10).as("o_totalprice"),
        (col("o_orderdate").cast("timestamp") + expr("INTERVAL 20 DAYS")).as("ts"))
    val c3 = o.filter(pmod(col("o_orderkey"), lit(8)) === 0)
      .select((col("o_orderkey") + 1000000L).as("o_orderkey"),
        lit("U").as("op"), lit("N").as("o_orderstatus"),
        col("o_totalprice"),
        (col("o_orderdate").cast("timestamp") + expr("INTERVAL 5 DAYS")).as("ts"))
    (base, c1, c2.unionByName(c3))
  }

  /** The q51/e29 shared oracle: from-scratch changelog + latest-wins +
    * apply, so the batch and streaming maintenance paths grade against
    * one SQL definition (the hllEventsSql contract).
    */
  private[queries] val cdcOracleSql =
    """WITH o AS (SELECT * FROM orders WHERE o_orderkey % 3000 < 60),
      |base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM o),
      |ch AS (
      |  SELECT o_orderkey, 'U' AS op, o_orderstatus,
      |    o_totalprice * 1.05 AS o_totalprice,
      |    CAST(o_orderdate AS TIMESTAMP) + INTERVAL 10 DAY AS ts
      |  FROM o WHERE o_orderkey % 5 = 0
      |  UNION ALL
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 15 = 0 THEN 'D' ELSE 'U' END,
      |    o_orderstatus, o_totalprice * 1.10,
      |    CAST(o_orderdate AS TIMESTAMP) + INTERVAL 20 DAY
      |  FROM o WHERE o_orderkey % 5 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 1000000, 'U', 'N', o_totalprice,
      |    CAST(o_orderdate AS TIMESTAMP) + INTERVAL 5 DAY
      |  FROM o WHERE o_orderkey % 8 = 0),
      |latest AS (SELECT * FROM (
      |  SELECT ch.*, ROW_NUMBER() OVER (PARTITION BY o_orderkey
      |    ORDER BY ts DESC, op DESC) AS rn FROM ch) x WHERE rn = 1)
      |SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice FROM base b
      |WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.o_orderkey = b.o_orderkey)
      |UNION ALL
      |SELECT o_orderkey, o_orderstatus, o_totalprice FROM latest WHERE op = 'U'
      |ORDER BY o_orderkey""".stripMargin

  /** The q50/e30 shared SCD2 history (the 1% order window, %10 keys updated at
    * +30 days) and PIT serve tail, so the batch lookup and the streaming
    * enrichment grade against one SQL definition.
    */
  private[queries] def pitHistory(s: org.apache.spark.sql.SparkSession,
                                  d: String): org.apache.spark.sql.DataFrame = {
    // FRACTION-based window (VERDICT r14 #5): `o_orderkey % 3000 < 30`
    // keeps 1% of the table at ANY scale, where the old absolute
    // `< 2000` pinned a constant 2000-order fixture that made both
    // sf-scaling and the ScaledCorpus ×N replica remap measure a flat
    // workload. Read through the residue layout (physical `wres`
    // column, range-sorted files) so the window also PRUNES the scan
    // like the absolute range did (VERDICT r15 #5).
    val orders = Q.ordersWindow(s, d, 30)
    val cur = orders.select(col("o_orderkey"), col("o_totalprice"),
      col("o_orderdate").cast("timestamp").as("valid_from"))
    val upd = orders.filter(pmod(col("o_orderkey"), lit(10)) === 0)
      .select(col("o_orderkey"), (col("o_totalprice") * 1.1).as("o_totalprice"),
        (col("o_orderdate").cast("timestamp") + expr("INTERVAL 30 DAYS")).as("uts"))
    graft.operators.Merges.scd2(cur, upd, "o_orderkey", "uts")
  }

  private[queries] def pitServe(li: org.apache.spark.sql.DataFrame,
                                hist: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame =
    graft.operators.Merges.pointInTimeLookup(li, hist, Seq("o_orderkey"), col("sd"))
      .select(col("o_orderkey"), col("l_linenumber"), col("sd"),
        col("o_totalprice").as("price_at_ship"), col("valid_from"))
      .orderBy("o_orderkey", "l_linenumber", "sd", "valid_from")

  private[queries] val pitOracleSql =
    """WITH cur AS (
      |  SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS TIMESTAMP) AS valid_from
      |  FROM orders WHERE o_orderkey % 3000 < 30),
      |upd AS (
      |  SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice,
      |    CAST(o_orderdate AS TIMESTAMP) + INTERVAL 30 DAY AS uts
      |  FROM orders WHERE o_orderkey % 3000 < 30 AND o_orderkey % 10 = 0),
      |hist AS (
      |  SELECT c.o_orderkey, c.o_totalprice, c.valid_from, u.uts AS valid_to
      |  FROM cur c JOIN upd u USING (o_orderkey)
      |  UNION ALL
      |  SELECT c.o_orderkey, c.o_totalprice, c.valid_from, NULL
      |  FROM cur c WHERE c.o_orderkey NOT IN (SELECT o_orderkey FROM upd)
      |  UNION ALL
      |  SELECT o_orderkey, o_totalprice, uts AS valid_from, NULL FROM upd),
      |li AS (
      |  SELECT l_orderkey AS o_orderkey, l_linenumber,
      |    CAST(l_shipdate AS TIMESTAMP) AS sd
      |  FROM lineitem WHERE l_orderkey % 3000 < 30)
      |SELECT li.o_orderkey, li.l_linenumber, li.sd,
      |  h.o_totalprice AS price_at_ship, h.valid_from
      |FROM li JOIN hist h USING (o_orderkey)
      |WHERE h.valid_from <= li.sd AND (h.valid_to IS NULL OR li.sd < h.valid_to)
      |ORDER BY o_orderkey, l_linenumber, sd, valid_from""".stripMargin

  val defs: Map[String, QueryDef] = Map(

    // §2.5 aggregation — TPC-H Q1-shaped pricing summary.
    "q01_agg_pricing" -> of(
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""") { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1.0) - col("l_discount")).cast(DecimalType(18, 2)))
            .cast(DoubleType).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // §2.2 filter + projection — predicate/column pushdown to the parquet scan.
    "q02_filter_project" -> of(
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""") { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // §2.4 multi-way inner join — dims broadcast, fact never shuffles for the join.
    "q03_join_agg_nation" -> of(
      """SELECT n_name, r_name, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_rev
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name, r_name ORDER BY n_name, r_name""") { (s, d) =>
      t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"), col("r_name"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_rev"))
        .orderBy(col("n_name"), col("r_name"))
    },

    // §2.4 left outer join with 0-preserving count.
    "q04_join_left_count" -> of(
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""") { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    },

    // §2.4 semi join (EXISTS).
    "q05_join_semi" -> of(
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""") { (s, d) =>
      t(s, d, "customer")
        .join(
          t(s, d, "orders").filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // §2.4 anti join (NOT EXISTS) — customers with no 1995 urgent orders
    // (every customer has SOME order in this data, so the unfiltered variant
    // would be a degenerate empty check).
    "q06_join_anti" -> of(
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
        |    AND EXTRACT(year FROM o_orderdate) = 1995)
        |ORDER BY c_custkey""") { (s, d) =>
      t(s, d, "customer")
        .join(
          t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT" &&
            year(col("o_orderdate")) === 1995),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // §2.6 window ranking — top-3 orders per customer.
    "q07_window_topn" -> of(
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |   ROW_NUMBER() OVER (PARTITION BY o_custkey
        |     ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) x
        |WHERE rn <= 3 ORDER BY o_custkey, rn""") { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    },

    // §2.6 window frame + lag — running sum and previous-row value.
    "q08_window_running" -> of(
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |   PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
        | LAG(l_quantity) OVER (
        |   PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber) AS prev_qty
        |FROM lineitem WHERE l_suppkey <= 10
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""") { (s, d) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      t(s, d, "lineitem").filter(col("l_suppkey") <= 10)
        .select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(col("l_quantity").cast(DecimalType(18, 2)))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(DoubleType).as("running_qty"),
          lag(col("l_quantity"), 1).over(w).as("prev_qty"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    },

    // §2.7 top-k — Catalyst rewrites to TakeOrderedAndProject (no full sort).
    "q09_topk" -> of(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""") { (s, d) =>
      t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    },

    // §2.8 distinct.
    "q10_distinct" -> of(
      """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        |ORDER BY c_mktsegment, c_nationkey""") { (s, d) =>
      t(s, d, "customer")
        .select("c_mktsegment", "c_nationkey").distinct()
        .orderBy("c_mktsegment", "c_nationkey")
    },

    // §2.8 intersect.
    "q11_intersect" -> of(
      """SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
        |ORDER BY o_custkey""") { (s, d) =>
      val o = t(s, d, "orders")
      o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
        .intersect(o.filter(year(col("o_orderdate")) === 1996).select("o_custkey"))
        .orderBy("o_custkey")
    },

    // §2.8 except.
    "q12_except" -> of(
      """SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
        |ORDER BY o_custkey""") { (s, d) =>
      val o = t(s, d, "orders")
      o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
        .except(o.filter(year(col("o_orderdate")) === 1996).select("o_custkey"))
        .orderBy("o_custkey")
    },

    // §2.8 union all (the reference's degenerate two-branch union, generalized).
    "q13_union" -> of(
      """SELECT y, o_orderpriority, n FROM (
        | SELECT CAST(1995 AS INT) AS y, o_orderpriority, COUNT(*) AS n FROM orders
        |   WHERE EXTRACT(year FROM o_orderdate) = 1995 GROUP BY o_orderpriority
        | UNION ALL
        | SELECT CAST(1996 AS INT) AS y, o_orderpriority, COUNT(*) AS n FROM orders
        |   WHERE EXTRACT(year FROM o_orderdate) = 1996 GROUP BY o_orderpriority) u
        |ORDER BY y, o_orderpriority""") { (s, d) =>
      val o = t(s, d, "orders")
      def part(yr: Int) = o.filter(year(col("o_orderdate")) === yr)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .select(lit(yr).cast(IntegerType).as("y"), col("o_orderpriority"), col("n"))
      part(1995).unionByName(part(1996)).orderBy("y", "o_orderpriority")
    },

    // §2.5 rollup (grouping sets) — null group keys coalesced to 'ALL' so the
    // two engines' null-ordering defaults can't disagree.
    "q14_rollup" -> of(
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
        | COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""") { (s, d) =>
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("qty"))
        .orderBy("rf", "ls")
    },

    // §2.9 scalar string functions + LIKE + CASE.
    "q15_scalar_string" -> of(
      """SELECT p_partkey, UPPER(p_name) AS uname, SUBSTRING(p_type, 1, 5) AS t5,
        | CONCAT(p_brand, '-', CAST(p_size AS VARCHAR)) AS bs,
        | CASE WHEN p_size > 25 THEN 'big' ELSE 'small' END AS sz
        |FROM part WHERE p_name LIKE '%e%' ORDER BY p_partkey""") { (s, d) =>
      t(s, d, "part")
        .filter(col("p_name").like("%e%"))
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_type"), 1, 5).as("t5"),
          concat(col("p_brand"), lit("-"), col("p_size").cast("string")).as("bs"),
          when(col("p_size") > 25, "big").otherwise("small").as("sz"))
        .orderBy("p_partkey")
    },

    // §2.9 datetime functions.
    "q16_datetime" -> of(
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y,
        | CAST(EXTRACT(month FROM o_orderdate) AS INT) AS m,
        | COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""") { (s, d) =>
      t(s, d, "orders")
        .groupBy(
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("rev"))
        .orderBy("y", "m")
    },

    // §2.9/F5 JSON extraction (events.props is JSON text).
    "q17_json" -> of(
      """SELECT event_type,
        | CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      Q.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          sum(get_json_object(col("props"), "$.k").cast(LongType)).as("sum_k"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // §2.3 explode/generator — token frequencies (the UDTF-shaped op,
    // same machinery as the reference's Multi-geometry explode).
    "q18_explode_tokens" -> of(
      """SELECT token, COUNT(*) AS n FROM (
        |  SELECT UNNEST(string_split(text, ' ')) AS token FROM documents) x
        |GROUP BY token ORDER BY n DESC, token LIMIT 50""") { (s, d) =>
      t(s, d, "documents")
        .select(explode(split(col("text"), " ", -1)).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(50)
    },

    // §2.5 HAVING + conditional aggregation.
    "q19_having_case" -> of(
      """SELECT l_returnflag,
        | CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS big_cnt,
        | COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag HAVING COUNT(*) > 10
        |ORDER BY l_returnflag""") { (s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("l_quantity") > 25, 1L).otherwise(0L)).as("big_cnt"),
          count(lit(1)).as("n"))
        .filter(col("n") > 10)
        .orderBy("l_returnflag")
    },

    // §2.9 math functions (IEEE-deterministic set only: abs/floor/sqrt).
    "q20_math" -> of(
      """SELECT l_orderkey, l_linenumber, ABS(l_discount - 0.05) AS ad,
        | CAST(FLOOR(l_quantity / 7.0) AS BIGINT) AS fq, SQRT(l_extendedprice) AS sq
        |FROM lineitem WHERE l_orderkey < 3000
        |ORDER BY l_orderkey, l_linenumber""") { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_orderkey") < 3000)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("ad"),
          floor(col("l_quantity") / 7.0).as("fq"),
          sqrt(col("l_extendedprice")).as("sq"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // §2.4 full outer join — align two yearly aggregates, keys on either side.
    "q22_join_full" -> of(
      """SELECT COALESCE(a.k, b.k) AS custkey,
        |  COALESCE(a.n, 0) AS n_1995, COALESCE(b.n, 0) AS n_1996
        |FROM (SELECT o_custkey AS k, COUNT(*) AS n FROM orders
        |      WHERE EXTRACT(year FROM o_orderdate) = 1995 GROUP BY 1) a
        |FULL JOIN (SELECT o_custkey AS k, COUNT(*) AS n FROM orders
        |      WHERE EXTRACT(year FROM o_orderdate) = 1996 GROUP BY 1) b
        |ON a.k = b.k
        |ORDER BY custkey""") { (s, d) =>
      val o = t(s, d, "orders")
      def yr(y: Int) = o.filter(year(col("o_orderdate")) === y)
        .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n"))
      val a = yr(1995).select(col("k"), col("n").as("n_a"))
      val b = yr(1996).select(col("k").as("kb"), col("n").as("n_b"))
      a.join(b, col("k") === col("kb"), "full")
        .select(
          coalesce(col("k"), col("kb")).as("custkey"),
          coalesce(col("n_a"), lit(0L)).as("n_1995"),
          coalesce(col("n_b"), lit(0L)).as("n_1996"))
        .orderBy("custkey")
    },

    // §2.5 exact + approximate distinct counting. HLL++ sketches differ from
    // DuckDB's approx impl, so the oracle checks the exact column and the
    // approx column's ±5% contract via a CASE both engines agree on.
    "q23_count_distinct" -> of(
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS exact_parts,
        |  1 AS approx_within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_partkey")).as("approx"))
        .select(col("l_returnflag"), col("exact_parts"),
          when(abs(col("approx") - col("exact_parts")) <= lit(0.05) * col("exact_parts"), 1)
            .otherwise(0).as("approx_within_5pct"))
        .orderBy("l_returnflag")
    },

    // §2.6 the window-function zoo: rank/dense_rank/ntile/lead/first/last.
    "q24_window_zoo" -> of(
      """SELECT o_custkey, o_orderkey,
        |  RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk,
        |  NTILE(4) OVER w AS quartile,
        |  LEAD(o_orderkey) OVER w AS next_order,
        |  FIRST_VALUE(o_orderkey) OVER w AS first_order,
        |  LAST_VALUE(o_orderkey) OVER
        |    (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
        |FROM orders
        |WHERE o_custkey <= 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders").filter(col("o_custkey") <= 100)
        .select(col("o_custkey"), col("o_orderkey"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"),
          first(col("o_orderkey")).over(w).as("first_order"),
          last(col("o_orderkey"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
            .as("last_order"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // §2.5 cube (full grouping-sets lattice).
    "q25_cube" -> of(
      """SELECT COALESCE(o_orderstatus, 'ALL') AS st,
        |  COALESCE(o_orderpriority, 'ALL') AS pri, COUNT(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY st, pri""") { (s, d) =>
      t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("pri"), col("n"))
        .orderBy("st", "pri")
    },

    // §2.5 pivot (conditional-aggregation rewrite on both sides so the
    // column set is static and engine-independent).
    "q26_pivot" -> of(
      """SELECT c_mktsegment,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_cnt,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_cnt,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_cnt
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""") { (s, d) =>
      t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("c_mktsegment"),
          coalesce(col("F"), lit(0L)).as("f_cnt"),
          coalesce(col("O"), lit(0L)).as("o_cnt"),
          coalesce(col("P"), lit(0L)).as("p_cnt"))
        .orderBy("c_mktsegment")
    },

    // §2.5 array aggregation — order-pinned collect_list serialized to text
    // so both engines compare a scalar.
    "q27_array_agg" -> of(
      """SELECT n_nationkey, string_agg(c_name, ',' ORDER BY c_name) AS members,
        |  COUNT(*) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > 9000
        |GROUP BY n_nationkey ORDER BY n_nationkey""") { (s, d) =>
      t(s, d, "customer").filter(col("c_acctbal") > 9000)
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_nationkey"))
        .agg(
          array_join(array_sort(collect_list(col("c_name"))), ",").as("members"),
          count(lit(1)).as("n"))
        .orderBy("n_nationkey")
    },

    // §2.9 regex functions (simple, engine-portable patterns only).
    "q28_regex" -> of(
      """SELECT p_partkey,
        |  regexp_extract(p_type, '([A-Z]+)', 1) AS first_word,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |  CASE WHEN regexp_matches(p_brand, '#1[0-9]$') THEN 1 ELSE 0 END AS brand_teens
        |FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""") { (s, d) =>
      t(s, d, "part").filter(col("p_partkey") <= 500)
        .select(col("p_partkey"),
          regexp_extract(col("p_type"), "([A-Z]+)", 1).as("first_word"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
          when(col("p_brand").rlike("#1[0-9]$"), 1).otherwise(0).as("brand_teens"))
        .orderBy("p_partkey")
    },

    // §2.4 skew-salting demonstration: the build side (per-user totals) is
    // replicated across 8 salt buckets and the probe side routes each row to
    // a deterministic bucket (hash of its unique key), so one hot user_id
    // spreads over 8 reducers instead of one. Result provably identical to
    // the plain join — the oracle IS the unsalted SQL.
    "q29_salted_join" -> of(
      """SELECT e.event_id, e.user_id, CAST(u.n_events AS BIGINT) AS user_total
        |FROM events e JOIN (
        |  SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id) u
        |ON e.user_id = u.user_id
        |WHERE e.event_type = 'purchase'
        |ORDER BY e.event_id""") { (s, d) =>
      val nSalt = 8
      val ev = Q.events(s, d)
      val totals = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
      // build side: replicate each row into every salt bucket
      val salted = totals.select(col("user_id"), col("n_events"),
        explode(sequence(lit(0), lit(nSalt - 1))).as("salt"))
      // probe side: deterministic bucket per row (hash of the unique key)
      val probe = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          pmod(xxhash64(col("event_id")), lit(nSalt)).cast("int").as("salt"))
      probe.join(salted, Seq("user_id", "salt"))
        .select(col("event_id"), col("user_id"), col("n_events").as("user_total"))
        .orderBy("event_id")
    },

    // §2.5 arbitrary GROUPING SETS with GROUPING() disambiguation — through
    // the engine's SQL surface (spark.sql), the one grouping shape the
    // DataFrame API doesn't expose directly.
    "q30_grouping_sets" -> of(
      """SELECT COALESCE(l_returnflag, '-') AS rf, COALESCE(l_linestatus, '-') AS ls,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g_rf, g_ls, rf, ls""") { (s, d) =>
      t(s, d, "lineitem").createOrReplaceTempView("lineitem_gs")
      s.sql(
        """SELECT COALESCE(l_returnflag, '-') AS rf, COALESCE(l_linestatus, '-') AS ls,
          |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
          |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
          |  COUNT(*) AS n
          |FROM lineitem_gs
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY g_rf, g_ls, rf, ls""".stripMargin)
    },

    // §2.5 UNPIVOT (wide → long): the inverse of q26's pivot, a pure
    // narrow transform (generator-shaped, no shuffle).
    "q32_unpivot" -> of(
      """SELECT l_orderkey, l_linenumber, metric, value FROM (
        |  UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
        |           FROM lineitem WHERE l_orderkey < 500)
        |  ON l_quantity, l_extendedprice, l_discount
        |  INTO NAME metric VALUE value)
        |ORDER BY l_orderkey, l_linenumber, metric, value""") { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_orderkey") < 500)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
        .unpivot(
          ids = Array(col("l_orderkey"), col("l_linenumber")),
          values = Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          variableColumnName = "metric", valueColumnName = "value")
        .orderBy("l_orderkey", "l_linenumber", "metric", "value")
    },

    // §2.4 correlated EXISTS / NOT EXISTS through the SQL surface —
    // Catalyst's RewritePredicateSubquery turns them into semi/anti joins
    // (the DataFrame twins are q05/q06; this exercises the subquery path).
    "q35_exists_subquery" -> of(
      """SELECT o_orderkey, o_totalprice FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l
        |                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        |ORDER BY o_orderkey""") { (s, d) =>
      t(s, d, "orders").createOrReplaceTempView("orders_ex")
      t(s, d, "lineitem").createOrReplaceTempView("lineitem_ex")
      s.sql(
        """SELECT o_orderkey, o_totalprice FROM orders_ex o
          |WHERE EXISTS (SELECT 1 FROM lineitem_ex l
          |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
          |  AND NOT EXISTS (SELECT 1 FROM lineitem_ex l
          |                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
          |ORDER BY o_orderkey""".stripMargin)
    },

    // §2.6 RANGE frame (value-based window bounds): per customer, count and
    // exact-decimal sum of their orders in the 30 days up to each order —
    // the rolling-window shape ROWS frames cannot express (rows ≠ days).
    // Both engines order the frame by integral epoch seconds; money goes
    // through DECIMAL inside the frame (Q.dsum discipline).
    "q34_window_range_frame" -> of(
      """SELECT o_orderkey, o_custkey,
        |  COUNT(*) OVER w AS n_recent,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_recent
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
        |  RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
        |QUALIFY o_orderkey < 5000
        |ORDER BY o_orderkey""") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      // NTZ cannot cast to long directly; via TIMESTAMP with the session
      // pinned to UTC this is the same integral epoch DuckDB's epoch() sees
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30L * 86400, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          count(lit(1)).over(w).as("n_recent"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
            .cast(DoubleType).as("sum_recent"))
        .filter(col("o_orderkey") < 5000)
        .orderBy("o_orderkey")
    },

    // Statistical profiling: per-group Pearson correlation from EXACT
    // decimal moment sums (n, Σx, Σy, Σxy, Σx², Σy²) — the built-in corr()
    // sums doubles in partition order and is not oracle-able; the decimal
    // moments are. The derived correlation is compared at 6 decimals (a
    // ~1e9 margin between the 1-ulp engine gap and the rounding boundary,
    // so a data refresh cannot realistically flake the gate): the
    // closed form contains a*b - c*d, which DuckDB's C++ build CONTRACTS
    // into fused multiply-add while the JVM does not, a genuine 1-ulp
    // cross-engine gap (same class as the t08 StrictMath-vs-libm rule; the
    // moments themselves stay value-exact).
    "q40_stats_corr" -> of(
      """WITH m AS (
        |  SELECT l_returnflag,
        |    COUNT(*) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy
        |  FROM lineitem GROUP BY l_returnflag),
        |f AS (
        |  SELECT l_returnflag, n, sx, sy, sxy, sxx, syy,
        |    CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
        |    CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
        |    CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd
        |  FROM m)
        |SELECT l_returnflag, n,
        |  CAST(sx AS VARCHAR) AS sx, CAST(sy AS VARCHAR) AS sy,
        |  CAST(sxy AS VARCHAR) AS sxy, CAST(sxx AS VARCHAR) AS sxx,
        |  CAST(syy AS VARCHAR) AS syy,
        |  sxd / n AS mean_qty, syd / n AS mean_price,
        |  round((nd * sxyd - sxd * syd)
        |    / (sqrt(nd * sxxd - sxd * sxd) * sqrt(nd * syyd - syd * syd)), 6) AS corr6
        |FROM f ORDER BY l_returnflag""") { (s, d) =>
      val qd = col("l_quantity").cast(DecimalType(18, 2))
      val pd = col("l_extendedprice").cast(DecimalType(18, 2))
      val nD = col("n").cast(DoubleType)
      def dbl(c: String) = col(c).cast(DoubleType)
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(qd).as("sx"), sum(pd).as("sy"), sum(qd * pd).as("sxy"),
          sum(qd * qd).as("sxx"), sum(pd * pd).as("syy"))
        .select(col("l_returnflag"), col("n"),
          col("sx").cast("string").as("sx"), col("sy").cast("string").as("sy"),
          col("sxy").cast("string").as("sxy"), col("sxx").cast("string").as("sxx"),
          col("syy").cast("string").as("syy"),
          (dbl("sx") / nD).as("mean_qty"),
          (dbl("sy") / nD).as("mean_price"),
          round((nD * dbl("sxy") - dbl("sx") * dbl("sy")) /
            (sqrt(nD * dbl("sxx") - dbl("sx") * dbl("sx")) *
              sqrt(nD * dbl("syy") - dbl("sy") * dbl("sy"))), 6)
            .as("corr6"))
        .orderBy("l_returnflag")
    },

    // Snapshot reconciliation: the second snapshot is a deterministic
    // mutation of the first (every 17th key dropped, every 10th repriced,
    // a new key range appended); the diff classifies each key. Both
    // engines derive snapshot B identically, so the diff is oracle-exact.
    "q39_snapshot_diff" -> of(
      """WITH a AS (
        |  SELECT o_orderkey AS k, o_totalprice AS price
        |  FROM orders WHERE o_orderkey < 2000),
        |b AS (
        |  SELECT k, CASE WHEN k % 10 = 0 THEN price * 1.05 ELSE price END AS price
        |  FROM a WHERE k % 17 <> 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_orderkey >= 2000 AND o_orderkey < 2100),
        |d AS (
        |  SELECT COALESCE(a.k, b.k) AS k,
        |    CASE WHEN b.k IS NULL THEN 'removed'
        |         WHEN a.k IS NULL THEN 'added'
        |         WHEN a.price <> b.price THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM a FULL OUTER JOIN b ON a.k = b.k)
        |SELECT k AS o_orderkey, status FROM d
        |WHERE status <> 'unchanged' ORDER BY o_orderkey""") { (s, d) =>
      val orders = t(s, d, "orders")
      val a = orders.filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
      val b = a.filter(pmod(col("k"), lit(17)) =!= 0)
        .select(col("k"),
          when(pmod(col("k"), lit(10)) === 0, col("price") * 1.05)
            .otherwise(col("price")).as("price"))
        .union(orders.filter(col("o_orderkey") >= 2000 && col("o_orderkey") < 2100)
          .select(col("o_orderkey"), col("o_totalprice")))
      graft.operators.Merges.snapshotDiff(a, b, "k", Seq("price"))
        .filter(col("status") =!= "unchanged")
        .select(col("k").as("o_orderkey"), col("status"))
        .orderBy("o_orderkey")
    },

    // Data-quality constraint audit (deequ/dbt-style): each rule is a
    // violation query; the audit is a union of counts. Referential
    // integrity (orphans), key uniqueness, domain and null checks over the
    // fact tables — zero violations is itself the assertion worth oracling.
    "q38_quality_audit" -> of(
      """SELECT 'lineitem_orphan' AS rule, CAST(COUNT(*) AS BIGINT) AS violations
        |FROM lineitem l WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'order_dup_key', CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) FROM (
        |  SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1) x
        |UNION ALL
        |SELECT 'nonpositive_quantity', CAST(COUNT(*) AS BIGINT)
        |FROM lineitem WHERE l_quantity <= 0
        |UNION ALL
        |SELECT 'null_orderkey', CAST(COUNT(*) AS BIGINT)
        |FROM lineitem WHERE l_orderkey IS NULL
        |ORDER BY rule""") { (s, d) =>
      val li = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      graft.operators.QualityChecks.audit(Seq(
        "lineitem_orphan" ->
          li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti"),
        "order_dup_key" ->
          o.groupBy("o_orderkey").agg(count(lit(1)).as("n"))
            .filter(col("n") > 1)
            .select(explode(sequence(lit(1L), col("n") - 1))),
        "nonpositive_quantity" -> li.filter(col("l_quantity") <= 0),
        "null_orderkey" -> li.filter(col("l_orderkey").isNull)))
        .orderBy("rule")
    },

    // Shuffle-key skew report: the heaviest user_ids with row counts,
    // corpus share, and ratio-to-mean-key-load — the diagnostic that
    // decides whether a planned shuffle on the key needs salting (q29's
    // shape) or AQE skew handling. mean_ratio multiplies in DOUBLE (a
    // long product would overflow at 100 TB row counts); both engines run
    // the identical IEEE expression.
    "q41_skew_report" -> of(
      """WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS keys FROM c)
        |SELECT c.user_id, c.n, c.n / t.total AS share,
        |  CAST(c.n AS DOUBLE) * t.keys / t.total AS mean_ratio
        |FROM c, t
        |ORDER BY c.n DESC, c.user_id LIMIT 15""") { (s, d) =>
      graft.operators.QualityChecks.keySkewReport(
        Q.events(s, d), "user_id", topN = 15)
    },

    // q41 composed into the salting DECISION (VERDICT r6 #5): the join
    // measures its probe side's skew and salts only when the measurement
    // says to, with the factor derived from the measured ratio. The oracle
    // is the UNSALTED SQL — the equality is the check. The testdata's
    // user_id load is near-uniform (top mean_ratio ≈ 1.3–1.5 at every SF),
    // so the query pins skewThreshold=1.1 to force the SALTED branch
    // through the oracle; the production default stays 4.0, and PlanSpec
    // covers both branches (salt expansion present above threshold, absent
    // below) on engineered inputs.
    "q42_auto_salted_join" -> of(
      """SELECT e.event_id, e.user_id, CAST(u.n_events AS BIGINT) AS user_total
        |FROM events e JOIN (
        |  SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id) u
        |ON e.user_id = u.user_id
        |WHERE e.event_type = 'purchase'
        |ORDER BY e.event_id""") { (s, d) =>
      val ev = Q.events(s, d)
      val totals = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
      val probe = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"))
      graft.operators.QualityChecks
        .autoSaltedJoin(probe, totals, "user_id", "event_id",
          skewThreshold = 1.1)
        .select(col("event_id"), col("user_id"),
          col("n_events").as("user_total"))
        .orderBy("event_id")
    },

    // SCD2 merge (the MERGE INTO shape without a lakehouse format): a
    // deterministic update batch (every 10th order, +10% price, effective
    // +30 days) closes the old version and opens the new one; untouched
    // rows stay open. The oracle states the same three-way union.
    "q37_scd2_merge" -> of(
      """WITH cur AS (
        |  SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS TIMESTAMP) AS valid_from
        |  FROM orders WHERE o_orderkey % 3000 < 30),
        |upd AS (
        |  SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice,
        |    CAST(o_orderdate AS TIMESTAMP) + INTERVAL 30 DAY AS uts
        |  FROM orders WHERE o_orderkey % 3000 < 30 AND o_orderkey % 10 = 0)
        |SELECT c.o_orderkey, c.o_totalprice, c.valid_from, u.uts AS valid_to
        |FROM cur c JOIN upd u USING (o_orderkey)
        |UNION ALL
        |SELECT c.o_orderkey, c.o_totalprice, c.valid_from, NULL
        |FROM cur c WHERE c.o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |UNION ALL
        |SELECT o_orderkey, o_totalprice, uts AS valid_from, NULL FROM upd
        |ORDER BY o_orderkey, valid_from""") { (s, d) =>
      // fraction window, same rationale as pitHistory (1% at any scale);
      // residue layout → pruned scan (r15 #5)
      val orders = Q.ordersWindow(s, d, 30)
      val cur = orders.select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderdate").cast("timestamp").as("valid_from"))
      val upd = orders.filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .select(col("o_orderkey"), (col("o_totalprice") * 1.1).as("o_totalprice"),
          (col("o_orderdate").cast("timestamp") + expr("INTERVAL 30 DAYS")).as("uts"))
      graft.operators.Merges.scd2(cur, upd, "o_orderkey", "uts")
        .orderBy("o_orderkey", "valid_from")
    },

    // SCD2 POINT-IN-TIME lookup (q50): the consumption side of the q37
    // merge — each fact row (lineitems of the versioned orders) joins the
    // dimension VERSION valid at its own timestamp (valid_from ≤ ts <
    // valid_to, half-open). Scale shape: an EQUI-join on the key followed
    // by the validity filter — versions per key are few, so this is a
    // plain hash join, never a range join; facts whose ts precede every
    // version drop (inner semantics, the as-of-with-history contract).
    "q50_scd2_pit" -> of(pitOracleSql) { (s, d) =>
      val li = Q.lineitemWindow(s, d, 30)
        .select(col("l_orderkey").as("o_orderkey"), col("l_linenumber"),
          col("l_shipdate").cast("timestamp").as("sd"))
      pitServe(li, pitHistory(s, d))
    },

    // CDC apply (q51): fold an ordered insert/update/delete changelog into
    // a base table — the per-micro-batch MERGE of a lakehouse sink. The
    // changelog carries two generations of changes for updated keys plus
    // brand-new insert keys, so latest-wins supersession, overwrite,
    // insert and delete all exercise; ties at one timestamp break 'U'
    // over 'D' (total, deterministic). One window over the delta-sized
    // changelog + one anti join + one union — the base never rewrites
    // beyond touched keys.
    "q51_cdc_apply" -> of(cdcOracleSql) { (s, d) =>
      val (base, c1, c23) = cdcParts(s, d)
      graft.operators.Merges.applyCdc(base, c1.unionByName(c23),
        "o_orderkey", "ts")
        .orderBy("o_orderkey")
    },

    // Lake-layout Z-order (Morton) key: interleaved bits of two pruning
    // columns — sorting files by z gives min/max stats locality in BOTH
    // dimensions (the OPTIMIZE ZORDER technique, here as a pure codegen'd
    // key expression). The oracle states literally the same unrolled bit
    // math (ZOrder.zorderSql).
    "q36_zorder_key" -> of(
      s"""SELECT p_partkey, p_size,
        |  ${graft.functions.ZOrder.zorderSql("(p_partkey % 65536)", "p_size")} AS z
        |FROM part WHERE p_partkey <= 2000
        |ORDER BY z, p_partkey""") { (s, d) =>
      t(s, d, "part").filter(col("p_partkey") <= 2000)
        .select(col("p_partkey"), col("p_size"),
          graft.functions.ZOrder.zorderKey(
            pmod(col("p_partkey"), lit(65536L)), col("p_size")).as("z"))
        .orderBy("z", "p_partkey")
    },

    // Lake-layout Hilbert key (q52): z-order's locality upgrade — the
    // Hilbert curve is CONTINUOUS (consecutive keys are always
    // grid-adjacent, spec-pinned over a full grid), so equal-size key
    // ranges cut tighter bounding boxes than Morton's diagonal jumps and
    // min/max file stats prune better on both dimensions. The walk is
    // sequential across bit levels → a codegen expression on the Spark
    // side, the same recurrence as 16 chained CTE stages on the oracle
    // side (both stated from one generator each).
    "q52_hilbert_key" -> of(
      s"""WITH ${graft.functions.Hilbert.hilbertSqlCtes(
           "(SELECT p_partkey, p_size FROM part WHERE p_partkey <= 2000)",
           "p_partkey % 65536", "p_size", "p_partkey, p_size")}
        |SELECT p_partkey, p_size, hd AS h FROM h16
        |ORDER BY h, p_partkey""") { (s, d) =>
      t(s, d, "part").filter(col("p_partkey") <= 2000)
        .select(col("p_partkey"), col("p_size"),
          graft.functions.Hilbert.hilbertKey(s,
            pmod(col("p_partkey"), lit(65536L)),
            col("p_size").cast("long")).as("h"))
        .orderBy("h", "p_partkey")
    },

    // Layout pruning audit (q53): the measurement that JUSTIFIES q36/q52 —
    // simulate the lake write path (sort by layout key, cut 64 equal-width
    // key-range files), collect per-file min/max stats, and replay a
    // 4-rectangle scan workload against them counting which files survive
    // stats pruning. One scan stacks all three layouts (natural / Morton /
    // Hilbert) via a generator, key ranges broadcast back, and the audit
    // itself is an O(files × queries) rollup — the whole thing costs one
    // pass over the table however large it is. Hilbert's continuity shows
    // up as fewer scanned files on the box/y-slice queries; natural order
    // prunes only on x. The oracle rebuilds both curve keys from the same
    // generators as q36/q52 and replays the identical bucketing in SQL.
    "q53_layout_pruning" -> of {
      val baseSql =
        "(SELECT p_partkey % 65536 AS x, CAST(p_size AS BIGINT) AS y " +
          "FROM part WHERE p_partkey <= 2000)"
      s"""WITH base AS (SELECT x, y FROM $baseSql b),
        |${graft.functions.Hilbert.hilbertSqlCtes(baseSql, "x", "y", "x, y")},
        |keyed AS (
        |  SELECT 'natural' AS layout, x, y, x AS k FROM base
        |  UNION ALL
        |  SELECT 'morton', x, y,
        |    ${graft.functions.ZOrder.zorderSql("x", "y")} FROM base
        |  UNION ALL
        |  SELECT 'hilbert', x, y, hd FROM h16),
        |rng AS (SELECT layout, MIN(k) AS k0, MAX(k) AS k1
        |  FROM keyed GROUP BY layout),
        |filed AS (
        |  SELECT keyed.layout, x, y,
        |    ((k - k0) * 64) // (k1 - k0 + 1) AS file
        |  FROM keyed JOIN rng ON keyed.layout = rng.layout),
        |fstats AS (
        |  SELECT layout, file, MIN(x) AS x0, MAX(x) AS x1,
        |    MIN(y) AS y0, MAX(y) AS y1, CAST(COUNT(*) AS BIGINT) AS n_rows
        |  FROM filed GROUP BY layout, file),
        |wl(query_id, qx0, qx1, qy0, qy1) AS (VALUES
        |  (1, 100, 199, 0, 63),
        |  (2, 0, 65535, 10, 14),
        |  (3, 500, 999, 20, 29),
        |  (4, 1500, 1519, 35, 39))
        |SELECT layout, CAST(query_id AS BIGINT) AS query_id,
        |  CAST(COUNT(*) AS BIGINT) AS files_total,
        |  CAST(SUM(CASE WHEN x1 >= qx0 AND x0 <= qx1
        |    AND y1 >= qy0 AND y0 <= qy1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS files_scanned,
        |  CAST(SUM(CASE WHEN x1 >= qx0 AND x0 <= qx1
        |    AND y1 >= qy0 AND y0 <= qy1 THEN n_rows ELSE 0 END) AS BIGINT)
        |    AS rows_scanned
        |FROM fstats CROSS JOIN wl
        |GROUP BY layout, query_id ORDER BY layout, query_id"""
    } { (s, d) =>
      import graft.functions.{Hilbert, ZOrder}
      val base = t(s, d, "part").filter(col("p_partkey") <= 2000)
        .select(pmod(col("p_partkey"), lit(65536L)).as("x"),
          col("p_size").cast("long").as("y"))
      val keyed = base
        .select(col("x"), col("y"), explode(array(
          struct(lit("natural").as("layout"), col("x").as("k")),
          struct(lit("morton").as("layout"),
            ZOrder.zorderKey(col("x"), col("y")).as("k")),
          struct(lit("hilbert").as("layout"),
            Hilbert.hilbertKey(s, col("x"), col("y")).as("k")))).as("lk"))
        .select(col("lk.layout").as("layout"), col("x"), col("y"),
          col("lk.k").as("k"))
      val rng = keyed.groupBy("layout")
        .agg(min(col("k")).as("k0"), max(col("k")).as("k1"))
      val fstats = keyed.join(broadcast(rng), Seq("layout"))
        .withColumn("file",
          floor((col("k") - col("k0")) * 64 / (col("k1") - col("k0") + 1)))
        .groupBy("layout", "file")
        .agg(min(col("x")).as("x0"), max(col("x")).as("x1"),
          min(col("y")).as("y0"), max(col("y")).as("y1"),
          count(lit(1)).as("n_rows"))
      val wl = s.range(1).select(explode(array(
        Seq((1L, 100L, 199L, 0L, 63L), (2L, 0L, 65535L, 10L, 14L),
          (3L, 500L, 999L, 20L, 29L), (4L, 1500L, 1519L, 35L, 39L)).map {
          case (q, x0, x1, y0, y1) =>
            struct(lit(q).as("query_id"), lit(x0).as("qx0"),
              lit(x1).as("qx1"), lit(y0).as("qy0"), lit(y1).as("qy1"))
        }: _*)).as("q")).select(col("q.*"))
      val scanned = col("x1") >= col("qx0") && col("x0") <= col("qx1") &&
        col("y1") >= col("qy0") && col("y0") <= col("qy1")
      fstats.crossJoin(broadcast(wl))
        .groupBy("layout", "query_id")
        .agg(count(lit(1)).as("files_total"),
          sum(when(scanned, 1L).otherwise(0L)).as("files_scanned"),
          sum(when(scanned, col("n_rows")).otherwise(0L)).as("rows_scanned"))
        .orderBy("layout", "query_id")
    },

    // §2.4 co-located bucketed join: both sides pre-bucketed (and sorted) by
    // the join key, so the per-order aggregation AND the fact-to-fact join
    // plan without any Exchange (PlanSpec asserts it with broadcast
    // disabled) — the big-to-big join technique when neither side fits a
    // broadcast. Results are layout-independent, so the oracle is the plain
    // join SQL.
    "q33_bucketed_join" -> of(
      """SELECT o_orderkey, o_totalprice, n_items FROM orders
        |JOIN (SELECT l_orderkey, COUNT(*) AS n_items
        |      FROM lineitem GROUP BY l_orderkey) li
        |  ON o_orderkey = l_orderkey
        |WHERE o_orderkey < 2000
        |ORDER BY o_orderkey""") { (s, d) =>
      val lake = graft.sources.BucketedLake.ensure(s, d)
      val items = s.table(lake.lineitem)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_items"))
      s.table(lake.orders)
        .join(items, col("o_orderkey") === col("l_orderkey"))
        .filter(col("o_orderkey") < 2000)
        .select("o_orderkey", "o_totalprice", "n_items")
        .orderBy("o_orderkey")
    },

    // scalar subquery (threshold as a broadcast cross join — no driver collect).
    "q21_scalar_subquery" -> of(
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 1.5 * (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM orders)
        |ORDER BY o_orderkey""") { (s, d) =>
      val o = t(s, d, "orders")
      val thr = o.agg((Q.dsum(col("o_totalprice")) / count(lit(1))).as("avg_price"))
      o.join(broadcast(thr))
        .filter(col("o_totalprice") > lit(1.5) * col("avg_price"))
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    })
}
