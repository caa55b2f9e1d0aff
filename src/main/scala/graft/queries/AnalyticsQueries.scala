package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables

/** General analytics over the TPC-H-ish star schema: scan → filter →
  * project → join → aggregate → sort/limit shapes, written so Catalyst
  * pushes filters/pruning to the parquet scan and AQE can pick broadcast
  * joins for the dimension tables.
  *
  * Every double aggregate is rounded (2dp money, 4dp ratios) on BOTH sides
  * so Spark/DuckDB float-sum ordering differences can't flip the hash
  * compare, and every query has a total deterministic ORDER BY.
  */
object AnalyticsQueries extends QueryGroup {

  val defs: Map[String, QueryDef] = Map(
    // TPC-H Q1 shape: pushed-down date filter + grouped aggregate.
    "q1_agg" -> QueryDef(
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") <= lit("1999-12-31").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            round(sum("l_quantity"), 2).as("sum_qty"),
            round(sum("l_extendedprice"), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
              .as("sum_disc_price"),
            // floor-bp, not round(,4): integer-ratio averages can land on
            // exact .5 ties where Spark HALF_UP and DuckDB disagree
            floor(avg("l_quantity") * 10000).cast("long").as("avg_qty_bp"),
            count(lit(1)).as("count_order")
          )
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             |  CAST(floor(avg(l_quantity) * 10000) AS BIGINT) AS avg_qty_bp,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1999-12-31'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    ),

    // TPC-H Q6 shape: highly selective conjunctive filter, scalar aggregate.
    "q6_filter" -> QueryDef(
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
              col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
              col("l_quantity") < 24
          )
          .agg(
            round(sum(col("l_extendedprice") * col("l_discount")), 2)
              .as("revenue"),
            count(lit(1)).as("n_rows")
          ),
      Some("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
             |  count(*) AS n_rows
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_discount BETWEEN 0.05 AND 0.07
             |  AND l_quantity < 24""".stripMargin)
    ),

    // TPC-H Q3 shape: fact-fact join + dimension filter + grouped top-k.
    "q3_join_topk" -> QueryDef(
      (s, d) => {
        val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val l = Tables.lineitem(s, d)
          .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy("l_orderkey", "o_orderpriority")
          .agg(
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
              .as("revenue")
          )
          .orderBy(desc("revenue"), col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey, o_orderpriority,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-01-01'
             |  AND l_shipdate > TIMESTAMP '1998-01-01'
             |GROUP BY l_orderkey, o_orderpriority
             |ORDER BY revenue DESC, l_orderkey
             |LIMIT 10""".stripMargin)
    ),

    // TPC-H Q5 shape: 6-way snowflake join, all dims broadcast-able.
    "q5_snowflake_join" -> QueryDef(
      (s, d) => {
        val r = Tables.region(s, d).filter(col("r_name") =!= "EUROPE")
        val joined = Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .filter(col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        joined
          .groupBy("n_name")
          .agg(
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
              .as("revenue"),
            count(lit(1)).as("n_rows")
          )
          .orderBy(desc("revenue"), col("n_name"))
      },
      Some("""SELECT n_name,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             |  count(*) AS n_rows
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE c_nationkey = s_nationkey AND r_name <> 'EUROPE'
             |GROUP BY n_name
             |ORDER BY revenue DESC, n_name""".stripMargin)
    ),

    // Window functions: per-customer order ranking (row_number + running sum).
    "q_window_rank" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
          .orderBy(desc("o_totalprice"), col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("rank_in_cust", row_number().over(w))
          .filter(col("rank_in_cust") <= 3)
          .select(
            col("o_custkey"), col("o_orderkey"),
            round(col("o_totalprice"), 2).as("price"), col("rank_in_cust")
          )
          .orderBy("o_custkey", "rank_in_cust")
          .limit(1000)
      },
      Some("""SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
             |  CAST(rank_in_cust AS INTEGER) AS rank_in_cust
             |FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey
             |                       ORDER BY o_totalprice DESC, o_orderkey)
             |      AS rank_in_cust
             |  FROM orders)
             |WHERE rank_in_cust <= 3
             |ORDER BY o_custkey, rank_in_cust
             |LIMIT 1000""".stripMargin)
    ),

    // Semi/anti-join shapes: customers with no orders in a window.
    "q_antijoin" -> QueryDef(
      (s, d) => {
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        Tables.customer(s, d)
          .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(
            count(lit(1)).as("n_inactive"),
            round(sum("c_acctbal"), 2).as("sum_bal")
          )
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n_inactive,
             |  round(sum(c_acctbal), 2) AS sum_bal
             |FROM customer
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey
             |    AND o_orderdate >= TIMESTAMP '2000-01-01')
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)
    ),

    // Grouping sets / rollup over two dims.
    "q_rollup" -> QueryDef(
      (s, d) =>
        Tables.orders(s, d)
          .rollup("o_orderstatus", "o_orderpriority")
          .agg(
            count(lit(1)).as("n_orders"),
            round(sum("o_totalprice"), 2).as("sum_price")
          )
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n_orders"), col("sum_price")
          )
          .orderBy("status", "priority"),
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             |  coalesce(o_orderpriority, 'ALL') AS priority,
             |  count(*) AS n_orders,
             |  round(sum(o_totalprice), 2) AS sum_price
             |FROM orders
             |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
             |ORDER BY status, priority""".stripMargin)
    ),

    // CUBE: all 2^2 grouping combinations in one pass (rollup's superset —
    // map-side partial aggregation expands each row into its grouping
    // sets, one shuffle total).
    "q_cube" -> QueryDef(
      (s, d) =>
        Tables.orders(s, d)
          .cube("o_orderstatus", "o_orderpriority")
          .agg(
            count(lit(1)).as("n_orders"),
            round(sum("o_totalprice"), 2).as("sum_price")
          )
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n_orders"), col("sum_price")
          )
          .orderBy("status", "priority"),
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             |  coalesce(o_orderpriority, 'ALL') AS priority,
             |  count(*) AS n_orders,
             |  round(sum(o_totalprice), 2) AS sum_price
             |FROM orders
             |GROUP BY CUBE (o_orderstatus, o_orderpriority)
             |ORDER BY status, priority""".stripMargin)
    ),

    // Pivot: event types to columns, one row per user decile — the
    // wide-format report shape. Spark's pivot with an EXPLICIT value list
    // is a single groupBy with conditional aggregates (no extra pass to
    // discover values, which at scale would be a full distinct scan).
    "q_pivot" -> QueryDef(
      (s, d) =>
        Tables.events(s, d)
          .withColumn("user_bucket", pmod(col("user_id"), lit(10L)))
          .groupBy("user_bucket")
          .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy("user_bucket"),
      Some("""SELECT user_id % 10 AS user_bucket,
             |  CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT) AS click,
             |  CAST(coalesce(sum(CASE WHEN event_type = 'view' THEN 1 END), 0) AS BIGINT) AS view,
             |  CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS purchase,
             |  CAST(coalesce(sum(CASE WHEN event_type = 'signup' THEN 1 END), 0) AS BIGINT) AS signup,
             |  CAST(coalesce(sum(CASE WHEN event_type = 'error' THEN 1 END), 0) AS BIGINT) AS error
             |FROM events GROUP BY user_bucket ORDER BY user_bucket""".stripMargin)
    ),

    // TPC-H Q13 shape: distribution histogram (groupBy of a groupBy).
    "q_histogram" -> QueryDef(
      (s, d) => {
        val perCust = Tables.orders(s, d)
          .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
        Tables.customer(s, d)
          .join(perCust, col("c_custkey") === col("o_custkey"), "left")
          .select(coalesce(col("n_orders"), lit(0L)).as("n_orders"))
          .groupBy("n_orders").agg(count(lit(1)).as("n_customers"))
          .orderBy(desc("n_customers"), desc("n_orders"))
      },
      Some("""SELECT n_orders, count(*) AS n_customers FROM (
             |  SELECT coalesce(cnt, 0) AS n_orders
             |  FROM customer LEFT JOIN (
             |    SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey
             |  ) ON c_custkey = o_custkey)
             |GROUP BY n_orders ORDER BY n_customers DESC, n_orders DESC""".stripMargin)
    ),

    // TPC-H Q2 shape: min-per-group then join back (argmin pattern).
    "q_min_join" -> QueryDef(
      (s, d) => {
        val p = Tables.part(s, d)
        val minPrice = p.groupBy("p_type")
          .agg(min("p_retailprice").as("min_price"))
        p.join(minPrice, Seq("p_type"))
          .filter(col("p_retailprice") === col("min_price"))
          .select(col("p_type"), col("p_partkey"),
            floor(col("p_retailprice") * 100).cast("long").as("price_cents"))
          .orderBy("p_type", "p_partkey")
      },
      Some("""SELECT p.p_type, p.p_partkey,
             |  CAST(floor(p.p_retailprice * 100) AS BIGINT) AS price_cents
             |FROM part p JOIN (
             |  SELECT p_type, min(p_retailprice) AS mn FROM part GROUP BY p_type
             |) m ON p.p_type = m.p_type AND p.p_retailprice = m.mn
             |ORDER BY p.p_type, p.p_partkey""".stripMargin)
    ),

    // Scalar subquery: customers above the global average balance.
    "q_scalar_subquery" -> QueryDef(
      (s, d) => {
        val c = Tables.customer(s, d)
        val avgBal = c.agg(avg("c_acctbal").as("avg_bal"))
        c.join(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_above"), round(sum("c_acctbal"), 2).as("sum_bal"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n_above,
             |  round(sum(c_acctbal), 2) AS sum_bal
             |FROM customer
             |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    ),

    // Semi-join: parts that were actually ordered, counted per brand.
    "q_semijoin" -> QueryDef(
      (s, d) => {
        val l = Tables.lineitem(s, d).select("l_partkey")
        Tables.part(s, d)
          .join(l, col("p_partkey") === col("l_partkey"), "left_semi")
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_parts"),
            floor(avg("p_retailprice") * 100).cast("long").as("avg_price_cents"))
          .orderBy("p_brand")
      },
      Some("""SELECT p_brand, count(*) AS n_parts,
             |  CAST(floor(avg(p_retailprice) * 100) AS BIGINT) AS avg_price_cents
             |FROM part
             |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin)
    ),

    // Exact percentiles (the approximate variants are spec'd with
    // tolerance in ApproxAggSpec — sketches can't equality-match oracles).
    "q_percentiles" -> QueryDef(
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            // ONE exact-percentile buffer serving both quantiles — two
            // separate percentile() aggs each collect every value per group
            expr("percentile(l_extendedprice, array(0.5, 0.95))").as("_p"),
            count(lit(1)).as("n"))
          .select(col("l_returnflag"),
            floor(element_at(col("_p"), 1) * 100).cast("long").as("p50_cents"),
            floor(element_at(col("_p"), 2) * 100).cast("long").as("p95_cents"),
            col("n"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  CAST(floor(quantile_cont(l_extendedprice, 0.5) * 100) AS BIGINT)
             |    AS p50_cents,
             |  CAST(floor(quantile_cont(l_extendedprice, 0.95) * 100) AS BIGINT)
             |    AS p95_cents,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    ),

    // Set op: distinct union + except over key spaces.
    "q_setops" -> QueryDef(
      (s, d) => {
        val ck = Tables.customer(s, d).select(col("c_custkey").as("k"))
        val ok = Tables.orders(s, d).select(col("o_custkey").as("k"))
        ck.except(ok) // customers that never ordered
          .union(ok.except(ck)) // order custkeys with no customer row
          .agg(count(lit(1)).as("n_disjoint"))
      },
      Some("""SELECT count(*) AS n_disjoint FROM (
             |  (SELECT c_custkey AS k FROM customer
             |   EXCEPT SELECT o_custkey FROM orders)
             |  UNION ALL
             |  (SELECT o_custkey AS k FROM orders
             |   EXCEPT SELECT c_custkey FROM customer))""".stripMargin)
    ),

    // Data-quality audit (the dbt-test/Deequ shape): key uniqueness,
    // FK orphans, null discipline, range and accepted-value rules —
    // each one independent single-pass aggregation returning a uniform
    // (check, n_checked, n_violations, pass) row; the report is
    // checks-sized however large the tables. The acctbal lower bound is
    // Market-concentration (Herfindahl-Hirschman) index per nation
    // over supplier revenue, the textbook integer-share form: each
    // supplier's share in basis points (rev·10⁴ div market total),
    // HHI_bp = Σshare² div 10⁴ — bounded by 10⁴·10⁴, so NOTHING
    // depends on revenue magnitude (a direct Σrev²·10⁴ overflows
    // BIGINT on real money columns). One join + a per-market window
    // total + two aggregations.
    "q_analytics_hhi" -> QueryDef(
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .select(col("l_suppkey"),
            floor(round(col("l_extendedprice") * 100) / 100).cast("long")
              .as("_d"))
          .groupBy("l_suppkey").agg(sum("_d").as("rev"))
          .join(Tables.supplier(s, d)
            .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey")), "l_suppkey")
          .join(Tables.nation(s, d)
            .select(col("n_nationkey").as("s_nationkey"), col("n_name")),
            "s_nationkey")
        val w = Window.partitionBy("n_name")
        rev
          .withColumn("_tot", sum("rev").over(w))
          .withColumn("_share_bp", expr("rev * 10000 div _tot"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n_suppliers"),
            max("_tot").as("total_rev"),
            expr("sum(_share_bp * _share_bp) div 10000").as("hhi_bp"))
          .orderBy("n_name")
      },
      Some("""WITH rev AS (
             |  SELECT n.n_name,
             |    CAST(sum(CAST(floor(round(l_extendedprice * 100) / 100)
             |      AS BIGINT)) AS BIGINT) AS rev
             |  FROM lineitem li
             |  JOIN supplier s ON s.s_suppkey = li.l_suppkey
             |  JOIN nation n ON n.n_nationkey = s.s_nationkey
             |  GROUP BY n.n_name, li.l_suppkey),
             |sh AS (
             |  SELECT n_name, rev,
             |    CAST(sum(rev) OVER (PARTITION BY n_name) AS BIGINT) AS tot
             |  FROM rev),
             |sb AS (SELECT n_name, rev * 10000 // tot AS s_bp, tot FROM sh)
             |SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
             |  max(tot) AS total_rev,
             |  CAST(sum(s_bp * s_bp) AS BIGINT) // 10000 AS hhi_bp
             |FROM sb GROUP BY 1 ORDER BY n_name""".stripMargin)
    ),

    // Join-key skew report — the pre-flight diagnostic before a big
    // shuffle: per candidate key, cardinality, hot-key share, and the
    // max/mean skew factor (10000 = perfectly balanced). Three
    // single-pass aggregations unioned; all integer.
    "q_analytics_skew_report" -> QueryDef(
      (s, d) => {
        def report(df: org.apache.spark.sql.DataFrame, rel: String,
            key: String) =
          df.select(col(key).cast("long").as("_k"))
            .groupBy("_k").agg(count(lit(1)).as("_n"))
            .agg(count(lit(1)).as("n_keys"), sum("_n").as("n_rows"),
              max("_n").as("max_rows_per_key"))
            .select(lit(rel).as("relation"), lit(key).as("key"),
              col("n_keys"), col("n_rows"), col("max_rows_per_key"),
              expr("max_rows_per_key * 10000 div n_rows")
                .as("hot_key_share_bp"),
              expr("max_rows_per_key * n_keys * 10000 div n_rows")
                .as("skew_x_bp"))
        report(Tables.events(s, d), "events", "user_id")
          .unionByName(report(Tables.lineitem(s, d), "lineitem", "l_orderkey"))
          .unionByName(report(Tables.lineitem(s, d), "lineitem", "l_suppkey"))
          .orderBy("relation", "key")
      },
      Some("""WITH k1 AS (
             |  SELECT user_id AS k, count(*) AS n FROM events GROUP BY 1),
             |k2 AS (
             |  SELECT l_orderkey AS k, count(*) AS n FROM lineitem GROUP BY 1),
             |k3 AS (
             |  SELECT l_suppkey AS k, count(*) AS n FROM lineitem GROUP BY 1),
             |r AS (
             |  SELECT 'events' AS relation, 'user_id' AS key,
             |    CAST(count(*) AS BIGINT) AS n_keys,
             |    CAST(sum(n) AS BIGINT) AS n_rows,
             |    CAST(max(n) AS BIGINT) AS max_rows_per_key
             |  FROM k1
             |  UNION ALL
             |  SELECT 'lineitem', 'l_orderkey', CAST(count(*) AS BIGINT),
             |    CAST(sum(n) AS BIGINT), CAST(max(n) AS BIGINT) FROM k2
             |  UNION ALL
             |  SELECT 'lineitem', 'l_suppkey', CAST(count(*) AS BIGINT),
             |    CAST(sum(n) AS BIGINT), CAST(max(n) AS BIGINT) FROM k3)
             |SELECT relation, key, n_keys, n_rows, max_rows_per_key,
             |  max_rows_per_key * 10000 // n_rows AS hot_key_share_bp,
             |  max_rows_per_key * n_keys * 10000 // n_rows AS skew_x_bp
             |FROM r ORDER BY relation, key""".stripMargin)
    ),

    // deliberately 0 so the check catches TPC-H's negative balances —
    // a live violation path, not a vacuous all-pass.
    "q_dq_audit" -> QueryDef(
      (s, d) => {
        import graft.ops.DataQuality._
        val li = Tables.lineitem(s, d)
        val ord = Tables.orders(s, d)
        val cust = Tables.customer(s, d)
        Seq(
          unique(cust, "c_custkey", "unique:customer.c_custkey"),
          unique(ord, "o_orderkey", "unique:orders.o_orderkey"),
          unique(Tables.part(s, d), "p_partkey", "unique:part.p_partkey"),
          orphans(ord, "o_custkey", cust, "c_custkey",
            "fk:orders.o_custkey->customer"),
          orphans(li, "l_orderkey", ord, "o_orderkey",
            "fk:lineitem.l_orderkey->orders"),
          orphans(li, "l_partkey", Tables.part(s, d), "p_partkey",
            "fk:lineitem.l_partkey->part"),
          orphans(li, "l_suppkey", Tables.supplier(s, d), "s_suppkey",
            "fk:lineitem.l_suppkey->supplier"),
          notNull(ord, "o_orderdate", "notnull:orders.o_orderdate"),
          inRange(li, "l_quantity", lit(1.0), lit(50.0),
            "range:lineitem.l_quantity[1,50]"),
          inRange(li, "l_discount", lit(0.0), lit(0.1),
            "range:lineitem.l_discount[0,0.1]"),
          inRange(cust, "c_acctbal", lit(0.0), lit(10000.0),
            "range:customer.c_acctbal[0,10000]"),
          accepted(li, "l_returnflag", Seq("R", "A", "N"),
            "accepted:lineitem.l_returnflag")
        ).reduce(_ unionByName _).orderBy("check_name")
      },
      Some("""SELECT 'unique:customer.c_custkey' AS check_name, count(*) AS n_checked,
             |  count(c_custkey) - count(DISTINCT c_custkey) AS n_violations,
             |  count(c_custkey) - count(DISTINCT c_custkey) = 0 AS pass
             |FROM customer
             |UNION ALL
             |SELECT 'unique:orders.o_orderkey', count(*),
             |  count(o_orderkey) - count(DISTINCT o_orderkey),
             |  count(o_orderkey) - count(DISTINCT o_orderkey) = 0 FROM orders
             |UNION ALL
             |SELECT 'unique:part.p_partkey', count(*),
             |  count(p_partkey) - count(DISTINCT p_partkey),
             |  count(p_partkey) - count(DISTINCT p_partkey) = 0 FROM part
             |UNION ALL
             |SELECT 'fk:orders.o_custkey->customer', count(*),
             |  CAST(sum(CASE WHEN o_custkey IS NOT NULL AND c._pk IS NULL
             |    THEN 1 ELSE 0 END) AS BIGINT),
             |  sum(CASE WHEN o_custkey IS NOT NULL AND c._pk IS NULL
             |    THEN 1 ELSE 0 END) = 0
             |FROM orders LEFT JOIN
             |  (SELECT DISTINCT c_custkey AS _pk FROM customer) c
             |  ON o_custkey = c._pk
             |UNION ALL
             |SELECT 'fk:lineitem.l_orderkey->orders', count(*),
             |  CAST(sum(CASE WHEN l_orderkey IS NOT NULL AND o._pk IS NULL
             |    THEN 1 ELSE 0 END) AS BIGINT),
             |  sum(CASE WHEN l_orderkey IS NOT NULL AND o._pk IS NULL
             |    THEN 1 ELSE 0 END) = 0
             |FROM lineitem LEFT JOIN
             |  (SELECT DISTINCT o_orderkey AS _pk FROM orders) o
             |  ON l_orderkey = o._pk
             |UNION ALL
             |SELECT 'fk:lineitem.l_partkey->part', count(*),
             |  CAST(sum(CASE WHEN l_partkey IS NOT NULL AND p._pk IS NULL
             |    THEN 1 ELSE 0 END) AS BIGINT),
             |  sum(CASE WHEN l_partkey IS NOT NULL AND p._pk IS NULL
             |    THEN 1 ELSE 0 END) = 0
             |FROM lineitem LEFT JOIN
             |  (SELECT DISTINCT p_partkey AS _pk FROM part) p
             |  ON l_partkey = p._pk
             |UNION ALL
             |SELECT 'fk:lineitem.l_suppkey->supplier', count(*),
             |  CAST(sum(CASE WHEN l_suppkey IS NOT NULL AND su._pk IS NULL
             |    THEN 1 ELSE 0 END) AS BIGINT),
             |  sum(CASE WHEN l_suppkey IS NOT NULL AND su._pk IS NULL
             |    THEN 1 ELSE 0 END) = 0
             |FROM lineitem LEFT JOIN
             |  (SELECT DISTINCT s_suppkey AS _pk FROM supplier) su
             |  ON l_suppkey = su._pk
             |UNION ALL
             |SELECT 'notnull:orders.o_orderdate', count(*),
             |  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT),
             |  sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) = 0
             |FROM orders
             |UNION ALL
             |SELECT 'range:lineitem.l_quantity[1,50]', count(*),
             |  CAST(sum(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0
             |    THEN 1 ELSE 0 END) AS BIGINT),
             |  sum(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0
             |    THEN 1 ELSE 0 END) = 0
             |FROM lineitem
             |UNION ALL
             |SELECT 'range:lineitem.l_discount[0,0.1]', count(*),
             |  CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.1
             |    THEN 1 ELSE 0 END) AS BIGINT),
             |  sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.1
             |    THEN 1 ELSE 0 END) = 0
             |FROM lineitem
             |UNION ALL
             |SELECT 'range:customer.c_acctbal[0,10000]', count(*),
             |  CAST(sum(CASE WHEN c_acctbal < 0.0 OR c_acctbal > 10000.0
             |    THEN 1 ELSE 0 END) AS BIGINT),
             |  sum(CASE WHEN c_acctbal < 0.0 OR c_acctbal > 10000.0
             |    THEN 1 ELSE 0 END) = 0
             |FROM customer
             |UNION ALL
             |SELECT 'accepted:lineitem.l_returnflag', count(*),
             |  CAST(sum(CASE WHEN l_returnflag IS NOT NULL
             |    AND l_returnflag NOT IN ('R', 'A', 'N')
             |    THEN 1 ELSE 0 END) AS BIGINT),
             |  sum(CASE WHEN l_returnflag IS NOT NULL
             |    AND l_returnflag NOT IN ('R', 'A', 'N')
             |    THEN 1 ELSE 0 END) = 0
             |FROM lineitem
             |ORDER BY check_name""".stripMargin)
    ),

    // Rank-sum AUC of a length-proxy quality score against a token-count
    // label — per-score-value counts, one bounded cumulative window,
    // tie-corrected exact integer AUC; both engines replay the value.
    "q_dq_auc" -> QueryDef(
      (s, d) => {
        val scored = Tables.documents(s, d)
          .withColumn("score_bp",
            expr("least(n_chars, 1000L) * 10"))
        graft.ops.DataQuality.aucBp(scored,
          size(graft.ops.TextAnalysis.tokens(col("text"))) >= 55,
          "score_bp")
      },
      Some("""WITH cells AS (
             |  SELECT least(n_chars, 1000) * 10 AS s,
             |    CAST(sum(CASE WHEN len(list_filter(string_split(text, ' '),
             |      x -> x <> '')) >= 55 THEN 1 ELSE 0 END) AS BIGINT) AS p,
             |    CAST(sum(CASE WHEN len(list_filter(string_split(text, ' '),
             |      x -> x <> '')) >= 55 THEN 0 ELSE 1 END) AS BIGINT) AS n
             |  FROM documents GROUP BY 1),
             |cum AS (
             |  SELECT s, p, n,
             |    CAST(coalesce(sum(n) OVER (ORDER BY s
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS cn
             |  FROM cells),
             |agg AS (
             |  SELECT CAST(sum(p) AS BIGINT) AS n_pos,
             |    CAST(sum(n) AS BIGINT) AS n_neg,
             |    sum(CAST(p AS HUGEINT) * cn) AS wins,
             |    sum(CAST(p AS HUGEINT) * n) AS ties
             |  FROM cum)
             |SELECT n_pos, n_neg,
             |  CASE WHEN n_pos > 0 AND n_neg > 0
             |       THEN CAST((2 * wins + ties) * 10000
             |         // (2 * CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT)
             |  END AS auc_bp
             |FROM agg""".stripMargin)
    ),

    // Reliability table for the same score/label: equal-width bp bins,
    // observed positive rate vs mean claimed score, signed gap — the
    // calibration companion to q_dq_auc.
    // Robust per-source location: mean vs 5%-trimmed vs winsorized over
    // the length-proxy score — the tail alarm (trimmed far from mean =
    // heavy tail). Exact value-domain decomposition in both engines.
    "q_dq_robust_mean" -> QueryDef(
      (s, d) => graft.ops.DataQuality.robustMean(
        Tables.documents(s, d)
          .withColumn("score_bp", expr("least(n_chars, 1000L) * 10")),
        "source", "score_bp", trimBp = 500)
        .orderBy("source"),
      Some("""WITH sc AS (
             |  SELECT source, least(n_chars, 1000) * 10 AS s
             |  FROM documents),
             |cells AS (
             |  SELECT source, s, count(*)::BIGINT AS c,
             |    CAST(sum(s) AS BIGINT) AS ss
             |  FROM sc GROUP BY 1, 2),
             |cum AS (
             |  SELECT source, s, c, ss,
             |    CAST(sum(c) OVER (PARTITION BY source ORDER BY s
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS cum,
             |    CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n
             |  FROM cells),
             |kp AS (
             |  SELECT *, n * 500 // 10000 AS kk,
             |    greatest(0, least(cum, n - n * 500 // 10000)
             |      - greatest(cum - c, n * 500 // 10000)) AS keep
             |  FROM cum),
             |agg AS (
             |  SELECT source, max(n) AS n, max(kk) AS kk,
             |    CAST(sum(ss) AS BIGINT) AS tot,
             |    CAST(sum(keep * s) AS BIGINT) AS kept,
             |    min(CASE WHEN cum >= kk + 1 THEN s END) AS lo_bp,
             |    min(CASE WHEN cum >= n - kk THEN s END) AS hi_bp
             |  FROM kp GROUP BY 1)
             |SELECT source, n, tot // n AS mean_bp,
             |  CASE WHEN n - 2 * kk > 0 THEN kept // (n - 2 * kk) END
             |    AS trimmed_mean_bp,
             |  CASE WHEN n > 0
             |    THEN (kept + kk * (lo_bp + hi_bp)) // n END
             |    AS winsor_mean_bp,
             |  lo_bp, hi_bp
             |FROM agg ORDER BY source""".stripMargin)
    ),

    // Exact Gini of supplier revenue within each nation — the Lorenz
    // inequality companion to q_analytics_hhi's share-squares; HUGEINT/
    // DECIMAL(38,0) products so n·Σx never wraps.
    "q_analytics_gini" -> QueryDef(
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .select(col("l_suppkey"),
            floor(round(col("l_extendedprice") * 100) / 100).cast("long")
              .as("_d"))
          .groupBy("l_suppkey").agg(sum("_d").as("rev"))
          .join(Tables.supplier(s, d)
            .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey")),
            "l_suppkey")
          .join(Tables.nation(s, d)
            .select(col("n_nationkey").as("s_nationkey"), col("n_name")),
            "s_nationkey")
        graft.ops.DataQuality.gini(rev, "n_name", "rev").orderBy("n_name")
      },
      Some("""WITH rev AS (
             |  SELECT n.n_name, l.l_suppkey,
             |    CAST(sum(CAST(floor(round(l_extendedprice * 100) / 100)
             |      AS BIGINT)) AS BIGINT) AS rev
             |  FROM lineitem l
             |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
             |  JOIN nation n ON n.n_nationkey = s.s_nationkey
             |  GROUP BY 1, 2),
             |cells AS (
             |  SELECT n_name, rev AS v, count(*)::BIGINT AS c
             |  FROM rev GROUP BY 1, 2),
             |cum AS (
             |  SELECT n_name, v, c,
             |    CAST(coalesce(sum(c) OVER (PARTITION BY n_name ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS cb
             |  FROM cells),
             |agg AS (
             |  SELECT n_name, CAST(sum(c) AS BIGINT) AS n,
             |    sum(CAST(v AS HUGEINT) * c) AS sx,
             |    sum(CAST(v AS HUGEINT) * (CAST(c AS HUGEINT) * cb
             |      + CAST(c AS HUGEINT) * (c + 1) // 2)) AS sr
             |  FROM cum GROUP BY 1)
             |SELECT n_name, n, CAST(sx AS BIGINT) AS total,
             |  CASE WHEN sx > 0
             |    THEN CAST((2 * sr - (n + 1) * sx) * 10000
             |      // (CAST(n AS HUGEINT) * sx) AS BIGINT) END AS gini_bp
             |FROM agg ORDER BY n_name""".stripMargin)
    ),

    "q_dq_calibration" -> QueryDef(
      (s, d) => {
        val scored = Tables.documents(s, d)
          .withColumn("score_bp", expr("least(n_chars, 1000L) * 10"))
        graft.ops.DataQuality.calibrationBins(scored,
          size(graft.ops.TextAnalysis.tokens(col("text"))) >= 55,
          "score_bp").orderBy("bin")
      },
      Some("""WITH scored AS (
             |  SELECT least(n_chars, 1000) * 10 AS s,
             |    CASE WHEN len(list_filter(string_split(text, ' '),
             |      x -> x <> '')) >= 55 THEN 1 ELSE 0 END AS y
             |  FROM documents),
             |b AS (
             |  SELECT least(greatest(s // 1000, 0), 9) AS bin,
             |    CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(y) AS BIGINT) AS n_pos,
             |    CAST(sum(s) AS BIGINT) AS ss
             |  FROM scored GROUP BY 1)
             |SELECT bin, n, n_pos, ss // n AS mean_score_bp,
             |  n_pos * 10000 // n AS pos_rate_bp,
             |  n_pos * 10000 // n - ss // n AS gap_bp
             |FROM b ORDER BY bin""".stripMargin)
    ),

    // Seeded Poisson-bootstrap CI for the per-source mean doc length:
    // 100 replicates ride one rows×100 pass, weights from the fixed
    // Poisson(1) inverse-CDF table, CI = order statistics of replicate
    // means — both engines replay the exact intervals.
    "q_dq_bootstrap_ci" -> QueryDef(
      (s, d) =>
        graft.ops.DataQuality.bootstrapCI(
          Tables.documents(s, d), "n_chars", "source", "doc_id", b = 100)
          .orderBy("source"),
      Some {
        val thr = graft.ops.DataQuality.PoissonThresholds2_32
        val cases = thr.zipWithIndex
          .map { case (t, k) => s"WHEN u < $t THEN $k" }.mkString(" ")
        def hexd(h: String, i: Int) =
          s"(instr('0123456789abcdef', substring($h, $i, 1)) - 1)"
        val hex8 = (1 to 8).map(i =>
          s"${hexd("md5('boot1:' || r || ':' || doc_id)", i)} * ${1L << (4 * (8 - i))}")
          .mkString("(", " + ", ")")
        s"""WITH reps AS MATERIALIZED (
           |  SELECT source, r,
           |    CAST(sum(w * n_chars) AS BIGINT) AS ws,
           |    CAST(sum(w) AS BIGINT) AS wn
           |  FROM (
           |    SELECT source, n_chars, r,
           |      CASE $cases ELSE ${thr.length} END AS w
           |    FROM (
           |      SELECT source, n_chars, r, $hex8 AS u
           |      FROM documents, range(0, 100) t(r)))
           |  GROUP BY 1, 2 HAVING sum(w) > 0),
           |m AS (SELECT source, r, ws * 1000000 // wn AS mean FROM reps),
           |rk AS (
           |  SELECT source, r, mean,
           |    row_number() OVER (PARTITION BY source ORDER BY mean, r) AS rr,
           |    count(*) OVER (PARTITION BY source) AS be
           |  FROM m),
           |ci AS (
           |  SELECT source, CAST(be AS BIGINT) AS b_effective,
           |    CAST(max(CASE WHEN rr = greatest((250 * be + 9999) // 10000, 1)
           |             THEN mean END) AS BIGINT) AS ci_lo_micro,
           |    CAST(max(CASE WHEN rr = greatest((9750 * be + 9999) // 10000, 1)
           |             THEN mean END) AS BIGINT) AS ci_hi_micro
           |  FROM rk GROUP BY 1, be),
           |base AS (
           |  SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
           |    CAST(sum(n_chars) AS BIGINT) * 1000000 // count(*) AS mean_micro
           |  FROM documents GROUP BY 1)
           |SELECT b.source, n_rows, mean_micro, ci_lo_micro, ci_hi_micro,
           |  b_effective
           |FROM base b JOIN ci USING (source) ORDER BY b.source""".stripMargin
      }
    ),

    // Join-size estimation by count-min inner product: the
    // lineitem ⋈ orders cardinality from two 4×65536 counter tables vs
    // the exact join count — both engines rebuild the sketches, the
    // row-wise inner products, the min, AND the honest error figure.
    "q_analytics_join_size" -> QueryDef(
      (s, d) => {
        import graft.ops.Sketches
        val la = Tables.lineitem(s, d)
          .select(col("l_orderkey").cast("string").as("k"))
        val ob = Tables.orders(s, d)
          .select(col("o_orderkey").cast("string").as("k"))
        val est = Sketches.cmsJoinSize(
          Sketches.countMinSketch(la, col("k"), depth = 4, width = 65536),
          Sketches.countMinSketch(ob, col("k"), depth = 4, width = 65536))
        // exact twin joins on the RAW integer key: the string cast is
        // injective (and null-free both ways), so the match count is
        // bit-identical while the shuffle carries 8-byte longs instead
        // of decimal strings (r9; guide §2.3 — only the md5 sketch
        // input is oracle-pinned to the string form)
        val exact = Tables.lineitem(s, d).select(col("l_orderkey").as("kk"))
          .join(Tables.orders(s, d).select(col("o_orderkey").as("kk")), "kk")
          .agg(count(lit(1)).as("join_size_exact"))
        est.crossJoin(exact) // both single-row
          .withColumn("err_bp",
            expr("(join_size_est - join_size_exact) * 10000 " +
              "div join_size_exact"))
      },
      Some {
        def hexd(h: String, i: Int) =
          s"(instr('0123456789abcdef', substring($h, $i, 1)) - 1)"
        def bucket(k: String) = {
          val h = s"md5('cms:' || r || ':' || $k)"
          s"((${hexd(h, 1)} * 1048576 + ${hexd(h, 2)} * 65536 + " +
            s"${hexd(h, 3)} * 4096 + ${hexd(h, 4)} * 256 + " +
            s"${hexd(h, 5)} * 16 + ${hexd(h, 6)}) % 65536)"
        }
        s"""WITH la AS (SELECT l_orderkey::VARCHAR AS k FROM lineitem),
           |ob AS (SELECT o_orderkey::VARCHAR AS k FROM orders),
           |ca AS MATERIALIZED (
           |  SELECT r, ${bucket("k")} AS bucket,
           |    CAST(count(*) AS BIGINT) AS cnt
           |  FROM la, range(0, 4) t(r) GROUP BY 1, 2),
           |cb AS MATERIALIZED (
           |  SELECT r, ${bucket("k")} AS bucket,
           |    CAST(count(*) AS BIGINT) AS cnt
           |  FROM ob, range(0, 4) t(r) GROUP BY 1, 2),
           |ip AS (
           |  SELECT ca.r, CAST(sum(ca.cnt * cb.cnt) AS BIGINT) AS ip
           |  FROM ca JOIN cb ON ca.r = cb.r AND ca.bucket = cb.bucket
           |  GROUP BY 1),
           |est AS (
           |  SELECT CAST(min(ip) AS BIGINT) AS join_size_est,
           |    CAST(count(*) AS BIGINT) AS depth FROM ip),
           |ex AS (
           |  SELECT CAST(count(*) AS BIGINT) AS join_size_exact
           |  FROM la JOIN ob USING (k))
           |SELECT join_size_est, depth, join_size_exact,
           |  (join_size_est - join_size_exact) * 10000 // join_size_exact
           |    AS err_bp
           |FROM est, ex""".stripMargin
      }
    ),

    // Spearman rank agreement between two quality signals (token count
    // vs distinct-token count, both capped at 500 — correlated, heavily
    // tied): both engines build the same doubled average ranks over each
    // score's value domain and replay the two-stage truncated rho.
    "q_dq_spearman" -> QueryDef(
      (s, d) => {
        val toks = graft.ops.TextAnalysis.tokens(col("text"))
        val scored = Tables.documents(s, d).select(
          least(size(toks), lit(500)).cast("long").as("score_a"),
          least(size(array_distinct(toks)), lit(500)).cast("long")
            .as("score_b"))
        graft.ops.DataQuality.spearmanBp(scored, "score_a", "score_b")
      },
      Some("""WITH s AS (
             |  SELECT
             |    least(len(list_filter(string_split(text, ' '),
             |      x -> x <> '')), 500)::BIGINT AS a,
             |    least(len(list_distinct(list_filter(string_split(text, ' '),
             |      x -> x <> ''))), 500)::BIGINT AS b
             |  FROM documents),
             |ca AS (SELECT a AS v, count(*)::BIGINT AS c FROM s GROUP BY 1),
             |cb AS (SELECT b AS v, count(*)::BIGINT AS c FROM s GROUP BY 1),
             |ra AS (
             |  SELECT v, CAST(2 * coalesce(sum(c) OVER (ORDER BY v
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |    + c + 1 AS BIGINT) AS r2
             |  FROM ca),
             |rb AS (
             |  SELECT v, CAST(2 * coalesce(sum(c) OVER (ORDER BY v
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |    + c + 1 AS BIGINT) AS r2
             |  FROM cb),
             |j AS (
             |  SELECT ra.r2 AS x, rb.r2 AS y
             |  FROM s JOIN ra ON s.a = ra.v JOIN rb ON s.b = rb.v),
             |m AS (
             |  SELECT count(*)::BIGINT AS n,
             |    CAST(sum(x::HUGEINT) AS HUGEINT) AS sx,
             |    CAST(sum(y::HUGEINT) AS HUGEINT) AS sy,
             |    CAST(sum(x::HUGEINT * y) AS HUGEINT) AS sxy,
             |    CAST(sum(x::HUGEINT * x) AS HUGEINT) AS sxx,
             |    CAST(sum(y::HUGEINT * y) AS HUGEINT) AS syy
             |  FROM j),
             |dd AS (
             |  SELECT n, n * sxy - sx * sy AS num, n * sxx - sx * sx AS dx,
             |    n * syy - sy * sy AS dy
             |  FROM m),
             |r2 AS (
             |  SELECT n,
             |    CASE WHEN dx > 0 AND dy > 0 THEN
             |      CAST((CASE WHEN num >= 0 THEN 1 ELSE -1 END) *
             |        ((abs(num) * 10000 // dx) * (abs(num) * 10000 // dy))
             |        AS BIGINT) END AS rho2_e8
             |  FROM dd)
             |SELECT n,
             |  (SELECT count(*) FROM ca)::BIGINT AS n_distinct_a,
             |  (SELECT count(*) FROM cb)::BIGINT AS n_distinct_b,
             |  rho2_e8,
             |  CASE WHEN rho2_e8 IS NULL THEN NULL
             |       ELSE (CASE WHEN rho2_e8 >= 0 THEN 1 ELSE -1 END) *
             |         CAST(floor(sqrt(abs(rho2_e8)::DOUBLE)) AS BIGINT) END
             |    AS rho_bp
             |FROM r2""".stripMargin)
    ),

    // Paired sign-flip permutation test: is metric A (token count) really
    // above metric B (2x distinct-token count) beyond chance? 200
    // md5-parity sign-flip replicas, add-one p - every replica total and
    // the p-value replay exactly in both engines.
    "q_dq_perm_test" -> QueryDef(
      (s, d) => {
        val toks = graft.ops.TextAnalysis.tokens(col("text"))
        val pairs = Tables.documents(s, d).select(col("doc_id"),
          (least(size(toks), lit(500))
            - lit(2) * least(size(array_distinct(toks)), lit(250)))
            .cast("long").as("delta"))
        graft.ops.DataQuality.pairedPermTest(pairs, "doc_id", "delta", 200)
      },
      Some("""WITH s AS (
             |  SELECT doc_id,
             |    least(len(list_filter(string_split(text, ' '),
             |      x -> x <> '')), 500)
             |    - 2 * least(len(list_distinct(list_filter(
             |        string_split(text, ' '), x -> x <> ''))), 250) AS dd
             |  FROM documents),
             |obs AS (
             |  SELECT count(*)::BIGINT AS n, CAST(sum(dd) AS BIGINT) AS t_obs
             |  FROM s),
             |fl AS (
             |  SELECT r, CAST(sum(CASE WHEN
             |      (instr('0123456789abcdef', substring(
             |        md5(doc_id::VARCHAR || ':' || r::VARCHAR), 1, 1)) - 1)
             |      % 2 = 0 THEN dd ELSE -dd END) AS BIGINT) AS t
             |  FROM s, range(0, 200) q(r) GROUP BY 1),
             |ex AS (
             |  SELECT CAST(sum(CASE WHEN abs(t) >=
             |      (SELECT abs(t_obs) FROM obs) THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_extreme
             |  FROM fl)
             |SELECT n, t_obs, n_extreme,
             |  (n_extreme + 1) * 10000 // 201 AS p_bp
             |FROM obs, ex""".stripMargin)
    ),

    // McNemar's discordant-pair test on two pass/fail gates (50+ words
    // vs 30+ distinct words): exact-integer chi-square on the items the
    // two gates disagree about.
    "q_dq_mcnemar" -> QueryDef(
      (s, d) => {
        val toks = graft.ops.TextAnalysis.tokens(col("text"))
        val gated = Tables.documents(s, d).select(
          (size(toks) >= 50).as("ok_a"),
          (size(array_distinct(toks)) >= 30).as("ok_b"))
        graft.ops.DataQuality.mcnemar(gated, col("ok_a"), col("ok_b"))
      },
      Some("""WITH s AS (
             |  SELECT
             |    len(list_filter(string_split(text, ' '), x -> x <> ''))
             |      >= 50 AS ok_a,
             |    len(list_distinct(list_filter(string_split(text, ' '),
             |      x -> x <> ''))) >= 30 AS ok_b
             |  FROM documents),
             |m AS (
             |  SELECT count(*)::BIGINT AS n,
             |    CAST(sum(CASE WHEN ok_a AND NOT ok_b THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n01,
             |    CAST(sum(CASE WHEN NOT ok_a AND ok_b THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n10
             |  FROM s)
             |SELECT n, n01, n10,
             |  CASE WHEN n01 + n10 > 0
             |    THEN (n01 - n10) * (n01 - n10) * 100 // (n01 + n10)
             |  END AS chi2_x100
             |FROM m""".stripMargin)
    ),

    // Benford first-digit audit on order totals: observed vs expected
    // digit shares in bp over the densified 1..9 spine. The expected
    // shares are driver-computed integer literals (the nDCG precedent)
    // embedded in BOTH plans, so neither engine evaluates a log.
    "q_analytics_benford" -> QueryDef(
      (s, d) => graft.ops.DataQuality.benford(
        Tables.orders(s, d), "o_totalprice"),
      Some {
        val expCase = (1 to 9).map(dd =>
          s"WHEN spine.digit = $dd THEN ${graft.ops.DataQuality.benfordBp(dd)}")
          .mkString("CASE ", " ", " END")
        s"""WITH v AS (
           |  SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
           |      AS VARCHAR), 1, 1) AS INTEGER) AS digit
           |  FROM orders WHERE floor(o_totalprice) >= 1),
           |obs AS (SELECT digit, count(*)::BIGINT AS obs FROM v GROUP BY 1),
           |tot AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM obs),
           |spine AS (SELECT CAST(unnest(generate_series(1, 9)) AS INTEGER)
           |  AS digit),
           |r AS (
           |  SELECT spine.digit,
           |    CAST(coalesce(obs.obs, 0) AS BIGINT) AS obs, tot.n,
           |    CAST(coalesce(obs.obs, 0) AS BIGINT) * 10000 // tot.n
           |      AS obs_bp,
           |    CAST($expCase AS BIGINT) AS exp_bp
           |  FROM spine LEFT JOIN obs USING (digit), tot)
           |SELECT digit, obs, n, obs_bp, exp_bp,
           |  abs(obs_bp - exp_bp) AS dev_bp
           |FROM r ORDER BY digit""".stripMargin
      }
    ),

    // Wilson 95% score interval on the per-source pass rate of the
    // 50-token gate: the honest error bar across sources of very
    // different sizes — exact quantized arithmetic except one IEEE
    // double sqrt both engines evaluate identically.
    "q_dq_wilson" -> QueryDef(
      (s, d) => {
        val toks = graft.ops.TextAnalysis.tokens(col("text"))
        graft.ops.DataQuality.wilsonCi(
          Tables.documents(s, d).select(col("source"),
            (size(toks) >= 50).as("ok")),
          "source", col("ok")).orderBy("source")
      },
      Some("""WITH s AS (
             |  SELECT source,
             |    len(list_filter(string_split(text, ' '), x -> x <> ''))
             |      >= 50 AS ok
             |  FROM documents),
             |g AS (
             |  SELECT source, count(*)::BIGINT AS n,
             |    CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS k
             |  FROM s GROUP BY 1),
             |w AS (
             |  SELECT source, n, k, k * 10000 // n AS p_bp,
             |    CAST(floor(sqrt(CAST(38416::BIGINT
             |      * ((10000 * k * (n - k)) // n)
             |      + (38416::BIGINT * 38416) // 4 AS DOUBLE))) AS BIGINT)
             |      AS s2
             |  FROM g)
             |SELECT source, n, k, p_bp,
             |  greatest(0, 10000 * (2 * 10000 * k + 38416 - 2 * s2)
             |    // (2 * (10000 * n + 38416))) AS lo_bp,
             |  least(10000, 10000 * (2 * 10000 * k + 38416 + 2 * s2)
             |    // (2 * (10000 * n + 38416))) AS hi_bp
             |FROM w ORDER BY source""".stripMargin)
    )
  )
}
