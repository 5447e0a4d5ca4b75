package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator surface over the TESTDATA star schema: scans with
  * pushdown, projections/filters, every join flavor (broadcast, semi,
  * anti, outer, range), aggregation (hash, rollup, conditional, exact
  * quantiles, approx-distinct), distinct, window functions (ranking,
  * analytic, running), sorts/top-k, set operations, scalar
  * string/date/math/JSON functions, and gap-based sessionization.
  *
  * Each query has (a) a Spark DataFrame implementation and (b) an ANSI-SQL
  * oracle run by the driver in DuckDB over the same parquet files. Column
  * names and types are kept identical on both sides (the driver sorts
  * columns by name and hashes values):
  *   - double aggregates are `round(..., k)` on BOTH sides so summation
  *     order can't flip the last ulp;
  *   - DuckDB integer sums/`length`/`floor`/`row_number` are cast to match
  *     Spark's output types (BIGINT vs HUGEINT/INT quirks).
  */
object RelationalQueries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // Money per-row values round to 4 dp on both sides: inputs carry ≤2
  // decimals, so products have ≤4 true decimals — a 4-dp round recovers
  // the exact decimal value in both engines, immune to rounding-rule
  // differences AT a half-way boundary (which 2 dp can hit).
  private def r2(c: Column): Column = round(c, 4)

  // Money SUMS go through DECIMAL: double summation order differs between
  // engines and at sf0.1 the accumulated error (~1e-5 on ~1e9 sums)
  // already straddles the 4-dp grid, so round-after-sum is not
  // scale-robust. Summing per-row-rounded decimals is exact and
  // order-independent; the final double cast is then identical.
  private def moneySum(c: Column): Column =
    sum(round(c, 4).cast("decimal(28,4)")).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- scans / aggregation -------------------------------------------
    // TPC-H Q1 style: map-side partial agg into a 6-row result.
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // Filter + projection; predicates and column pruning reach the scan.
    "q2_filter_pushdown" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-06-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_linenumber"),
          r2(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    }),

    // ---- joins ----------------------------------------------------------
    // 5-way star join; true dims (nation 25 rows, region 5) broadcast,
    // fact-scale tables (lineitem, orders, customer — all grow with SF)
    // shuffle on their keys; AQE turns customer into a broadcast join at
    // small SF on its own, without baking an OOM into the 100× plan.
    "q3_join_star" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(
          moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // Left-semi (EXISTS): customers with ≥1 1995 order, counted per nation.
    "q4_semi_join" -> ((s, dir) => {
      val o95 = t(s, dir, "orders").filter(year(col("o_orderdate")) === 1995)
      t(s, dir, "customer")
        .join(o95, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_nationkey").agg(count(lit(1)).as("n_customers"))
    }),

    // Left-anti (NOT EXISTS): parts never shipped, counted per brand.
    "q5_anti_join" -> ((s, dir) => {
      t(s, dir, "part")
        .join(t(s, dir, "lineitem"), col("p_partkey") === col("l_partkey"), "left_anti")
        .groupBy("p_brand").agg(count(lit(1)).as("n_parts"))
    }),

    // Left-outer join + per-customer aggregate (0 orders preserved).
    "q6_outer_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(moneySum(col("o_totalprice")), lit(0.0)).as("total_spent"))
    }),

    // Equi + range (interval) join: events within 5 minutes after an error
    // event of the same user.
    "q7_range_join" -> ((s, dir) => {
      val e = t(s, dir, "events").select("user_id", "ts", "event_id")
      val err = t(s, dir, "events").filter(col("event_type") === "error")
        .select(col("user_id").as("e_user"), col("ts").as("e_ts"))
      e.join(err,
        col("user_id") === col("e_user") &&
          col("ts") > col("e_ts") &&
          col("ts") <= col("e_ts") + expr("INTERVAL 5 MINUTES"))
        .groupBy("user_id").agg(count(lit(1)).as("n_pairs"))
    }),

    // ---- distinct / set ops --------------------------------------------
    "q8_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()),

    "q9_set_ops" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val withOrders = t(s, dir, "orders").select(col("o_custkey").as("custkey")).distinct()
      val rich = c.filter(col("c_acctbal") > 7000).select(col("c_custkey").as("custkey"))
      val machinery = c.filter(col("c_mktsegment") === "MACHINERY").select(col("c_custkey").as("custkey"))
      rich.intersect(withOrders).union(machinery.except(withOrders)).distinct()
    }),

    // ---- window functions ----------------------------------------------
    // Top-3 orders per customer by price (ranking window + filter).
    "q10_window_topk" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    }),

    // Analytic windows: lag/lead/rank/running sum per customer order history.
    "q11_window_analytics" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val wr = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        lag("o_totalprice", 1).over(w).as("prev_price"),
        lead("o_totalprice", 1).over(w).as("next_price"),
        rank().over(wr).cast("long").as("price_rank"),
        sum(round(col("o_totalprice"), 4).cast("decimal(28,4)")).over(w.rowsBetween(Long.MinValue, 0)).cast("double").as("running_spent"))
    }),

    // The rest of the analytic-function surface: dense/percent ranks,
    // cume_dist, quartile ntile, first/nth value over the full frame —
    // fully tie-broken ordering so every engine agrees exactly
    "q35_window_ranks" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val full = w.rowsBetween(Long.MinValue, Long.MaxValue)
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        dense_rank().over(w).cast("long").as("drank"),
        round(percent_rank().over(w), 6).as("prank"),
        round(cume_dist().over(w), 6).as("cdist"),
        ntile(4).over(w).cast("long").as("quartile"),
        first_value(col("o_orderkey")).over(full).as("top_order"),
        nth_value(col("o_orderkey"), 2).over(full).as("second_order"))
    }),

    // Forward gap-fill (last-observation-carried-forward) with
    // IGNORE NULLS over a growing frame — the sensor-data staple; NULLs
    // planted on every 7th event so the fill is exercised on real rows.
    // Deliberately a GROWING frame: a shrinking (1, unboundedFollowing)
    // frame is O(rows²) per partition in Spark (see Interpolate).
    "q36_gap_fill" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val v = when(col("event_id") % 7 === 0, lit(null).cast("double"))
        .otherwise(col("value"))
      t(s, dir, "events").select(col("user_id"), col("event_id"),
        round(v, 6).as("value_gapped"),
        round(last(v, ignoreNulls = true).over(w), 6).as("value_filled"))
    }),

    // Trailing-7-day distinct active users per day — COUNT(DISTINCT)
    // over a window, which Spark's window functions cannot express
    // (and a per-day rescan would be O(days·corpus)). The scale-correct
    // restatement: distinct (day, user) pairs each EXPLODE into the ≤7
    // window-end days they're visible from, dedup again, count — total
    // shuffle volume is 7× the distinct-pair count, independent of the
    // window being "distinct". Output restricted to days that exist.
    "q37_rolling_distinct" -> ((s, dir) => {
      val du = t(s, dir, "events")
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val present = du.select(col("day")).distinct()
      du.select(explode(sequence(col("day"), date_add(col("day"), 6)))
          .as("day"), col("user_id"))
        .distinct()
        .join(present, "day")
        .groupBy("day")
        .agg(count(lit(1)).as("active_7d"))
    }),

    // ---- sort / limit ---------------------------------------------------
    "q12_topn" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")),

    // ---- grouping sets / conditional agg / quantiles -------------------
    "q13_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n_rows"))),

    // explicit GROUPING SETS (the general form rollup/cube specialize):
    // status×priority detail, per-status subtotal, grand total — decimal
    // sums so both engines aggregate exactly
    "q31_grouping_sets" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(28,2)")).as("sum_price_raw"))
        .withColumn("sum_price", col("sum_price_raw").cast("double"))
        .drop("sum_price_raw")),

    "q14_case_agg" -> ((s, dir) =>
      t(s, dir, "part").groupBy("p_brand").agg(
        sum(when(col("p_size") > 25, 1).otherwise(0)).cast("long").as("n_large"),
        sum(when(col("p_type") === "ECONOMY", round(col("p_retailprice"), 4).cast("decimal(28,4)"))).as("economy_price_raw"),
        count(lit(1)).as("n_parts"))
      .withColumn("economy_price", coalesce(col("economy_price_raw").cast("double"), lit(0.0)))
      .drop("economy_price_raw")),

    "q15_quantiles" -> ((s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag").agg(
        round(percentile(col("l_quantity"), lit(0.5)), 6).as("median_qty"),
        round(percentile(col("l_extendedprice"), lit(0.9)), 6).as("p90_price"),
        min("l_quantity").as("min_qty"),
        max("l_quantity").as("max_qty"))),

    // Approx-distinct sketch (HyperLogLog++): implementation-specific
    // values, so no SQL oracle — driver records a rows-only check.
    // HLL sketch with a self-certifying bound (the ANN recall-
    // certificate pattern): the sketch estimate is implementation-
    // specific so it cannot be in the hashed output, but the in-plan
    // assert pins it within 10% of exact (default rsd 5%) — a sketch
    // regression fails the query; the oracle checks the exact column
    "q16_approx_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag").agg(
        approx_count_distinct("l_partkey").as("__approx"),
        countDistinct("l_partkey").as("exact_parts"))
        .filter(assert_true(
          abs(col("__approx") - col("exact_parts")) <=
            col("exact_parts") * lit(0.1),
          concat(lit("HLL estimate out of bound for flag "),
            col("l_returnflag"))).isNull)
        .select("l_returnflag", "exact_parts")),

    // ---- scalar functions ----------------------------------------------
    "q17_scalar_fns" -> ((s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_type")).as("type_upper"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        (col("p_size") % 7).as("size_mod"),
        r2(col("p_retailprice") * 1.1).as("marked_up"),
        sqrt(col("p_size")).as("size_sqrt"),
        floor(col("p_retailprice") / 100).as("price_bucket"),
        substring(col("p_name"), 1, 4).as("name_prefix"))),

    "q18_date_fns" -> ((s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        col("o_orderdate").cast("date").as("order_date"),
        date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
        datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_ref"))),

    "q19_json_fns" -> ((s, dir) =>
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))),

    // String aggregation, deterministic via sorted collect.
    "q20_string_agg" -> ((s, dir) =>
      t(s, dir, "nation").groupBy("n_regionkey")
        .agg(concat_ws(",", array_sort(collect_list("n_name"))).as("nations"))),

    // CUBE grouping sets (all 4 combinations of the two dims).
    "q24_cube" -> ((s, dir) =>
      t(s, dir, "part")
        .cube("p_brand", "p_type")
        .agg(count(lit(1)).as("n"), sum("p_size").cast("long").as("sum_size"))),

    // Map-typed columns: JSON props → map, then map functions (scalar
    // outputs so the parquet/duckdb comparison stays simple).
    "q25_map_fns" -> ((s, dir) =>
      t(s, dir, "events")
        .withColumn("m", from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>")))
        .select(
          col("event_id"),
          size(col("m")).cast("long").as("n_keys"),
          element_at(map_keys(col("m")), 1).as("first_key"),
          element_at(col("m"), "k").as("k_value"))),

    // Multiset (bag) semantics: INTERSECT ALL / EXCEPT ALL keep duplicate
    // cardinality, unlike q9's set-semantics ops.
    "q23_multiset_ops" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_suppkey").as("k"))
      val o = t(s, dir, "orders").select((col("o_custkey") % 100).as("k"))
      li.intersectAll(o).groupBy("k").agg(count(lit(1)).as("n_inter"))
        .join(li.exceptAll(o).groupBy("k").agg(count(lit(1)).as("n_except")),
          Seq("k"), "full")
        .select(col("k"),
          coalesce(col("n_inter"), lit(0L)).as("n_inter"),
          coalesce(col("n_except"), lit(0L)).as("n_except"))
    }),

    // SQL-text interface: the same engine surface through spark.sql over
    // registered views (the oracle is literally the same statement).
    // Ordered funnel (view → click → purchase): stage timestamps via
    // nested partition-only windows — derived columns feed the next
    // window, all on the same partitioning, so the whole funnel is ONE
    // Exchange + three Window nodes + one aggregate
    "q33_funnel" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
      t(s, dir, "events")
        .withColumn("t1", min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("t2", min(when(col("event_type") === "click" &&
          col("ts") > col("t1"), col("ts"))).over(w))
        .withColumn("t3", min(when(col("event_type") === "purchase" &&
          col("ts") > col("t2"), col("ts"))).over(w))
        .agg(
          count_distinct(when(col("t1").isNotNull, col("user_id"))).as("n_view"),
          count_distinct(when(col("t2").isNotNull, col("user_id"))).as("n_click"),
          count_distinct(when(col("t3").isNotNull, col("user_id"))).as("n_purchase"))
    }),

    // Weekly retention cohorts: cohort = ISO week of the user's first
    // event, n_users active per (cohort, week offset) — first-activity
    // aggregate joined back, then one hash aggregate
    "q34_retention" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val first = e.groupBy("user_id")
        .agg(date_trunc("week", min(col("ts"))).as("cohort"))
      e.join(first, Seq("user_id"))
        .withColumn("week_off",
          floor((unix_micros(col("ts")) - unix_micros(col("cohort"))) /
            lit(604800000000L)).cast("long"))
        .groupBy(unix_micros(col("cohort")).as("cohort_us"), col("week_off"))
        .agg(count_distinct(col("user_id")).as("n_users"))
    }),

    // correlated EXISTS / NOT EXISTS through the SQL front end (the
    // rewrite target is semi/anti joins — asserted cartesian-free by
    // the plan sweep; complements q4/q5's DataFrame-API joins and
    // q28's correlated SCALAR subquery)
    "q32_exists_subquery" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT c_custkey, c_name FROM customer c
           WHERE EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_totalprice > 150000)
             AND NOT EXISTS (SELECT 1 FROM orders o2
                             WHERE o2.o_custkey = c.c_custkey
                               AND o2.o_orderstatus = 'F')""")
    }),

    "q22_sql_interface" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      t(s, dir, "part").createOrReplaceTempView("part")
      s.sql(
        """SELECT p_brand, count(*) AS n_ship, sum(l_quantity) AS qty
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE p_size > 40 GROUP BY p_brand""")
    }),

    // ---- sessionization (gap > 30 min starts a new session) ------------
    "q21_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val us = unix_micros(col("ts"))
      val newSess = when(
        (us - lag(us, 1).over(w)) > 1800L * 1000000L, 1L).otherwise(0L)
      t(s, dir, "events")
        .withColumn("sess", sum(newSess).over(w.rowsBetween(Long.MinValue, 0)))
        .groupBy("user_id", "sess")
        .agg(count(lit(1)).as("n_events"),
          ((max(us) - min(us)) / lit(1000000.0)).as("duration_sec"))
    }),

    // ---- pivot: event counts per user spread across event-type columns
    // (the DataFrame pivot operator; fixed value list so the schema is
    // static and the oracle is a plain CASE aggregation)
    "q27_pivot" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "error", "signup"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("user_id"), col("click").as("n_click"),
          col("view").as("n_view"), col("purchase").as("n_purchase"),
          col("error").as("n_error"), col("signup").as("n_signup"))),

    // ---- time-RANGE window frame: each event's trailing-24h moving
    // average per user — a RANGE (value-based) frame over event-time
    // micros, not a ROWS frame; rows with equal ordering values share
    // one frame, so the result is order-insensitive and oracle-exact
    "q30_range_frame" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val us = unix_micros(col("ts"))
      val w = Window.partitionBy("user_id").orderBy(us)
        .rangeBetween(-86400L * 1000000L, 0L)
      // decimal window sum: tied ordering values make the in-frame
      // float summation order engine-dependent (moneySum discipline)
      t(s, dir, "events").select(
        col("user_id"), col("event_id"),
        sum(round(col("value"), 4).cast("decimal(28,4)")).over(w)
          .cast("double").as("sum_24h"),
        count(lit(1)).over(w).as("n_24h"))
    }),

    // ---- unpivot (melt): the pivot's inverse — customer measure
    // columns stacked into (measure, val) rows via the stack() generator
    "q29_unpivot" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"),
          expr("stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE))")
            .as(Seq("measure", "val")))),

    // ---- correlated scalar subquery: customers above their own
    // nation's average balance (decorrelates to an aggregate + join)
    "q28_subquery" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      c.createOrReplaceTempView("customer_sq")
      s.sql("""SELECT c_custkey, c_name, round(c_acctbal, 4) AS bal
               FROM customer_sq o
               WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_sq i
                                  WHERE i.c_nationkey = o.c_nationkey)""")
    }),

    // ---- as-of join (merge_asof): each click joined to the user's most
    // recent purchase at-or-before it. Union + one windowed scan — one
    // Exchange, one Sort, NO join node (see AsOf scaladoc); the oracle is
    // an independent formulation (LATERAL top-1), so parity checks the
    // semantics, not the plan.
    "q26_asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      val purchases = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      AsOf.join(clicks, purchases, keys = Seq("user_id"), tsCol = "ts",
          rightId = "event_id", rightVals = Seq("value"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("value"),
          col("event_id_r").as("purchase_id"),
          unix_micros(col("ts_r")).as("purchase_ts_us"),
          col("value_r").as("purchase_value"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         CAST(sum(CAST(round(l_extendedprice, 4) AS DECIMAL(28,4))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount), 4) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
         round(avg(l_quantity), 4) AS avg_qty,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",

    "q2_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber,
         round(l_extendedprice * (1.0 - l_discount), 4) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-06-01'
           AND l_shipdate < TIMESTAMP '1996-01-01'
           AND l_quantity >= 45""",

    "q3_join_star" ->
      """SELECT r_name,
         CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount), 4) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
         count(*) AS n_rows
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name""",

    "q4_semi_join" ->
      """SELECT c_nationkey, count(*) AS n_customers
         FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey
                         AND year(o_orderdate) = 1995)
         GROUP BY c_nationkey""",

    "q5_anti_join" ->
      """SELECT p_brand, count(*) AS n_parts
         FROM part
         WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
         GROUP BY p_brand""",

    "q6_outer_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
         coalesce(CAST(sum(CAST(round(o_totalprice, 4) AS DECIMAL(28,4))) AS DOUBLE), 0.0) AS total_spent
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey""",

    "q7_range_join" ->
      """SELECT e.user_id, count(*) AS n_pairs
         FROM events e
         JOIN (SELECT user_id AS e_user, ts AS e_ts FROM events
               WHERE event_type = 'error') err
           ON e.user_id = err.e_user
          AND e.ts > err.e_ts
          AND e.ts <= err.e_ts + INTERVAL 5 MINUTE
         GROUP BY e.user_id""",

    "q8_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",

    "q9_set_ops" ->
      """WITH with_orders AS (SELECT DISTINCT o_custkey AS custkey FROM orders),
            rich AS (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 7000),
            machinery AS (SELECT c_custkey AS custkey FROM customer
                          WHERE c_mktsegment = 'MACHINERY')
         SELECT DISTINCT custkey FROM (
           SELECT custkey FROM (SELECT * FROM rich INTERSECT SELECT * FROM with_orders)
           UNION
           SELECT custkey FROM (SELECT * FROM machinery EXCEPT SELECT * FROM with_orders))""",

    "q10_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  CAST(row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
           FROM orders) WHERE rn <= 3""",

    "q11_window_analytics" ->
      """SELECT o_custkey, o_orderkey,
         lag(o_totalprice) OVER w AS prev_price,
         lead(o_totalprice) OVER w AS next_price,
         CAST(rank() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS price_rank,
         round(sum(o_totalprice) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spent
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",

    "q12_topn" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""",

    "q13_rollup" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty, count(*) AS n_rows
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",

    "q31_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                 (o_orderstatus), ())""",

    "q14_case_agg" ->
      """SELECT p_brand,
         CAST(sum(CASE WHEN p_size > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
         count(*) AS n_parts,
         round(coalesce(sum(CASE WHEN p_type = 'ECONOMY'
                            THEN p_retailprice END), 0.0), 2) AS economy_price
         FROM part GROUP BY p_brand""",

    "q15_quantiles" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
         round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
         min(l_quantity) AS min_qty,
         max(l_quantity) AS max_qty
         FROM lineitem GROUP BY l_returnflag""",

    // the sketch estimate stays out of the output (engine-specific);
    // the in-plan assert certifies it against this exact column
    "q16_approx_distinct" ->
      """SELECT l_returnflag,
         CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts
         FROM lineitem GROUP BY l_returnflag""",

    "q17_scalar_fns" ->
      """SELECT p_partkey,
         upper(p_type) AS type_upper,
         CAST(length(p_name) AS BIGINT) AS name_len,
         p_brand || '-' || p_type AS brand_type,
         p_size % 7 AS size_mod,
         round(p_retailprice * 1.1, 4) AS marked_up,
         sqrt(p_size) AS size_sqrt,
         CAST(floor(p_retailprice / 100) AS BIGINT) AS price_bucket,
         substring(p_name, 1, 4) AS name_prefix
         FROM part""",

    "q18_date_fns" ->
      """SELECT o_orderkey,
         CAST(year(o_orderdate) AS INTEGER) AS y,
         CAST(month(o_orderdate) AS INTEGER) AS m,
         CAST(day(o_orderdate) AS INTEGER) AS d,
         CAST(o_orderdate AS DATE) AS order_date,
         CAST(o_orderdate AS DATE) + 30 AS due_date,
         datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_ref
         FROM orders""",

    "q19_json_fns" ->
      """SELECT event_type,
         CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
         count(*) AS n
         FROM events GROUP BY event_type""",

    "q20_string_agg" ->
      """SELECT n_regionkey,
         string_agg(n_name, ',' ORDER BY n_name) AS nations
         FROM nation GROUP BY n_regionkey""",

    "q24_cube" ->
      """SELECT p_brand, p_type, count(*) AS n,
         CAST(sum(p_size) AS BIGINT) AS sum_size
         FROM part GROUP BY CUBE (p_brand, p_type)""",

    "q25_map_fns" ->
      """SELECT event_id,
         CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
         json_keys(props)[1] AS first_key,
         CAST(props->>'$.k' AS BIGINT) AS k_value
         FROM events""",

    "q23_multiset_ops" ->
      """WITH li AS (SELECT l_suppkey AS k FROM lineitem),
            o AS (SELECT o_custkey % 100 AS k FROM orders),
            i AS (SELECT k, count(*) AS n_inter FROM
                    (SELECT * FROM li INTERSECT ALL SELECT * FROM o) GROUP BY k),
            e AS (SELECT k, count(*) AS n_except FROM
                    (SELECT * FROM li EXCEPT ALL SELECT * FROM o) GROUP BY k)
         SELECT coalesce(i.k, e.k) AS k,
           coalesce(n_inter, 0) AS n_inter,
           coalesce(n_except, 0) AS n_except
         FROM i FULL JOIN e ON i.k = e.k""",

    "q35_window_ranks" ->
      """SELECT o_custkey, o_orderkey,
         CAST(dense_rank() OVER w AS BIGINT) AS drank,
         round(percent_rank() OVER w, 6) AS prank,
         round(cume_dist() OVER w, 6) AS cdist,
         CAST(ntile(4) OVER w AS BIGINT) AS quartile,
         first_value(o_orderkey) OVER wf AS top_order,
         nth_value(o_orderkey, 2) OVER wf AS second_order
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey),
                wf AS (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING)""",

    "q36_gap_fill" ->
      """WITH g AS (SELECT user_id, event_id, ts,
              CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
            FROM events)
         SELECT user_id, event_id, round(v, 6) AS value_gapped,
           round(last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS value_filled
         FROM g""",

    // deliberately a DIFFERENT algorithm than the engine: DuckDB can
    // evaluate COUNT(DISTINCT) directly over a RANGE window, so the
    // oracle cross-checks the explode-dedup restatement against the
    // native windowed form
    "q37_rolling_distinct" ->
      """WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
                    FROM events),
            r AS (SELECT day, CAST(count(DISTINCT user_id) OVER (
                    ORDER BY day RANGE BETWEEN INTERVAL 6 DAY PRECEDING
                    AND CURRENT ROW) AS BIGINT) AS active_7d
                  FROM d)
         SELECT DISTINCT day, active_7d FROM r""",

    "q33_funnel" ->
      """WITH s1 AS (SELECT user_id, event_type, ts,
              min(CASE WHEN event_type = 'view' THEN ts END)
                OVER (PARTITION BY user_id) AS t1
            FROM events),
            s2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1
                     THEN ts END) OVER (PARTITION BY user_id) AS t2
            FROM s1),
            s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2
                     THEN ts END) OVER (PARTITION BY user_id) AS t3
            FROM s2)
         SELECT count(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END) AS n_view,
           count(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) AS n_click,
           count(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END) AS n_purchase
         FROM s3""",

    "q34_retention" ->
      """WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort
                    FROM events GROUP BY user_id)
         SELECT epoch_us(cohort) AS cohort_us,
           CAST(floor((epoch_us(ts) - epoch_us(cohort)) / 604800000000.0)
                AS BIGINT) AS week_off,
           count(DISTINCT user_id) AS n_users
         FROM events JOIN f USING (user_id)
         GROUP BY 1, 2""",

    "q32_exists_subquery" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_totalprice > 150000)
           AND NOT EXISTS (SELECT 1 FROM orders o2
                           WHERE o2.o_custkey = c.c_custkey
                             AND o2.o_orderstatus = 'F')""",

    "q22_sql_interface" ->
      """SELECT p_brand, count(*) AS n_ship, sum(l_quantity) AS qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_size > 40 GROUP BY p_brand""",

    "q21_sessionize" ->
      """WITH b AS (
           SELECT user_id, epoch_us(ts) AS us,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800 * 1000000 THEN 1 ELSE 0 END AS new_sess
           FROM events),
           s AS (
           SELECT user_id, us,
             CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess
           FROM b)
         SELECT user_id, sess, count(*) AS n_events,
           (max(us) - min(us)) / 1000000.0 AS duration_sec
         FROM s GROUP BY user_id, sess""",

    "q27_pivot" ->
      """SELECT user_id,
         CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
         CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view,
         CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
         CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
         CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup
         FROM events GROUP BY user_id""",

    "q28_subquery" ->
      """SELECT c_custkey, c_name, round(c_acctbal, 4) AS bal
         FROM customer o
         WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer i
                            WHERE i.c_nationkey = o.c_nationkey)""",

    "q29_unpivot" ->
      """SELECT c_custkey, 'acctbal' AS measure, c_acctbal AS val FROM customer
         UNION ALL
         SELECT c_custkey, 'nationkey' AS measure, CAST(c_nationkey AS DOUBLE) AS val
         FROM customer""",

    "q30_range_frame" ->
      """SELECT user_id, event_id,
         CAST(sum(CAST(round(value, 4) AS DECIMAL(28,4))) OVER w AS DOUBLE) AS sum_24h,
         CAST(count(*) OVER w AS BIGINT) AS n_24h
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)""",

    // independent formulation (top-1 LATERAL per click, ties broken by
    // event_id DESC) of the engine's union+window as-of join
    "q26_asof_join" ->
      """WITH c AS (SELECT event_id, user_id, ts, value FROM events
                    WHERE event_type = 'click'),
            p AS (SELECT event_id, user_id, ts, value FROM events
                    WHERE event_type = 'purchase')
         SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us, c.value,
           m.event_id AS purchase_id,
           epoch_us(m.ts) AS purchase_ts_us,
           m.value AS purchase_value
         FROM c LEFT JOIN LATERAL (
           SELECT p.event_id, p.ts, p.value FROM p
           WHERE p.user_id = c.user_id AND p.ts <= c.ts
           ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) m ON true"""
  )
}
