package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Relational operator suite over the TPC-H-ish tables (SURVEY.md §2.4:
  * the operator categories the reference lacks, implemented so the
  * engine is a complete query surface — joins of every flavor, windows,
  * grouping sets, set ops, sorts/limits, scalar/date/string/JSON
  * functions).
  *
  * Hash-stability strategy (SURVEY.md §5.4): every floating-point SUM
  * goes through exact DECIMAL(28,10) aggregation on both engines — the
  * double→decimal cast of a deterministic IEEE value has no rounding
  * ties, decimal addition is associative, so Spark's partial aggregation
  * order cannot perturb the result and no rounding slop is needed.
  * Scale notes per query are in the Scaladoc of each entry.
  */
object Relational extends graft.QueryModule {

  /** Exact, order-insensitive sum of a double expression. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 10))).cast("double")
  // DuckDB's DECIMAL(38,10)→DOUBLE cast is not correctly rounded
  // (int128 → double → /1e10), while Spark's Decimal.toDouble is; route
  // the oracle's final cast through VARCHAR so both ends are the
  // correctly-rounded double of the same exact decimal.
  private val DSUM = "CAST(CAST(sum(CAST(%s AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)"
  private def ds(expr: String): String = DSUM.format(expr)

  /** Data-quality expectations sweep: one row per assertion with
    * violation and population counts — the "expectations" pattern
    * (null checks, referential integrity, key uniqueness, ranges) a
    * pipeline gates a load on. Each check is a single partial+final
    * aggregate (the orphan check an anti-join + aggregate), so the
    * whole sweep costs a handful of scans at any scale and ships as
    * one tiny summary frame.
    */
  def dqChecks(li: DataFrame, ord: DataFrame, cust: DataFrame): DataFrame = {
    def check(name: String, violations: DataFrame, checked: DataFrame): DataFrame =
      violations.crossJoin(checked).select(
        lit(name).as("check"), col("n_violations"), col("n_checked"))
    val nV = count(lit(1)).as("n_violations")
    Seq(
      check("1_orphan_lineitems",
        li.join(ord.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti").agg(nV),
        li.agg(count(lit(1)).as("n_checked"))),
      check("2_dup_order_keys",
        ord.groupBy("o_orderkey").agg(count(lit(1)).as("n"))
          .filter(col("n") > 1).agg(nV),
        ord.agg(count(lit(1)).as("n_checked"))),
      check("3_null_customer_name",
        cust.filter(col("c_name").isNull || col("c_name") === "").agg(nV),
        cust.agg(count(lit(1)).as("n_checked"))),
      check("4_qty_out_of_range",
        li.filter(col("l_quantity") < 1 || col("l_quantity") > 50).agg(nV),
        li.agg(count(lit(1)).as("n_checked"))),
      check("5_nonpositive_order_price",
        ord.filter(col("o_totalprice") <= 0).agg(nV),
        ord.agg(count(lit(1)).as("n_checked"))))
      .reduce(_ union _)
      .orderBy("check")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Shipping-priority join (TPC-H Q3 shape): the canonical 3-table
    // selective fact join — segment-filtered customers × date-filtered
    // orders × date-filtered lineitems, revenue per order, top 10.
    // Filters push to every scan; the filtered customer key set is small
    // and AQE broadcasts it, so only the orders⋈lineitem shuffle pays
    // at scale; top-10 is TakeOrderedAndProject (no global sort), with
    // a deterministic (revenue, date, key) tie-break.
    "q_shipping_priority" -> { (spark, dir) =>
      val cutoff = to_timestamp(lit("1997-01-01"))
      val c = Tables.customer(spark, dir)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = Tables.orders(spark, dir).filter(col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    },

    // Argmin join (TPC-H Q2 shape): per part, the supplier offering the
    // lowest price — a single min(struct(price, suppkey)) aggregate, so
    // ties break deterministically by suppkey and no window shuffle or
    // join-back is needed; then a per-supplier rollup joined to the
    // (broadcast) supplier dim. Two shuffles total at any scale.
    "q_cheapest_supplier" -> { (spark, dir) =>
      val cheapest = Tables.lineitem(spark, dir)
        .groupBy("l_partkey")
        .agg(min(struct(col("l_extendedprice"), col("l_suppkey"))).as("m"))
        .select(
          col("l_partkey"),
          col("m.l_extendedprice").as("min_price"),
          col("m.l_suppkey").as("suppkey"))
      cheapest
        .groupBy("suppkey")
        .agg(count(lit(1)).as("n_parts_cheapest"), dsum(col("min_price")).as("sum_min_price"))
        .join(broadcast(Tables.supplier(spark, dir)), col("suppkey") === col("s_suppkey"))
        .select("suppkey", "s_name", "n_parts_cheapest", "sum_min_price")
        .orderBy("suppkey")
    },

    // Generator + gap fill: a calendar spine from sequence()/explode
    // (no driver round-trip — the min/max span stays a one-row frame),
    // left-joined to per-day order counts, rolled up monthly. The spine
    // is generated data, so this also covers "rows from nothing"; at
    // scale the spine is tiny and broadcast to the daily aggregate.
    "q_date_spine" -> { (spark, dir) =>
      val o = Tables.orders(spark, dir)
      val spine = o.agg(min(col("o_orderdate")).as("d0"), max(col("o_orderdate")).as("d1"))
        .select(explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
      val daily = o.groupBy(col("o_orderdate").as("day"))
        .agg(count(lit(1)).as("n_orders"))
      spine.join(daily, Seq("day"), "left")
        .groupBy(date_trunc("month", col("day")).as("month"))
        .agg(
          count(lit(1)).as("n_days"),
          sum(when(col("n_orders").isNotNull, 1L).otherwise(0L)).as("active_days"),
          coalesce(sum(col("n_orders")), lit(0L)).as("n_orders"))
        .orderBy("month")
    },

    // Correlated LATERAL subquery: per high-balance customer, their top-2
    // orders by price — the lateral body re-evaluates per outer row
    // (logically); Catalyst decorrelates it into a ranked join, so the
    // physical plan is the same window-topn shape that scales.
    "q_lateral_topn" -> { (spark, dir) =>
      Tables.customer(spark, dir).createOrReplaceTempView("customer")
      Tables.orders(spark, dir).createOrReplaceTempView("orders")
      spark.sql(
        """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
          |FROM customer c,
          |LATERAL (
          |  SELECT o_orderkey, o_totalprice FROM orders o
          |  WHERE o.o_custkey = c.c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
          |WHERE c.c_acctbal > 9000
          |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin)
    },

    // Map-typed columns: per-customer order-status histogram as a real
    // MapType (entries sorted for determinism), read back with
    // try_element_at (ANSI mode: plain element_at throws on a missing
    // key), map_keys, and size. Maps live entirely inside the row —
    // no extra shuffle beyond the two aggregates.
    "q_map_fns" -> { (spark, dir) =>
      Tables.orders(spark, dir)
        .groupBy("o_custkey", "o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("o_custkey")
        .agg(map_from_entries(array_sort(collect_list(
          struct(col("o_orderstatus").as("k"), col("cnt").as("v"))))).as("m"))
        .select(
          col("o_custkey"),
          size(col("m")).as("n_statuses"),
          coalesce(try_element_at(col("m"), lit("F")), lit(0L)).as("n_finished"),
          coalesce(try_element_at(col("m"), lit("O")), lit(0L)).as("n_open"),
          concat_ws(",", map_keys(col("m"))).as("statuses"))
        .orderBy("o_custkey")
    },

    // PII-style redaction: digit masking, id extraction, title-casing,
    // and edit distance — the scrub pass a curation pipeline runs before
    // text leaves a trust boundary. All codegen'd scalar functions
    // riding the scan (note: Spark regexp_replace is global by default;
    // the DuckDB oracle needs the explicit 'g' flag).
    "q_redact" -> { (spark, dir) =>
      Tables.customer(spark, dir)
        .select(
          col("c_custkey"),
          regexp_replace(col("c_name"), lit("[0-9]"), lit("#")).as("masked_name"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).cast("bigint").as("cust_num"),
          initcap(lower(col("c_mktsegment"))).as("segment_title"),
          levenshtein(col("c_mktsegment"), lit("MACHINERY")).as("seg_dist"))
        .orderBy("c_custkey")
    },

    // Skew-salted join on the graded surface: result is identical to the
    // plain orders⋈customer (the oracle runs the plain form) — the salt
    // spreads each join key over 8 sub-keys with the dim replicated per
    // salt, the pre-planned mitigation for a hot key that would
    // overwhelm one reducer when AQE's runtime skew split is too late.
    "q_salted_agg" -> { (spark, dir) =>
      val dim = Tables.customer(spark, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      Skew.saltedJoin(Tables.orders(spark, dir), dim, "o_custkey", 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
        .orderBy("c_mktsegment")
    },

    // Date/time scalar-function coverage: extraction, truncation, date
    // arithmetic, month boundaries — all codegen'd built-ins riding the
    // scan, no shuffle.
    "q_datetime_fns" -> { (spark, dir) =>
      Tables.orders(spark, dir)
        .filter(col("o_orderkey") <= 2000)
        .select(
          col("o_orderkey"),
          col("o_orderdate"),
          year(col("o_orderdate")).cast("long").as("yr"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          month(col("o_orderdate")).cast("long").as("mon"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          // derived dates go out as timestamps: pandas reads parquet DATE
          // as object cells, which the harness hash can't match to the
          // oracle's datetime64 column
          date_add(col("o_orderdate"), 30).cast("timestamp").as("plus30"),
          trunc(col("o_orderdate"), "month").cast("timestamp").as("month_start"),
          last_day(col("o_orderdate")).cast("timestamp").as("month_end"),
          datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
            .cast("long").as("days_since_92"))
        .orderBy("o_orderkey")
    },

    // Wide → long reshape (the inverse of q_pivot): Dataset.unpivot
    // melts the measure columns into (measure, value) rows. Runs after
    // the aggregate, so it reshapes a tiny frame — free at any scale.
    "q_unpivot" -> { (spark, dir) =>
      Tables.lineitem(spark, dir)
        .groupBy("l_returnflag")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"))
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_base_price"), col("sum_disc_price")),
          "measure", "value")
        .orderBy("l_returnflag", "measure")
    },

    // ANSI-mode error handling: Spark 4 runs ANSI ON, so bad casts and
    // zero divides THROW by default — the try_* family returns NULL
    // instead, which is what a bulk pipeline over dirty data needs.
    "q_try_fns" -> { (spark, dir) =>
      Tables.documents(spark, dir)
        .select(
          col("doc_id"),
          col("source").try_cast("int").as("bad_cast"),
          substring(col("source"), 4, 10).try_cast("int").as("src_num"),
          try_divide(col("n_chars"), col("doc_id") % 5).as("ratio"))
        .orderBy("doc_id")
    },

    // TPC-H Q1 shape: scan-heavy agg with map-side partial aggregation;
    // the shipdate filter and 6-column projection push into the parquet
    // scan. At 100 TB this is one shuffle of 6 tiny groups.
    "q_pricing_summary" -> { (spark, dir) =>
      Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") <= lit("1999-01-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Global top-k: planned as TakeOrderedAndProject — no full sort.
    "q_top_orders" -> { (spark, dir) =>
      Tables.orders(spark, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(50)
    },

    // Fact-fact inner join; AQE picks broadcast at small SF, shuffled
    // hash at scale (both sides partitioned on the join key).
    "q_cust_order_join" -> { (spark, dir) =>
      Tables.customer(spark, dir)
        .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
        .orderBy("c_mktsegment", "o_orderstatus")
    },

    // Star join through three explicit broadcast dims (supplier, nation,
    // region are dimension tables at every scale) — a single stage of
    // BroadcastHashJoins over the lineitem scan, then one small agg.
    "q_region_revenue" -> { (spark, dir) =>
      Tables.lineitem(spark, dir)
        .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy("r_name", "n_name")
    },

    // Full-outer join of two independent daily aggregates — days with
    // signups but no purchases (and vice versa) survive with nulls.
    // Both sides pre-aggregate before the join, so the shuffle carries
    // one row per (day, side), not raw events.
    "q_full_outer" -> { (spark, dir) =>
      val ev = Tables.events(spark, dir)
      def daily(kind: String, n: String) = ev
        .filter(col("event_type") === kind)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as(n))
      daily("signup", "n_signups")
        .join(daily("purchase", "n_purchases"), Seq("day"), "full_outer")
        .select(
          col("day").cast("timestamp").as("day"),
          coalesce(col("n_signups"), lit(0L)).as("n_signups"),
          coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
        .orderBy("day")
    },

    // Left-semi join (EXISTS): customers with at least one finished order.
    "q_semi_join" -> { (spark, dir) =>
      val f = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
      Tables.customer(spark, dir)
        .join(f, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // Left-anti join (NOT EXISTS): dormant customers — no order since
    // 2000-01-01. The build side is date-filtered so the result is
    // non-empty at every test scale factor (14/135/1355 rows at
    // sf0.001/0.01/0.1); an unfiltered build side matches every
    // customer and the oracle would only ever hash an empty set.
    // The filter lands below the join, shrinking the build side
    // before the shuffle.
    "q_anti_join" -> { (spark, dir) =>
      val recent = Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("date"))
      Tables.customer(spark, dir)
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    },

    // RANGE-frame window (value-based, not row-based): per-customer
    // 90-day moving spend. RANGE handles sparse order dates correctly —
    // a ROWS frame would silently span arbitrary time gaps. State per
    // key is bounded by the frame width, so this scales like any
    // per-key window.
    "q_moving_revenue" -> { (spark, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy("day_num").rangeBetween(-89, 0)
      Tables.orders(spark, dir)
        .filter(col("o_custkey") < 50)
        .withColumn("day_num",
          datediff(col("o_orderdate"), lit("1992-01-01").cast("date")).cast("long"))
        .withColumn("spend_90d",
          sum(col("o_totalprice").cast(DecimalType(28, 10))).over(w).cast("double"))
        .select("o_custkey", "day_num", "o_orderkey", "spend_90d")
        .orderBy("o_custkey", "day_num", "o_orderkey")
    },

    // Ranked window with a unique tie-break (orderkey) so row_number is
    // deterministic; WindowGroupLimit pushes the rn<=3 filter down.
    "q_window_topn" -> { (spark, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(spark, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    },

    // Running-sum window; decimal accumulator so frame-order addition is
    // exact on both engines.
    "q_running_sum" -> { (spark, dir) =>
      val w = Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(spark, dir)
        .filter(col("l_suppkey") <= 3)
        .withColumn("running_qty", sum(col("l_quantity").cast(DecimalType(28, 10))).over(w).cast("double"))
        .select("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber", "l_quantity", "running_qty")
        .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber")
    },

    // Set operations: INTERSECT / EXCEPT / UNION(distinct) as one result.
    "q_set_ops" -> { (spark, dir) =>
      val li = Tables.lineitem(spark, dir).select(col("l_partkey").as("k"))
      val p  = Tables.part(spark, dir).select(col("p_partkey").as("k"))
      val i = li.intersect(p).agg(count(lit(1)).as("n")).select(lit("intersect").as("op"), col("n"))
      val e = p.except(li).agg(count(lit(1)).as("n")).select(lit("except").as("op"), col("n"))
      val u = li.union(p).distinct().agg(count(lit(1)).as("n")).select(lit("union").as("op"), col("n"))
      i.union(e).union(u).orderBy("op")
    },

    // ROLLUP with null markers coalesced to 'ALL' so null-ordering
    // differences between engines can't reorder rows.
    "q_rollup" -> { (spark, dir) =>
      Tables.lineitem(spark, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("sum_qty"))
        .orderBy("returnflag", "linestatus")
    },

    // CUBE over order status × priority.
    "q_cube" -> { (spark, dir) =>
      Tables.orders(spark, dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("orderstatus"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("orderpriority"),
          col("n"), col("total"))
        .orderBy("orderstatus", "orderpriority")
    },

    // GROUPING SETS: two independent one-dimension aggregates in one
    // pass over the fact table.
    "q_grouping_sets" -> { (spark, dir) =>
      Tables.orders(spark, dir)
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("orderstatus"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("orderpriority"),
          col("n"), col("total"))
        .orderBy("orderstatus", "orderpriority")
    },

    // Window-function variety: lag/lead, ntile, percent_rank, cume_dist
    // over a fully-ordered per-customer frame.
    "q_window_variety" -> { (spark, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
      Tables.orders(spark, dir)
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Date bucketing: monthly revenue. year/month prune to two ints.
    "q_monthly_revenue" -> { (spark, dir) =>
      Tables.lineitem(spark, dir)
        .groupBy(
          year(col("l_shipdate")).as("yr"),
          month(col("l_shipdate")).as("mo"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("yr", "mo")
    },

    // String function coverage: upper/lower/length/substr/concat/replace.
    "q_string_fns" -> { (spark, dir) =>
      Tables.part(spark, dir)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          length(col("p_name")).as("name_len"),
          substring(col("p_type"), 1, 6).as("type_prefix"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
          regexp_replace(lower(col("p_name")), lit(" "), lit("_")).as("slug"))
        .orderBy("p_partkey")
    },

    // CASE/WHEN bucketing + min/max (exact: no arithmetic on doubles).
    "q_case_buckets" -> { (spark, dir) =>
      Tables.orders(spark, dir)
        .withColumn("bucket",
          when(col("o_totalprice") < 50000, "low")
            .when(col("o_totalprice") < 150000, "mid")
            .otherwise("high"))
        .groupBy("bucket")
        .agg(
          count(lit(1)).as("n"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
        .orderBy("bucket")
    },

    // JSON extraction from events.props (get_json_object ≅ DuckDB
    // json_extract_string) + exact int aggregation.
    "q_json_events" -> { (spark, dir) =>
      Tables.events(spark, dir)
        .select(
          col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"),
          col("value"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).cast("long").as("sum_k"),
          dsum(col("value")).as("sum_value"))
        .orderBy("event_type")
    },

    // Scalar subquery: customers above the global average balance (the
    // average is computed exactly via decimal sum on both engines).
    "q_above_avg_customers" -> { (spark, dir) =>
      val c = Tables.customer(spark, dir)
      val avgBal = c.agg((dsum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
      c.crossJoin(avgBal)
        .filter(col("c_acctbal") > col("avg_bal"))
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    },

    // Data-quality expectations sweep over the TPC-H core tables.
    "q_dq_checks" -> { (spark, dir) =>
      dqChecks(Tables.lineitem(spark, dir), Tables.orders(spark, dir),
        Tables.customer(spark, dir))
    },

    // Distinct aggregation: exact count(distinct) per group.
    "q_distinct_counts" -> { (spark, dir) =>
      Tables.orders(spark, dir)
        .groupBy("o_orderstatus")
        .agg(
          countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus")
    },

    // Exact interpolated percentiles per group (Spark `percentile` ≅
    // DuckDB `quantile_cont`: both sort and linearly interpolate).
    "q_percentiles" -> { (spark, dir) =>
      Tables.lineitem(spark, dir)
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 9).as("median_qty"),
          round(expr("percentile(l_quantity, 0.9)"), 9).as("p90_qty"),
          round(expr("percentile(l_extendedprice, 0.5)"), 9).as("median_price"))
        .orderBy("l_returnflag")
    },

    // Approx mode for extreme-scale quantiles: the GK sketch behind
    // percentile_approx holds O(accuracy) state per group where exact
    // percentile buffers the whole group. Sketch internals are
    // engine-specific, so — like q_approx_distinct — the query EMITS
    // THE BOUNDS CHECK: exact p45/p50/p55 per group (cross-engine
    // checkable) plus a boolean asserting the sketch median landed
    // inside the [p45, p55] value window (rank error n/accuracy = 0.01%
    // of the group, so a 5-percentile-point window is an enormous,
    // deterministic-given-the-data margin). The oracle recomputes the
    // exact quantiles and asserts the boolean TRUE.
    "q_approx_quantile" -> { (spark, dir) =>
      Tables.lineitem(spark, dir)
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.45)"), 9).as("p45_qty"),
          round(expr("percentile(l_quantity, 0.5)"), 9).as("median_qty"),
          round(expr("percentile(l_quantity, 0.55)"), 9).as("p55_qty"),
          percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("am"))
        .select(
          col("l_returnflag"), col("p45_qty"), col("median_qty"), col("p55_qty"),
          (col("am") >= col("p45_qty") && col("am") <= col("p55_qty"))
            .as("approx_median_within_bound"))
        .orderBy("l_returnflag")
    },

    // Statistical aggregates built from exact decimal sums so partition
    // order cannot perturb them (built-in stddev/corr stream doubles in
    // shuffle order — not reproducible across engines or cluster sizes).
    "q_stats_agg" -> { (spark, dir) =>
      val n   = count(lit(1)).cast("double")
      val sx  = dsum(col("l_quantity"))
      val sx2 = dsum(col("l_quantity") * col("l_quantity"))
      val sy  = dsum(col("l_extendedprice"))
      val sy2 = dsum(col("l_extendedprice") * col("l_extendedprice"))
      val sxy = dsum(col("l_quantity") * col("l_extendedprice"))
      Tables.lineitem(spark, dir)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          (sx / n).as("mean_qty"),
          ((sx2 - sx * sx / n) / (n - lit(1.0))).as("var_qty"),
          sqrt((sx2 - sx * sx / n) / (n - lit(1.0))).as("stddev_qty"),
          ((n * sxy - sx * sy) /
            sqrt((n * sx2 - sx * sx) * (n * sy2 - sy * sy))).as("corr_qty_price"))
        .orderBy("l_returnflag")
    },

    // Correlated EXISTS with a pushed predicate: orders having any
    // high-quantity line item (semi join on the filtered fact).
    // Approx mode for extreme scale: HyperLogLog distinct counts (~5%
    // default rsd, constant memory). HLL register contents are
    // engine-specific, so the raw estimates can't be hash-compared —
    // instead the query EMITS THE BOUNDS CHECK: exact counts (cross-
    // engine checkable) plus a boolean per column asserting the HLL
    // estimate landed within 4×rsd of the exact count (rsd is one
    // standard deviation; 4σ is a deterministic-given-the-data margin
    // the sketch clears with overwhelming room). The oracle computes
    // the same exact counts and asserts the booleans TRUE, so an HLL
    // regression flips a boolean and fails the hash gate — r5 verdict
    // item #3's "turn the one no_oracle row into a real check".
    "q_approx_distinct" -> { (spark, dir) =>
      Tables.lineitem(spark, dir)
        .agg(
          approx_count_distinct(col("l_partkey")).as("a_parts"),
          approx_count_distinct(col("l_suppkey")).as("a_supps"),
          approx_count_distinct(col("l_orderkey"), 0.01).as("a_orders"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          countDistinct(col("l_suppkey")).as("exact_supps"),
          countDistinct(col("l_orderkey")).as("exact_orders"))
        .select(
          col("exact_parts"), col("exact_supps"), col("exact_orders"),
          (abs(col("a_parts") - col("exact_parts"))
            <= lit(4 * 0.05) * col("exact_parts")).as("parts_within_bound"),
          (abs(col("a_supps") - col("exact_supps"))
            <= lit(4 * 0.05) * col("exact_supps")).as("supps_within_bound"),
          (abs(col("a_orders") - col("exact_orders"))
            <= lit(4 * 0.01) * col("exact_orders")).as("orders_within_bound"))
    },

    "q_orders_with_bulk_items" -> { (spark, dir) =>
      val bulky = Tables.lineitem(spark, dir).filter(col("l_quantity") >= 49)
      Tables.orders(spark, dir)
        .join(bulky, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("o_orderstatus")
    },

    // Sketch MERGEABILITY — the property that makes sketches the
    // incremental-statistics answer at 100 TB: per-shard HLL sketches
    // built independently (one pass each, the way per-day or per-file
    // stats jobs actually run), then hll_union_agg combines them
    // WITHOUT rescanning anything, and the merged estimate must still
    // land within the sketch's error bound of the exact global count.
    // Bounds-check oracle (the q_approx_distinct convention): DuckDB
    // can't rebuild Spark's Datasketches registers, so the query
    // emits exact counts + a boolean the oracle asserts TRUE — a
    // merge regression flips the boolean and fails the hash.
    "q_hll_merge" -> { (spark, dir) =>
      val li = Tables.lineitem(spark, dir)
      val shards = li
        .withColumn("shard", col("l_orderkey") % 16)
        .groupBy("shard")
        .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      val merged = shards.agg(
        count(lit(1)).as("n_shards"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      merged.crossJoin(broadcast(
          li.agg(countDistinct(col("l_partkey")).as("exact_parts"))))
        .select(col("n_shards"), col("exact_parts"),
          // default lgConfigK=12 → rsd ≈ 1.04/√4096 ≈ 1.6%; 4σ margin
          (abs(col("est") - col("exact_parts"))
            <= lit(4 * 0.017) * col("exact_parts")).as("merge_within_bound"))
    },

    // Mergeable QUANTILE sketch — q_hll_merge's sibling for order
    // statistics: per-shard fixed-grid histograms (one pass each, the
    // per-day stats-job shape), merged by a bucket-keyed SUM with no
    // rescan, quantiles read off the merged cumulative curve. The
    // grid bounds every estimate's error by one bucket width BY
    // CONSTRUCTION, and unlike GK/KLL the whole sketch is
    // deterministic integer counts over deterministic bucket edges —
    // so the oracle re-derives the sketch AND the bound check exactly
    // (a full hash gate where q_approx_quantile's GK needs a
    // bounds-only one). At 100 TB the min/max pass is replaced by the
    // column's known domain or footer stats; the histogram is
    // B·shards integers, broadcastable at any corpus size.
    "q_quantile_sketch_merge" -> { (spark, dir) =>
      quantileSketchMerge(Tables.lineitem(spark, dir))
    },
  )

  /** The q_quantile_sketch_merge pipeline as a library entry point
    * (ScaleProbe times it on replicated lineitem): per-shard 256-grid
    * histograms over l_extendedprice, bucket-keyed merge, quantile
    * read-off with the construction-bounded grid error, exact
    * percentiles beside for the bound check.
    */
  def quantileSketchMerge(lineitem: DataFrame): DataFrame = {
      val buckets = 256
      val li = lineitem
        .select(col("l_orderkey"), col("l_extendedprice").cast("double").as("x"))
      val mm = li.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      // degenerate-domain guard (r9 ADVICE): a constant column makes
      // hi == lo and the raw width 0 → NaN buckets, which Spark's
      // least() and DuckDB's CAST(floor(...)) disagree on. The guard
      // fires ONLY on exact double equality hi == lo (any hi > lo has
      // hi − lo ≥ one ulp, so the division is finite — NaN is
      // impossible) and substitutes width 1.0, putting every row in
      // bucket 0 identically in both engines. Non-degenerate domains
      // use the raw width UNTOUCHED — a magnitude-relative ε floor
      // here would silently override the true width for large-offset
      // narrow-range columns (|hi| ≈ 1e12, range ≈ 100 → ε ≈ 1e3 ≫
      // width) and collapse the sketch; declared hashes are unaffected
      // by construction.
      def gwidth(lo: Column, hi: Column) =
        when(hi === lo, lit(1.0))
          .otherwise((hi - lo) / lit(buckets.toDouble))
      val sk = li.withColumn("shard", col("l_orderkey") % 16)
        .crossJoin(broadcast(mm))
        .withColumn("bucket", least(lit(buckets - 1),
          floor((col("x") - col("lo")) /
            gwidth(col("lo"), col("hi"))).cast("int")))
        .groupBy("shard", "bucket").agg(count(lit(1)).as("cnt"))
      // the MERGE: bucket-keyed sum over shard sketches, nothing rescanned
      val merged = sk.groupBy("bucket").agg(sum(col("cnt")).as("cnt"))
      import org.apache.spark.sql.expressions.Window
      val cum = merged
        .withColumn("cum", sum(col("cnt")).over(
          Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)))
      val picks = cum
        .crossJoin(broadcast(merged.agg(sum(col("cnt")).as("n_rows"))))
        .agg(
          max(col("n_rows")).as("n_rows"),
          min(when(col("cum") >= lit(0.5) * col("n_rows"), col("bucket"))).as("b50"),
          min(when(col("cum") >= lit(0.9) * col("n_rows"), col("bucket"))).as("b90"),
          min(when(col("cum") >= lit(0.99) * col("n_rows"), col("bucket"))).as("b99"))
      val exact = li.agg(
        expr("percentile(x, 0.5)").as("exact_p50"),
        expr("percentile(x, 0.9)").as("exact_p90"),
        expr("percentile(x, 0.99)").as("exact_p99"))
      def est(b: Column) =
        col("lo") + (b.cast("double") + lit(1.0)) *
          gwidth(col("lo"), col("hi"))
      // 1 ppm relative slack on the bound check: est − exact can land
      // one ulp above the width when the subtraction rounds up (and in
      // the degenerate case equals the width exactly); the slack can
      // only keep a true bound true, never flip one false
      val width = gwidth(col("lo"), col("hi")) * lit(1.0 + 1e-6)
      picks.crossJoin(broadcast(mm)).crossJoin(broadcast(exact))
        .select(
          lit(16).as("n_shards"), col("n_rows"),
          est(col("b50")).as("p50_est"),
          est(col("b90")).as("p90_est"),
          est(col("b99")).as("p99_est"),
          round(col("exact_p50"), 9).as("exact_p50"),
          round(col("exact_p90"), 9).as("exact_p90"),
          round(col("exact_p99"), 9).as("exact_p99"),
          (abs(est(col("b50")) - col("exact_p50")) <= width).as("p50_within_grid"),
          (abs(est(col("b90")) - col("exact_p90")) <= width).as("p90_within_grid"),
          (abs(est(col("b99")) - col("exact_p99")) <= width).as("p99_within_grid"))
  }

  def oracleSql: Map[String, String] = Map(
    "q_shipping_priority" ->
      s"""SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
         |  ${ds("l.l_extendedprice * (1.0 - l.l_discount)")} AS revenue
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |WHERE c.c_mktsegment = 'BUILDING'
         |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
         |  AND l.l_shipdate > TIMESTAMP '1997-01-01'
         |GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
         |ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
         |LIMIT 10""".stripMargin,
    "q_redact" ->
      """SELECT c_custkey,
        |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked_name,
        |  CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS cust_num,
        |  upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2)) AS segment_title,
        |  CAST(levenshtein(c_mktsegment, 'MACHINERY') AS INT) AS seg_dist
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_cheapest_supplier" ->
      s"""WITH ranked AS (
         |  SELECT l_partkey, l_extendedprice, l_suppkey,
         |    row_number() OVER (PARTITION BY l_partkey
         |      ORDER BY l_extendedprice, l_suppkey) AS rn
         |  FROM lineitem),
         |cheapest AS (
         |  SELECT l_partkey, l_extendedprice AS min_price, l_suppkey AS suppkey
         |  FROM ranked WHERE rn = 1)
         |SELECT c.suppkey, s.s_name, count(*) AS n_parts_cheapest,
         |  ${ds("c.min_price")} AS sum_min_price
         |FROM cheapest c JOIN supplier s ON c.suppkey = s.s_suppkey
         |GROUP BY c.suppkey, s.s_name ORDER BY c.suppkey""".stripMargin,
    "q_date_spine" ->
      """WITH span AS (SELECT min(o_orderdate) AS d0, max(o_orderdate) AS d1 FROM orders),
        |spine AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM span),
        |daily AS (SELECT o_orderdate AS day, count(*) AS n_orders FROM orders GROUP BY 1)
        |SELECT date_trunc('month', s.day) AS month, count(*) AS n_days,
        |  CAST(sum(CASE WHEN d.n_orders IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS active_days,
        |  CAST(coalesce(sum(d.n_orders), 0) AS BIGINT) AS n_orders
        |FROM spine s LEFT JOIN daily d ON s.day = d.day
        |GROUP BY date_trunc('month', s.day) ORDER BY month""".stripMargin,
    "q_lateral_topn" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |WHERE c.c_acctbal > 9000
        |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin,
    "q_map_fns" ->
      """SELECT o_custkey,
        |  CAST(count(DISTINCT o_orderstatus) AS INT) AS n_statuses,
        |  CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS n_finished,
        |  CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS n_open,
        |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q_try_fns" ->
      """SELECT doc_id,
        |  TRY_CAST(source AS INT) AS bad_cast,
        |  TRY_CAST(substr(source, 4, 10) AS INT) AS src_num,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL
        |       ELSE CAST(n_chars AS DOUBLE) / (doc_id % 5) END AS ratio
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_moving_revenue" ->
      """SELECT o_custkey,
        |  CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT) AS day_num,
        |  o_orderkey,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(28,10))) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY (CAST(o_orderdate AS DATE) - DATE '1992-01-01')
        |    RANGE BETWEEN 89 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS spend_90d
        |FROM orders WHERE o_custkey < 50
        |ORDER BY o_custkey, day_num, o_orderkey""".stripMargin,

    "q_full_outer" ->
      """WITH s AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS n_signups
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |p AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS n_purchases
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT CAST(COALESCE(s.day, p.day) AS TIMESTAMP) AS day,
        |  COALESCE(n_signups, 0) AS n_signups,
        |  COALESCE(n_purchases, 0) AS n_purchases
        |FROM s FULL OUTER JOIN p ON s.day = p.day
        |ORDER BY day""".stripMargin,

    // UNION ALL melt — deterministic portable form of UNPIVOT
    "q_unpivot" ->
      s"""WITH wide AS (
         |  SELECT l_returnflag,
         |    ${ds("l_quantity")} AS sum_qty,
         |    ${ds("l_extendedprice")} AS sum_base_price,
         |    ${ds("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
         |UNION ALL
         |SELECT l_returnflag, 'sum_base_price', sum_base_price FROM wide
         |UNION ALL
         |SELECT l_returnflag, 'sum_disc_price', sum_disc_price FROM wide
         |ORDER BY l_returnflag, measure""".stripMargin,

    // plain form — the salt must be semantically invisible
    "q_salted_agg" ->
      s"""SELECT c_mktsegment, count(*) AS n_orders,
         |  ${ds("o_totalprice")} AS total_price
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_datetime_fns" ->
      """SELECT o_orderkey, o_orderdate,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mon,
        |  CAST(day(o_orderdate) AS BIGINT) AS dom,
        |  CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS plus30,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
        |  CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT) AS days_since_92
        |FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin,
    "q_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${ds("l_quantity")} AS sum_qty,
         |  ${ds("l_extendedprice")} AS sum_base_price,
         |  ${ds("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${ds("l_quantity")} / count(*) AS avg_qty,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-01-01'
         |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin,
    "q_cust_order_join" ->
      s"""SELECT c_mktsegment, o_orderstatus, count(*) AS n_orders,
         |  ${ds("o_totalprice")} AS total_price
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_mktsegment, o_orderstatus ORDER BY c_mktsegment, o_orderstatus""".stripMargin,
    "q_region_revenue" ->
      s"""SELECT r_name, n_name, ${ds("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= DATE '2000-01-01')
        |ORDER BY c_custkey""".stripMargin,
    "q_window_topn" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_running_sum" ->
      """SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_quantity,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) OVER (
        |    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_qty
        |FROM lineitem WHERE l_suppkey <= 3
        |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin,
    "q_set_ops" ->
      """WITH i AS (SELECT l_partkey AS k FROM lineitem INTERSECT SELECT p_partkey FROM part),
        |     e AS (SELECT p_partkey AS k FROM part EXCEPT SELECT l_partkey FROM lineitem),
        |     u AS (SELECT l_partkey AS k FROM lineitem UNION SELECT p_partkey FROM part)
        |SELECT 'intersect' AS op, count(*) AS n FROM i
        |UNION ALL SELECT 'except', count(*) FROM e
        |UNION ALL SELECT 'union', count(*) FROM u
        |ORDER BY op""".stripMargin,
    "q_rollup" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
         |  coalesce(l_linestatus, 'ALL') AS linestatus,
         |  count(*) AS n, ${ds("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY returnflag, linestatus""".stripMargin,
    "q_cube" ->
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
         |  coalesce(o_orderpriority, 'ALL') AS orderpriority,
         |  count(*) AS n, ${ds("o_totalprice")} AS total
         |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         |ORDER BY orderstatus, orderpriority""".stripMargin,
    "q_grouping_sets" ->
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
         |  coalesce(o_orderpriority, 'ALL') AS orderpriority,
         |  count(*) AS n, ${ds("o_totalprice")} AS total
         |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
         |ORDER BY orderstatus, orderpriority""".stripMargin,
    "q_window_variety" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_monthly_revenue" ->
      s"""SELECT CAST(extract(year FROM l_shipdate) AS INT) AS yr,
         |  CAST(extract(month FROM l_shipdate) AS INT) AS mo,
         |  ${ds("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  count(*) AS n_items
         |FROM lineitem GROUP BY yr, mo ORDER BY yr, mo""".stripMargin,
    "q_string_fns" ->
      """SELECT p_partkey, upper(p_name) AS uname, CAST(length(p_name) AS INT) AS name_len,
        |  substr(p_type, 1, 6) AS type_prefix,
        |  p_brand || ':' || p_type AS brand_type,
        |  replace(lower(p_name), ' ', '_') AS slug
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_case_buckets" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
        |            WHEN o_totalprice < 150000 THEN 'mid'
        |            ELSE 'high' END AS bucket,
        |  count(*) AS n, min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_json_events" ->
      s"""SELECT event_type, count(*) AS n,
         |  CAST(sum(CAST(json_extract_string(props, '$$.k') AS INT)) AS BIGINT) AS sum_k,
         |  ${ds("value")} AS sum_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_above_avg_customers" ->
      s"""SELECT c_custkey, c_name, c_acctbal FROM customer
         |WHERE c_acctbal > (SELECT ${ds("c_acctbal")} / count(*) FROM customer)
         |ORDER BY c_custkey""".stripMargin,
    "q_dq_checks" ->
      """SELECT '1_orphan_lineitems' AS check,
        |  (SELECT count(*) FROM lineitem l
        |   WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |    AS n_violations,
        |  (SELECT count(*) FROM lineitem) AS n_checked
        |UNION ALL SELECT '2_dup_order_keys',
        |  (SELECT count(*) FROM (
        |     SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)),
        |  (SELECT count(*) FROM orders)
        |UNION ALL SELECT '3_null_customer_name',
        |  (SELECT count(*) FROM customer WHERE c_name IS NULL OR c_name = ''),
        |  (SELECT count(*) FROM customer)
        |UNION ALL SELECT '4_qty_out_of_range',
        |  (SELECT count(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50),
        |  (SELECT count(*) FROM lineitem)
        |UNION ALL SELECT '5_nonpositive_order_price',
        |  (SELECT count(*) FROM orders WHERE o_totalprice <= 0),
        |  (SELECT count(*) FROM orders)
        |ORDER BY "check"""".stripMargin,
    "q_distinct_counts" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers, count(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // The exact counts are recomputed independently; the booleans are
    // the EXPECTATION the Spark side must meet — DuckDB can't rebuild
    // Spark's HLL registers, so "estimate within 4×rsd of exact" is the
    // strongest cross-engine check possible, and a drifting estimate
    // flips a Spark-side boolean into a hash mismatch.
    "q_approx_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS exact_parts,
        |  count(DISTINCT l_suppkey) AS exact_supps,
        |  count(DISTINCT l_orderkey) AS exact_orders,
        |  TRUE AS parts_within_bound,
        |  TRUE AS supps_within_bound,
        |  TRUE AS orders_within_bound
        |FROM lineitem""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 9) AS median_qty,
        |  round(quantile_cont(l_quantity, 0.9), 9) AS p90_qty,
        |  round(quantile_cont(l_extendedprice, 0.5), 9) AS median_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // the grid sketch is deterministic end-to-end, so unlike the GK /
    // HLL rows the oracle re-derives sketch, merge, AND bound checks
    // exactly — a full hash gate over a mergeable-sketch pipeline
    "q_quantile_sketch_merge" -> {
      // CASE WHEN hi = lo mirrors the Spark side's degenerate-domain
      // guard exactly — see quantileSketchMerge (the raw width is
      // untouched whenever hi > lo)
      val w = "(CASE WHEN mm.hi = mm.lo THEN 1.0 ELSE (mm.hi - mm.lo) / 256.0 END)"
      def estSql(b: String) = s"mm.lo + ($b + 1.0) * $w"
      s"""WITH li AS (
         |  SELECT l_orderkey, CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem),
         |mm AS (SELECT min(x) AS lo, max(x) AS hi FROM li),
         |sk AS (
         |  SELECT l_orderkey % 16 AS shard,
         |    least(255, CAST(floor((x - mm.lo) / $w) AS INT)) AS bucket,
         |    count(*) AS cnt
         |  FROM li CROSS JOIN mm GROUP BY 1, 2),
         |merged AS (
         |  SELECT bucket, CAST(sum(cnt) AS BIGINT) AS cnt FROM sk GROUP BY bucket),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows FROM merged),
         |cum AS (
         |  SELECT bucket, CAST(sum(cnt) OVER (ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM merged),
         |picks AS (
         |  SELECT (SELECT n_rows FROM tot) AS n_rows,
         |    min(CASE WHEN cum >= 0.5 * (SELECT n_rows FROM tot)
         |      THEN bucket END) AS b50,
         |    min(CASE WHEN cum >= 0.9 * (SELECT n_rows FROM tot)
         |      THEN bucket END) AS b90,
         |    min(CASE WHEN cum >= 0.99 * (SELECT n_rows FROM tot)
         |      THEN bucket END) AS b99
         |  FROM cum),
         |ex AS (
         |  SELECT quantile_cont(x, 0.5) AS e50, quantile_cont(x, 0.9) AS e90,
         |    quantile_cont(x, 0.99) AS e99
         |  FROM li)
         |SELECT CAST(16 AS INT) AS n_shards, p.n_rows,
         |  ${estSql("p.b50")} AS p50_est,
         |  ${estSql("p.b90")} AS p90_est,
         |  ${estSql("p.b99")} AS p99_est,
         |  round(ex.e50, 9) AS exact_p50,
         |  round(ex.e90, 9) AS exact_p90,
         |  round(ex.e99, 9) AS exact_p99,
         |  abs(${estSql("p.b50")} - ex.e50) <= $w * (1.0 + 1e-6) AS p50_within_grid,
         |  abs(${estSql("p.b90")} - ex.e90) <= $w * (1.0 + 1e-6) AS p90_within_grid,
         |  abs(${estSql("p.b99")} - ex.e99) <= $w * (1.0 + 1e-6) AS p99_within_grid
         |FROM picks p CROSS JOIN mm CROSS JOIN ex""".stripMargin
    },
    // shard count is data-dependent (distinct l_orderkey % 16), exact
    // count cross-engine, the merge bound a Spark-side boolean
    "q_hll_merge" ->
      """SELECT
        |  (SELECT count(DISTINCT l_orderkey % 16) FROM lineitem) AS n_shards,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS merge_within_bound
        |FROM lineitem""".stripMargin,
    // exact quantiles recomputed; the boolean is the expectation the
    // Spark-side GK sketch must meet (same pattern as q_approx_distinct)
    "q_approx_quantile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.45), 9) AS p45_qty,
        |  round(quantile_cont(l_quantity, 0.5), 9) AS median_qty,
        |  round(quantile_cont(l_quantity, 0.55), 9) AS p55_qty,
        |  TRUE AS approx_median_within_bound
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_stats_agg" -> {
      val n = "CAST(count(*) AS DOUBLE)"
      val sx = ds("l_quantity"); val sx2 = ds("l_quantity * l_quantity")
      val sy = ds("l_extendedprice"); val sy2 = ds("l_extendedprice * l_extendedprice")
      val sxy = ds("l_quantity * l_extendedprice")
      s"""SELECT l_returnflag, count(*) AS n,
         |  $sx / $n AS mean_qty,
         |  ($sx2 - $sx * $sx / $n) / ($n - 1.0) AS var_qty,
         |  sqrt(($sx2 - $sx * $sx / $n) / ($n - 1.0)) AS stddev_qty,
         |  ($n * $sxy - $sx * $sy) /
         |    sqrt(($n * $sx2 - $sx * $sx) * ($n * $sy2 - $sy * $sy)) AS corr_qty_price
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    },
    "q_orders_with_bulk_items" ->
      s"""SELECT o_orderstatus, count(*) AS n, ${ds("o_totalprice")} AS total
         |FROM orders
         |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
  )
}
