package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Data profiling — the audit a pipeline runs before pointing a
  * training job at a corpus: per-column row/null/distinct counts and
  * min/max, as rows (one per column) so downstream checks are data,
  * not schema.
  *
  * Scale shape: ONE scan. All per-column aggregates land in a single
  * `agg` (Spark plans the multi-column COUNT(DISTINCT) set through one
  * Expand — still one pass over the data), producing a single wide
  * row that `stack` pivots into per-column rows driver-free. Profiling
  * N columns costs one table read, not N.
  *
  * At extreme cardinality swap `countDistinct` for
  * [[graft.functions.HllSketch.hll_distinct]] — same query shape, the
  * Expand disappears, and the shuffle carries sketches instead of
  * keys (the exact spelling here is what the oracle can check).
  */
object ProfileQueries {

  /** Per-column profile of `cols`: (column, n, n_null, n_distinct,
    * min_val, max_val) with min/max rendered as strings so mixed-type
    * columns share one output schema. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        count(when(col(c).isNull, lit(1))).as(s"${c}__null"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `${c}__n`, `${c}__null`, `${c}__distinct`, `${c}__min`, `${c}__max`"
    }.mkString(", ")
    wide.selectExpr(
      s"stack(${cols.length}, $stackArgs) AS " +
        "(column_name, n, n_null, n_distinct, min_val, max_val)")
      .orderBy("column_name")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p7_profile_documents" -> { (s, d) =>
      profile(Tables.load(s, d, "documents"),
        Seq("doc_id", "lang", "source", "n_chars"))
    },

    // ── dq1: cross-table constraint report — the validation gate a
    // pipeline runs before trusting a snapshot: referential integrity
    // (LEFT-join null probes, so the FK check is one equi-join, never
    // a per-row subquery), key uniqueness (count vs distinct), domain
    // ranges, and a stored-vs-derived consistency probe. One row per
    // check so downstream alerting consumes data, not logs. Each check
    // is a single scan + agg; the dimension side of the FK probes
    // broadcasts. At 100 TB the big-big FK probe (lineitem→orders) is
    // the standard shuffled equi-join — nothing quadratic anywhere.
    "dq1_constraint_report" -> { (s, d) =>
      def checked(name: String, df: DataFrame, violation: Column): DataFrame =
        df.agg(count(lit(1)).as("n_checked"),
            count(when(violation, lit(1))).as("n_violations"))
          .select(lit(name).as("check_name"), col("n_checked"), col("n_violations"))
      val customer = Tables.load(s, d, "customer")
      val orders = Tables.load(s, d, "orders")
      val lineitem = Tables.load(s, d, "lineitem")
      val fkOrders = checked("fk_orders_custkey",
        orders.join(broadcast(customer.select(col("c_custkey"))),
          col("o_custkey") === col("c_custkey"), "left"),
        col("c_custkey").isNull)
      val fkLineitem = checked("fk_lineitem_orderkey",
        lineitem.join(orders.select(col("o_orderkey").as("ref_okey")),
          col("l_orderkey") === col("ref_okey"), "left"),
        col("ref_okey").isNull)
      val uniqCust = customer
        .agg(count(lit(1)).as("n_checked"),
          (count(lit(1)) - countDistinct(col("c_custkey"))).as("n_violations"))
        .select(lit("unique_customer_key").as("check_name"),
          col("n_checked"), col("n_violations"))
      val uniqOrder = orders
        .agg(count(lit(1)).as("n_checked"),
          (count(lit(1)) - countDistinct(col("o_orderkey"))).as("n_violations"))
        .select(lit("unique_order_key").as("check_name"),
          col("n_checked"), col("n_violations"))
      val rangeQty = checked("range_lineitem_qty", lineitem,
        col("l_quantity").isNull || col("l_quantity") < 1 || col("l_quantity") > 50)
      val nonnegValue = checked("nonneg_events_value", Tables.events(s, d),
        col("value").isNull || col("value") < 0)
      val docChars = checked("consistent_doc_nchars", Tables.load(s, d, "documents"),
        col("n_chars") =!= length(col("text")))
      Seq(fkOrders, fkLineitem, uniqCust, uniqOrder, rangeQty, nonnegValue, docChars)
        .reduce(_ unionByName _)
        .withColumn("status",
          when(col("n_violations") === 0, "PASS").otherwise("FAIL"))
        .orderBy("check_name")
    },

    // ── dq2: robust outlier report — median/MAD price screening per
    // supplier, the outlier gate that survives the heavy tails that
    // break mean/stddev z-scores. Everything is exact integer cents:
    // the medians are `percentile_disc` (an order statistic, so no
    // interpolated doubles), |x−med| and the 3·MAD fence stay in
    // BIGINT, and the result is bit-stable at any parallelism. Shape:
    // the two-level median is the honest cost — two grouped aggregates
    // and two equi-joins, ALL keyed on s_suppkey, so one hash
    // partitioning serves every stage (supplier count grows with the
    // corpus → no low-cardinality funnel; per-group sorts inside
    // percentile_disc are group-local). Nothing is driver-side.
    "dq2_outlier_mad" -> { (s, d) =>
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_suppkey").as("supp_id"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
      val med = li.groupBy("supp_id")
        .agg(count(lit(1)).as("n_items"),
          expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS BIGINT)").as("med_cents"))
      val dev = li.join(med, "supp_id")
        .select(col("supp_id"), col("n_items"), col("med_cents"),
          abs(col("cents") - col("med_cents")).as("adev"))
      val mad = dev.groupBy("supp_id")
        .agg(expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY adev) AS BIGINT)").as("mad_cents"))
      dev.join(mad, "supp_id")
        .groupBy("supp_id")
        .agg(first("n_items").as("n_items"),
          first("med_cents").as("med_cents"),
          first("mad_cents").as("mad_cents"),
          count(when(col("adev") > col("mad_cents") * 3, lit(1))).as("n_out"))
        .orderBy(col("n_out").desc, col("supp_id"))
        .limit(15)
    }
  )

  private def colProfileSql(c: String): String =
    s"""SELECT '$c' AS column_name, COUNT(*) AS n,
          COUNT(*) - COUNT($c) AS n_null,
          COUNT(DISTINCT $c) AS n_distinct,
          CAST(MIN($c) AS VARCHAR) AS min_val,
          CAST(MAX($c) AS VARCHAR) AS max_val
        FROM documents"""

  def oracles: Map[String, String] = Map(
    "p7_profile_documents" -> (
      Seq("doc_id", "lang", "source", "n_chars")
        .map(colProfileSql).mkString("", " UNION ALL ", " ORDER BY column_name")),
    "dq1_constraint_report" ->
      """WITH r AS (
           SELECT 'fk_orders_custkey' AS check_name, COUNT(*) AS n_checked,
             COUNT(CASE WHEN c.c_custkey IS NULL THEN 1 END) AS n_violations
           FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
           UNION ALL
           SELECT 'fk_lineitem_orderkey', COUNT(*),
             COUNT(CASE WHEN oo.o_orderkey IS NULL THEN 1 END)
           FROM lineitem l LEFT JOIN orders oo ON l.l_orderkey = oo.o_orderkey
           UNION ALL
           SELECT 'unique_customer_key', COUNT(*),
             COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer
           UNION ALL
           SELECT 'unique_order_key', COUNT(*),
             COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders
           UNION ALL
           SELECT 'range_lineitem_qty', COUNT(*),
             COUNT(CASE WHEN l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50
                   THEN 1 END)
           FROM lineitem
           UNION ALL
           SELECT 'nonneg_events_value', COUNT(*),
             COUNT(CASE WHEN value IS NULL OR value < 0 THEN 1 END) FROM events
           UNION ALL
           SELECT 'consistent_doc_nchars', COUNT(*),
             COUNT(CASE WHEN n_chars <> length(text) THEN 1 END) FROM documents)
         SELECT check_name, n_checked,
           CAST(n_violations AS BIGINT) AS n_violations,
           CASE WHEN n_violations = 0 THEN 'PASS' ELSE 'FAIL' END AS status
         FROM r ORDER BY check_name""",
    "dq2_outlier_mad" ->
      """WITH li AS (
           SELECT l_suppkey AS supp_id,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
           FROM lineitem),
         med AS (
           SELECT supp_id, COUNT(*) AS n_items,
             CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS BIGINT)
               AS med_cents
           FROM li GROUP BY 1),
         dev AS (
           SELECT li.supp_id, n_items, med_cents,
             abs(cents - med_cents) AS adev
           FROM li JOIN med ON li.supp_id = med.supp_id),
         mad AS (
           SELECT supp_id,
             CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY adev) AS BIGINT)
               AS mad_cents
           FROM dev GROUP BY 1)
         SELECT dev.supp_id AS supp_id, ANY_VALUE(n_items) AS n_items,
           ANY_VALUE(med_cents) AS med_cents,
           ANY_VALUE(mad.mad_cents) AS mad_cents,
           COUNT(CASE WHEN adev > mad.mad_cents * 3 THEN 1 END) AS n_out
         FROM dev JOIN mad ON dev.supp_id = mad.supp_id
         GROUP BY dev.supp_id
         ORDER BY n_out DESC, supp_id LIMIT 15"""
  )
}
