package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operator coverage over the driver's TPC-H-ish tables.
  *
  * These are oracle-checked (DuckDB) analogs of the engine's aggregate /
  * join / window needs (SURVEY.md §2.3, §2.6): partial+final hash
  * aggregation, broadcast hash join, top-k (TakeOrderedAndProject) and
  * window ranking.
  *
  * Numeric discipline: money math is done in exact DECIMAL and cast to
  * DOUBLE only at the very end, so Spark and DuckDB produce bit-identical
  * doubles regardless of aggregation order (float sums are
  * order-dependent; decimal sums are not).
  */
object Relational {

  private def dec(c: org.apache.spark.sql.Column, p: Int, s: Int) =
    c.cast(DecimalType(p, s))

  /** TPC-H Q1-shaped pricing summary: hash agg with exact decimal sums. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val qty = dec($"l_quantity", 12, 2)
    val price = dec($"l_extendedprice", 12, 2)
    val discPrice = (price * (lit(1) - dec($"l_discount", 4, 2))).cast(DecimalType(16, 4))
    val charge = (discPrice * (lit(1) + dec($"l_tax", 4, 2))).cast(DecimalType(20, 6))
    li.filter($"l_shipdate" <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(qty).cast("double").as("sum_qty"),
        sum(price).cast("double").as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(16,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(16,4)) * (1 + CAST(l_tax AS DECIMAL(4,2))) AS DECIMAL(20,6))) AS DOUBLE) AS sum_charge,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q6-shaped: tight filter + single global agg — the pure
    * scan-throughput shape (all predicates push into the parquet scan;
    * one partial+final agg, no join, no wide shuffle). */
  def revenueFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    li.filter($"l_shipdate" >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
        $"l_shipdate" < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")) &&
        $"l_discount".between(0.02, 0.06) && $"l_quantity" < 24)
      .agg(sum(dec($"l_extendedprice", 12, 2) * dec($"l_discount", 4, 2))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  val revenueFilterSql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin

  /** Sessionization over the `events` stream table: 30-minute-gap
    * sessions per user via lag + cumulative window sum — the classic
    * two-window pattern; partitioned by user so the shuffle is one
    * hash exchange on the session key. */
  def eventSessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val withGap = ev.withColumn("prev_ts", lag($"ts", 1).over(byUser))
      .withColumn("new_session",
        when($"prev_ts".isNull ||
          unix_timestamp($"ts") - unix_timestamp($"prev_ts") > 1800, 1)
          .otherwise(0))
    val withSid = withGap.withColumn("session_seq",
      sum($"new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    withSid.groupBy($"user_id", $"session_seq")
      .agg(count(lit(1)).as("n_events"),
        // decimal sum: order-independent, bit-identical across engines
        sum(dec($"value", 18, 6)).cast("double").as("total_value"),
        min($"ts").as("session_start"))
      .select($"user_id", $"session_seq", $"n_events",
        round($"total_value", 4).as("total_value"),
        date_format($"session_start", "yyyy-MM-dd HH:mm:ss").as("session_start"))
      .orderBy($"user_id", $"session_seq")
  }

  val eventSessionsSql: String =
    """WITH g AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT *, sum(new_session) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      |  FROM g)
      |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, count(*) AS n_events,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_value,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
      |FROM s GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  /** TPC-H Q3-shaped: broadcast the customer DIMENSION only + top-k by
    * revenue. orders is a fact table (second-largest in the schema):
    * broadcasting it would exceed any sane autoBroadcastJoinThreshold at
    * scale and OOM executors, so orders⋈lineitem is left to the planner
    * — a shuffle join at scale, auto-broadcast under AQE when the
    * filtered side is genuinely small. */
  def topRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .filter($"c_mktsegment" === "BUILDING")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .filter($"o_orderdate" < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter($"l_shipdate" > lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
    val discPrice = (dec($"l_extendedprice", 12, 2) * (lit(1) - dec($"l_discount", 4, 2)))
      .cast(DecimalType(16, 4))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy($"l_orderkey", date_format($"o_orderdate", "yyyy-MM-dd").as("o_date"))
      .agg(sum(discPrice).cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  val topRevenueSql: String =
    """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(16,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_date
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** Window ranking: top-3 parts by revenue per supplier (row_number over
    * an exact-decimal ordering key → deterministic rank). */
  def supplierTopParts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val discPrice = (dec($"l_extendedprice", 12, 2) * (lit(1) - dec($"l_discount", 4, 2)))
      .cast(DecimalType(16, 4))
    val rev = li.groupBy($"l_suppkey", $"l_partkey")
      .agg(sum(discPrice).as("rev_dec"))
    val w = Window.partitionBy($"l_suppkey").orderBy($"rev_dec".desc, $"l_partkey")
    rev.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"l_suppkey", $"l_partkey", $"rev_dec".cast("double").as("revenue"), $"rn")
      .orderBy($"l_suppkey", $"rn")
  }

  val supplierTopPartsSql: String =
    """SELECT l_suppkey, l_partkey, CAST(rev_dec AS DOUBLE) AS revenue, rn FROM (
      |  SELECT l_suppkey, l_partkey, rev_dec,
      |    row_number() OVER (PARTITION BY l_suppkey ORDER BY rev_dec DESC, l_partkey) AS rn
      |  FROM (
      |    SELECT l_suppkey, l_partkey,
      |      sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(16,4))) AS rev_dec
      |    FROM lineitem GROUP BY l_suppkey, l_partkey))
      |WHERE rn <= 3
      |ORDER BY l_suppkey, rn""".stripMargin
}
