package graft

import graft.operators.Analytics

/** Shape/sanity checks per analytics operator — value-level parity is
  * enforced by the DuckDB oracle gate (tools/oracle_check.py). */
class AnalyticsSpec extends SparkSpec {

  test("q1 pricing summary groups by flag×status") {
    val rows = Analytics.q1PricingSummary(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    assert(rows.map(_.getAs[Long]("count_order")).sum == 6000L)
  }

  test("q2 revenue covers all nations with orders") {
    val rows = Analytics.q2RevenueByNation(spark, sf0001).collect()
    assert(rows.length == 25)
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
  }

  test("q3 returns exactly top 10 in descending revenue") {
    val rev = Analytics.q3TopkOrders(spark, sf0001).collect()
      .map(_.getAs[Double]("revenue"))
    assert(rev.length == 10)
    assert(rev.sameElements(rev.sorted.reverse))
  }

  test("q5 running total is monotone within customer") {
    val rows = Analytics.q5WindowRunning(spark, sf0001).collect()
    val byCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    byCust.values.foreach { rs =>
      val totals = rs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("run_total"))
      assert(totals.sameElements(totals.sorted))
    }
  }

  test("q7 semi+anti partition the customer table") {
    val rows = Analytics.q7SemiAnti(spark, sf0001).collect()
    assert(rows.length == 150)
    assert(rows.map(_.getAs[Long]("c_custkey")).distinct.length == 150)
  }

  test("q13 as-of join keeps every event exactly once") {
    val df = Analytics.q13AsofJoin(spark, sf0001)
    assert(df.count() == 1000)
    // last_order_ts never exceeds the event time — the as-of contract
    val bad = df.join(Tables.events(spark, sf0001), "event_id")
      .filter("last_order_ts > ts").count()
    assert(bad == 0)
  }

  test("q14 sessions respect the 30-minute gap invariant") {
    val rows = Analytics.q14Sessionize(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum == 1000L)
    rows.groupBy(_.getAs[Long]("user_id")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("session_id"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // next session starts more than 30 min after previous one ends
          assert(b.getAs[Long]("start_us") - a.getAs[Long]("end_us") > 1800L * 1000000L)
        case _ =>
      }
    }
  }
}
