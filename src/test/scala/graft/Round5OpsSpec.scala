package graft

import graft.operators.CorpusPipeline
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 specs: the distributed two-phase prefix sum that replaced
  * the per-language serial window in the packing family — value parity
  * with the serial formulation and the plan property that motivated it
  * (no window partitioned by the language key alone). */
class Round5OpsSpec extends SparkSpec {

  private def sizedDocs = Tables.documents(spark, sf0001)
    .withColumn("dl", expr(
      "cast(size(filter(split(text, ' '), x -> x != '')) as bigint)"))
    .filter(col("dl") > 0)

  test("prefixSumExclusive is bit-identical to the serial per-key window cumsum") {
    val serial = sizedDocs
      .withColumn("start_off", coalesce(
        sum(col("dl")).over(Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("lang"), col("doc_id"), col("start_off"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val twoPhase = CorpusPipeline
      .prefixSumExclusive(sizedDocs, "lang", Seq(col("doc_id")), "dl", "start_off")
      .select(col("lang"), col("doc_id"), col("start_off"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(twoPhase == serial)
  }

  test("prefixSumExclusive parity holds under a multi-column descending order") {
    val serial = sizedDocs
      .withColumn("off", coalesce(
        sum(col("dl")).over(Window.partitionBy(col("lang"))
          .orderBy(col("dl").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("off"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val twoPhase = CorpusPipeline
      .prefixSumExclusive(sizedDocs, "lang", Seq(col("dl").desc, col("doc_id")),
        "dl", "off")
      .select(col("doc_id"), col("off"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(twoPhase == serial)
  }

  test("q100_ema: convexity — each EMA lies within the trailing 8-point cents range") {
    val rows = graft.operators.Analytics.q100Ema(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3) / 1000.0))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { series =>
      // output order is the day order (warm-up rows dropped); from the
      // 8th output row on, the trailing 8 OUTPUT rows are the window
      series.sliding(8).filter(_.size == 8).foreach { wnd =>
        val cents = wnd.map(_._2)
        val ema = wnd.last._3
        assert(ema >= cents.min - 1e-3 && ema <= cents.max + 1e-3,
          s"ema $ema outside [${cents.min}, ${cents.max}]")
      }
    }
  }

  test("packing family plans carry no window partitioned by lang alone") {
    Seq(
      CorpusPipeline.pipePackSequences(spark, sf0001),
      CorpusPipeline.pipeTokenBudget(spark, sf0001),
      CorpusPipeline.pipeE2eCorpus(spark, sf0001)
    ).foreach { df =>
      val windows = df.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      // the big cumsum must be keyed by (lang, _pid); only the tiny
      // per-partition-subtotal window (input ≤ partitions × langs rows)
      // may key on lang alone — it orders by _pid, distinguishing it.
      // Windows on other keys (e.g. the dedup window on clean_md5, a
      // high-cardinality hash) are not the skew pattern under test.
      windows.filter(_.partitionSpec.exists(_.toString.contains("lang")))
        .foreach { w =>
          val ordersByPid = w.orderSpec.exists(_.child.toString.contains("_pid"))
          assert(w.partitionSpec.size >= 2 || ordersByPid,
            s"serial per-lang window found in plan:\n$w")
        }
    }
  }
}
