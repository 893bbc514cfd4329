package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopK

class TopKPerGroupSpec extends SparkSpec {

  test("custom operator selects exactly the window-formulation rows") {
    val li = Tables.lineitem(spark, sf0001)
    val viaWindow = li
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))))
      .filter(col("rn") <= 7).drop("rn")
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
      .collect().map(_.toString).sorted
    val viaCustom = TopK.perGroup(li, Seq("l_returnflag"),
        Seq("l_extendedprice" -> true, "l_orderkey" -> false, "l_linenumber" -> false), 7)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
      .collect().map(_.toString).sorted
    assert(viaCustom.sameElements(viaWindow))
  }

  test("physical plan contains the partial+final TopKPerGroup execs") {
    val df = TopK.perGroup(Tables.orders(spark, sf0001),
      Seq("o_custkey"), Seq("o_totalprice" -> true, "o_orderkey" -> false), 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan)
    // both the pre-shuffle partial and post-shuffle final instances
    assert("TopKPerGroup".r.findAllIn(plan).length >= 2, plan)
  }

  test("k larger than any group degenerates to the full input") {
    val n = TopK.perGroup(Tables.orders(spark, sf0001),
      Seq("o_custkey"), Seq("o_orderkey" -> false), 1000000).count()
    assert(n == Tables.orders(spark, sf0001).count())
  }

  test("rewrite rule: window row_number<=k auto-plans through TopKPerGroupExec, result-identical") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graft.{TopKPerGroupRewrite, TopKPerGroupStrategy}
    def windowTopk() = Tables.orders(spark, sf0001)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rn") <= 3)
      .orderBy(col("o_orderpriority"), col("rn"))
    val plain = windowTopk().collect()
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    }
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ TopKPerGroupRewrite
    try {
      val df = windowTopk()
      val rewritten = df.collect()
      assert(df.queryExecution.executedPlan.toString.contains("TopKPerGroup"),
        s"rule did not fire:\n${df.queryExecution.executedPlan}")
      assert(rewritten.map(_.toString).toSeq == plain.map(_.toString).toSeq,
        "rewrite must be result-identical including the rn column")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == TopKPerGroupRewrite)
    }
  }

  test("q73_reservoir under the production extensions: rewrite fires on the per-user window, result identical") {
    // Bench/Verify/OdnsApp sessions enable GraftExtensions
    // (spark.sql.extensions); this mirrors that injection on the shared
    // test session and proves the gated q73 — a HIGH-cardinality
    // partition key (per-user), the case the partial-pass spill guard
    // exists for — plans through TopKPerGroupExec with identical rows.
    import org.apache.spark.sql.graft.{TopKPerGroupRewrite, TopKPerGroupStrategy}
    val plain = graft.operators.Analytics.q73Reservoir(spark, sf0001).collect()
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    }
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ TopKPerGroupRewrite
    try {
      val df = graft.operators.Analytics.q73Reservoir(spark, sf0001)
      val rewritten = df.collect()
      assert(df.queryExecution.executedPlan.toString.contains("TopKPerGroup"),
        s"rule did not fire on q73:\n${df.queryExecution.executedPlan}")
      assert(rewritten.map(_.toString).toSeq == plain.map(_.toString).toSeq)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == TopKPerGroupRewrite)
    }
  }
}
