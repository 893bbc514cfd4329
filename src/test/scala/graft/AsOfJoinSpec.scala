package graft

import org.apache.spark.sql.functions._

/** Specs for the custom as-of join operator (sorted merge, no row
  * expansion): result parity with the compositional formulation, plan
  * shape, tie-break and no-match semantics. */
class AsOfJoinSpec extends SparkSpec {
  import org.apache.spark.sql.graft.AsOf

  test("as-of operator equals the range-join + argmax composition on real data") {
    val e = Tables.events(spark, sf0001).select(col("event_id"), col("user_id"), col("ts"))
    val o = Tables.orders(spark, sf0001)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    val viaOp = AsOf.join(e, o, Seq("user_id"), Seq("o_custkey"),
        "ts", "o_orderdate", Seq("o_orderkey"))
      .select(col("event_id"), col("o_orderkey"), col("o_orderdate"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some((r.getLong(1), r.get(2))))).toMap
    val viaComposition = e
      .join(o, col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"), "left")
      .groupBy(col("event_id"))
      .agg(expr("max_by(o_orderkey, struct(o_orderdate, o_orderkey))").as("k"),
        max(col("o_orderdate")).as("t"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some((r.getLong(1), r.get(2))))).toMap
    assert(viaOp == viaComposition)
    assert(viaOp.values.exists(_.nonEmpty))
    // (the no-match null case is exercised by the synthetic spec below)
  }

  test("physical plan uses AsOfJoinExec with no Generate/Expand row multiplication") {
    val e = Tables.events(spark, sf0001).select(col("event_id"), col("user_id"), col("ts"))
    val o = Tables.orders(spark, sf0001)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    val df = AsOf.join(e, o, Seq("user_id"), Seq("o_custkey"),
      "ts", "o_orderdate", Seq("o_orderkey"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"expected the custom operator:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin"),
      s"the as-of path must not fall back to a built-in join:\n$p")
  }

  test("equal right times: the largest tie-break value wins") {
    import spark.implicits._
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L, 100L), (1L, 5L, 200L), (1L, 7L, 50L))
      .toDF("k", "rt", "id")
    val out = AsOf.join(l, r, Seq("k"), Seq("k"), "t", "rt", Seq("id")).collect()
    assert(out.length == 1)
    // both candidates at rt=7<=10? rt 7 is latest; among rt=5 ties id=200
    assert(out.head.getLong(3) == 7L && out.head.getLong(4) == 50L)
    val out2 = AsOf.join(l.withColumn("t", lit(6L)), r,
      Seq("k"), Seq("k"), "t", "rt", Seq("id")).collect()
    assert(out2.head.getLong(3) == 5L && out2.head.getLong(4) == 200L,
      "tie at the as-of boundary must resolve to the largest tie-break")
  }

  test("mismatched key or time types fail analysis instead of comparing raw values") {
    import spark.implicits._
    val l = Seq((1L, 10L)).toDF("k", "t")
    val rIntKey = Seq((1, 5L, 1L)).toDF("k", "rt", "id")
    intercept[IllegalArgumentException] {
      AsOf.join(l, rIntKey, Seq("k"), Seq("k"), "t", "rt", Seq("id"))
    }
    val rDateTime = Seq((1L, java.sql.Date.valueOf("2024-01-01"), 1L)).toDF("k", "rt", "id")
    intercept[IllegalArgumentException] {
      AsOf.join(l, rDateTime, Seq("k"), Seq("k"), "t", "rt", Seq("id"))
    }
  }

  test("SQL null semantics: null keys and null times match nothing on either side") {
    import spark.implicits._
    val l = Seq((Some(1L), Some(10L)), (None, Some(10L)), (Some(1L), None))
      .toDF("k", "t")
    val r = Seq((Some(1L), Some(5L), 1L), (Some(1L), None, 99L), (None, Some(3L), 98L))
      .toDF("k", "rt", "id")
    val out = AsOf.join(l, r, Seq("k"), Seq("k"), "t", "rt", Seq("id")).collect()
    assert(out.length == 3)
    val matched = out.filter(!_.isNullAt(4)).map(r => (r.getLong(0), r.getLong(4)))
    // only the fully non-null left row matches, and only the non-null-time
    // right row (id=1) is eligible — never the null-time id=99 row that
    // natural nulls-first ordering would otherwise admit
    assert(matched.toSeq == Seq((1L, 1L)), matched.mkString(","))
  }

  test("keys with no eligible right row and keys absent from right both yield nulls") {
    import spark.implicits._
    val l = Seq((1L, 3L), (2L, 10L)).toDF("k", "t") // k=1: right rows all later; k=2: no right rows
    val r = Seq((1L, 5L, 1L)).toDF("k", "rt", "id")
    val out = AsOf.join(l, r, Seq("k"), Seq("k"), "t", "rt", Seq("id"))
      .collect().sortBy(_.getLong(0))
    assert(out.length == 2)
    assert(out.forall(row => row.isNullAt(2) && row.isNullAt(3) && row.isNullAt(4)))
  }
}
