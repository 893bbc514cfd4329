package graft

import graft.functions.VectorOps
import org.apache.spark.sql.functions._

/** The native codegen expressions must be bit-identical to the HOF
  * formulation (which is what the DuckDB oracle mirrors). */
class VectorExpressionsSpec extends SparkSpec {

  private def embPairs = {
    val e = Tables.embeddings(spark, sf0001)
    e.select(col("vec_id").as("va"), col("embedding").as("ea"))
      .crossJoin(e.select(col("vec_id").as("vb"), col("embedding").as("eb")))
      .filter(col("va") < col("vb")).limit(2000)
  }

  test("native dot is bit-identical to the HOF fold") {
    val n = embPairs
      .withColumn("d_native", VectorOps.dot("ea", "eb"))
      .withColumn("d_hof", VectorOps.dotHof("ea", "eb"))
      .filter(col("d_native") =!= col("d_hof"))
      .count()
    assert(n == 0)
  }

  test("native norm is bit-identical to the HOF fold") {
    val n = Tables.embeddings(spark, sf0001)
      .withColumn("n_native", VectorOps.norm2("embedding"))
      .withColumn("n_hof", VectorOps.norm2Hof("embedding"))
      .filter(col("n_native") =!= col("n_hof"))
      .count()
    assert(n == 0)
  }

  test("native squared-L2 is bit-identical to the HOF fold (float × float)") {
    val n = embPairs
      .withColumn("d_native", VectorOps.l2sq(col("ea"), col("eb")))
      .withColumn("d_hof", expr(
        """aggregate(zip_with(ea, eb,
          | (x, y) -> (cast(x as double) - cast(y as double)) * (cast(x as double) - cast(y as double))),
          | cast(0 as double), (acc, v) -> acc + v)""".stripMargin))
      .filter(col("d_native") =!= col("d_hof"))
      .count()
    assert(n == 0)
  }

  test("native squared-L2 is bit-identical on MIXED float × double sides (no array cast)") {
    // centroid-style double arrays on one side: each element must be
    // read at its stored precision (an implicit float-array cast would
    // change which value is widened and break oracle parity)
    val e = Tables.embeddings(spark, sf0001)
    val cent = e.select(col("label"),
        posexplode(col("embedding")).as(Seq("p", "v")))
      .groupBy(col("label"), col("p"))
      .agg(avg(col("v").cast("double")).as("c"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(p, c))), x -> x.c)").as("cv"))
    val n = e.join(cent, "label")
      .withColumn("d_native", VectorOps.l2sq(col("embedding"), col("cv")))
      .withColumn("d_hof", expr(
        """aggregate(zip_with(embedding, cv, (x, c) -> (cast(x as double) - c) * (cast(x as double) - c)),
          | cast(0 as double), (acc, v) -> acc + v)""".stripMargin))
      .filter(col("d_native") =!= col("d_hof"))
      .count()
    assert(n == 0)
  }

  test("null and empty arrays are handled") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (None, Some(Seq(1.0f))),
      (Some(Seq.empty[Float]), Some(Seq.empty[Float]))).toDF("a", "b")
    val out = df.select(
      VectorOps.dot("a", "b").as("d"), VectorOps.norm2("a").as("n")).collect()
    assert(out(0).getDouble(0) == 11.0 && math.abs(out(0).getDouble(1) - math.sqrt(5.0)) < 1e-12)
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
    assert(out(2).getDouble(0) == 0.0 && out(2).getDouble(1) == 0.0)
  }
}
