package graft.operators

import graft.Tables
import graft.functions.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §2.3 #32-34).
  *
  * The demo query set is `vec_id < 5`; the shapes below are written for
  * the real regime (broadcast the query set, keep the corpus distributed,
  * prune before the expensive dot products).
  */
object Similarity {

  private val K = 10

  private def queries(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))

  private def topkPerQuery(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cosim").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= K)
      .select(col("qid").as("query_id"), col("rank"), col("vec_id"),
        round(col("cosim"), 6).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Brute-force cosine top-k: the exact baseline. The query set is
    * broadcast (tiny), so scoring is map-side over the corpus — the only
    * shuffle is the final per-query top-k, |Q|·k rows. */
  def simTopkBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val scored = broadcast(queries(spark, dir))
      .crossJoin(Tables.embeddings(spark, dir))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosim", VectorOps.cosine("qe", "embedding"))
    topkPerQuery(scored)
  }

  /** IVF-style ANN: label blocks act as inverted-file cells. Cell
    * centroids are exact-decimal means (order-independent, oracle-
    * identical); each query probes its top-2 cells only, scanning
    * ~|probed cells|/|cells| of the corpus. At scale the centroids are
    * a broadcast of #cells rows and candidate pruning happens before
    * any wide shuffle. */
  def simIvfAnn(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    // exact per-dimension centroid: decimal sums, then one double divide
    val cent = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(expr("cast(sum(cast(v as decimal(18,9))) as double) / count(*)").as("c"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)").as("cv"))

    val cellScores = broadcast(queries(spark, dir))
      .crossJoin(broadcast(cent))
      .withColumn("cs", VectorOps.cosine("qe", "cv"))
    val wCell = Window.partitionBy(col("qid")).orderBy(col("cs").desc, col("label"))
    val cells = cellScores
      .withColumn("rn", row_number().over(wCell))
      .filter(col("rn") <= 2)
      .select(col("qid"), col("label"), col("qe"))

    val scored = cells
      .join(e, Seq("label"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosim", VectorOps.cosine("qe", "embedding"))
    topkPerQuery(scored)
  }

  /** Random-hyperplane LSH ANN (rows-only: the hex→int hyperplane
    * derivation has no DuckDB twin; SimilaritySpec measures recall
    * against the brute-force baseline instead). Sign bits over random
    * hyperplanes bucket the corpus; a query scans only its bucket —
    * O(n/2^planes) of the corpus per query in expectation, one shuffle
    * on the bucket id. */
  def simLshAnn(spark: SparkSession, dir: String): DataFrame = {
    // 2^6 buckets — sized so buckets stay populated at test scale; at
    // corpus scale raise planes (buckets ≈ n / desired-bucket-size) or
    // use multi-probe over several hash tables for recall
    val planes = 6
    // deterministic pseudo-random hyperplanes from md5(plane:dim)
    val bucketExpr = expr(
      s"""aggregate(sequence(0, ${planes - 1}), cast(0 as bigint), (acc, p) ->
         |acc + if(aggregate(sequence(1, size(embedding)), cast(0 as double), (s, d) ->
         |s + cast(element_at(embedding, d) as double) *
         |((cast(conv(substring(md5(concat(cast(p as string), ':', cast(d as string))), 1, 8), 16, 10) as double) / 4294967295.0) - 0.5)
         |) > 0, shiftleft(cast(1 as bigint), p), cast(0 as bigint)))""".stripMargin)
    val bucketed = Tables.embeddings(spark, dir).withColumn("bucket", bucketExpr)
    val q = bucketed.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("bucket"))
    val scored = broadcast(q)
      .join(bucketed, Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosim", VectorOps.cosine("qe", "embedding"))
    topkPerQuery(scored)
  }
}
