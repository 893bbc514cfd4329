package graft.operators

import graft.Tables
import graft.functions.{TextOps, VectorOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents`/`embeddings` tables
  * (SURVEY.md §2.3 #27-31).
  *
  * Scale shape: every variant is one shuffle on a compact key (content
  * hash, band hash, shingle, or label block) — never an O(n²) cross
  * join. Candidate generation and verification are separate stages, as
  * in production MinHash-LSH pipelines.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the smallest doc_id.
    * At 100 TB this is the cheapest pass: map-side md5 + one shuffle
    * of (hash, id) pairs, never the payload. */
  def ddExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
      .orderBy(col("content_hash"))

  /** MinHash + LSH banding: 8-perm signature, 4 bands × 2 rows.
    * Shuffle volume is docs × bands (tiny fixed-width rows); the
    * self-join happens only within band buckets. Pairs sharing any
    * band are candidates for the exact verify pass (ddNgramJaccard). */
  def ddMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sig = TextOps.withShingles(Tables.documents(spark, dir))
      .withColumn("sig", TextOps.minhashSig("shingles"))
      .select(col("doc_id"), col("sig"))
    val bands = sig
      .select(col("doc_id"), explode(expr("sequence(0, 3)")).as("b"), col("sig"))
      .withColumn("bh", expr(
        "md5(concat(element_at(sig, 2 * b + 1), element_at(sig, 2 * b + 2), ':', cast(b as string)))"))
      .select(col("doc_id"), col("b"), col("bh"))
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b, expr("a.bh = b.bh AND a.b = b.b AND a.doc_id < b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 60-bit SimHash over token hashes (rows-only: hex→int conversion has
    * no DuckDB twin). Hamming-close hashes ⇒ near-dup texts; the spec
    * asserts the metric property. One projection, no shuffle. */
  def ddSimhash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", TextOps.tokens("text"))
      .filter(expr("size(toks) >= 1"))
      // one 60-bit hash per token, then a ±1 vote per bit position
      .withColumn("hs", expr(
        "transform(toks, t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))"))
      .withColumn("simhash", expr(
        """aggregate(sequence(0, 59), cast(0 as bigint), (acc, j) ->
          |acc + if(aggregate(hs, 0, (c, h) -> c + if(((h >> j) & 1) = 1, 1, -1)) > 0, shiftleft(cast(1 as bigint), j), cast(0 as bigint)))""".stripMargin))
      .select(col("doc_id"), col("simhash"))
      .orderBy(col("doc_id"))

  /** Exact n-gram Jaccard via the explode-join formulation: docs sharing
    * ≥1 shingle become pairs, similarity from intersection counts. The
    * threshold test is integer arithmetic (j ≥ 0.2 ⇔ 5·|∩| ≥ |∪|) so no
    * float boundary can disagree with the oracle. Scale: shuffle keyed
    * on shingle; a frequency cap on hot shingles (stop-shingles) is the
    * standard skew guard at 100 TB. */
  def ddNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = TextOps.withShingles(Tables.documents(spark, dir))
      .select(col("doc_id"), explode(array_distinct(col("shingles"))).as("s"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        expr("a.s = b.s AND a.doc_id < b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("ninter"))
    inter
      .join(sizes.as("sa"), col("da") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("db") === col("sb.doc_id"))
      .filter(expr("ninter * 5 >= (sa.n + sb.n - ninter)"))
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        expr("round(cast(ninter as double) / (sa.n + sb.n - ninter), 6)").as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Embedding-cosine near-dup, blocked by label (an IVF-style coarse
    * partition): pairs are only formed within a block, turning O(n²)
    * into Σ|block|². */
  def ddEmbedCos(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val a = e.select(col("vec_id").as("va"), col("label"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("vb"), col("label"), col("embedding").as("eb"))
    a.join(b, Seq("label"))
      .filter(col("va") < col("vb"))
      .withColumn("cosim", VectorOps.cosine("ea", "eb"))
      .filter(col("cosim") >= 0.3)
      .select(col("va").as("vec_a"), col("vb").as("vec_b"),
        round(col("cosim"), 6).as("score"))
      .orderBy(col("vec_a"), col("vec_b"))
  }
}
