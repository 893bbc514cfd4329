package graft.operators

import graft.Tables
import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §2.3 #32-34).
  *
  * The demo query set is `vec_id < 5`; the shapes below are written for
  * the real regime (broadcast the query set, keep the corpus distributed,
  * prune before the expensive dot products). Vector norms are computed
  * once per vector and reused across pairs — the resulting doubles are
  * bit-identical to the oracle's inline formula.
  */
object Similarity {

  private val K = 10

  /** Corpus with the norm precomputed once per vector. */
  private def corpus(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .withColumn("nrm", VectorOps.norm2("embedding"))

  private def queries(c: DataFrame): DataFrame =
    c.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qnrm"))

  private def topkPerQuery(scored: DataFrame): DataFrame = {
    // custom TopKPerGroup operator prunes to K rows per query with
    // bounded heaps (partial pass before the shuffle), then a window
    // over the surviving |Q|·K rows assigns ranks — same selection
    // semantics as row_number()<=K but without sorting whole groups
    val pruned = org.apache.spark.sql.graft.TopK.perGroup(
      scored, Seq("qid"), Seq("cosim" -> true, "vec_id" -> false), K)
    val w = Window.partitionBy(col("qid")).orderBy(col("cosim").desc, col("vec_id"))
    pruned
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .select(col("qid").as("query_id"), col("rank"), col("vec_id"),
        round(col("cosim"), 6).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Brute-force cosine top-k: the exact baseline. The query set is
    * broadcast (tiny), so scoring is map-side over the corpus — the only
    * shuffle is the final per-query top-k, |Q|·k rows. */
  def simTopkBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val scored = broadcast(queries(c))
      .crossJoin(c)
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosim", VectorOps.dot("qe", "embedding") / (col("qnrm") * col("nrm")))
    topkPerQuery(scored)
  }

  /** IVF-style ANN: label blocks act as inverted-file cells. Cell
    * centroids are exact-decimal means (order-independent, oracle-
    * identical); each query probes its top-2 cells only, scanning
    * ~|probed cells|/|cells| of the corpus. At scale the centroids are
    * a broadcast of #cells rows and candidate pruning happens before
    * any wide shuffle. */
  def simIvfAnn(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    // exact per-dimension centroid: decimal sums, then one double divide
    val cent = c
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(expr("cast(sum(cast(v as decimal(18,9))) as double) / count(*)").as("c"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)").as("cv"))

    val cellScores = broadcast(queries(c))
      .crossJoin(broadcast(cent))
      // centroid vectors are array<double> → HOF path, same arithmetic
      .withColumn("cs", VectorOps.dotHof("qe", "cv") / (col("qnrm") * VectorOps.norm2Hof("cv")))
    val wCell = Window.partitionBy(col("qid")).orderBy(col("cs").desc, col("label"))
    val cells = cellScores
      .withColumn("rn", row_number().over(wCell))
      .filter(col("rn") <= 2)
      .select(col("qid"), col("label"), col("qe"), col("qnrm"))

    val scored = cells
      .join(c, Seq("label"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosim", VectorOps.dot("qe", "embedding") / (col("qnrm") * col("nrm")))
    topkPerQuery(scored)
  }

  /** Multi-probe LSH: each query scans its home bucket plus every
    * 1-bit-flip neighbor bucket (planes+1 probes) — the standard recall
    * repair for sign LSH, trading a constant-factor candidate increase
    * for recovering neighbors that fell across one hyperplane. Still
    * O(n·(planes+1)/2^planes) expected candidates per query, one
    * shuffle on the bucket id. Rows-only (recall measured in spec). */
  def simLshMultiProbe(spark: SparkSession, dir: String): DataFrame = {
    val bucketed = lshBucketed(spark, dir)
    val probes = bucketed.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qnrm"),
        explode(expr(
          s"array_union(array(bucket), transform(sequence(0, ${LshPlanes - 1}), p -> cast(bucket ^ shiftleft(cast(1 as bigint), p) as bigint)))")).as("bucket"))
    val scored = broadcast(probes)
      .join(bucketed, Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosim", VectorOps.dot("qe", "embedding") / (col("qnrm") * col("nrm")))
      // a candidate can appear via several probes; top-k must see it once
      .dropDuplicates("qid", "vec_id")
    topkPerQuery(scored)
  }

  /** One Lloyd iteration of k-means over the embeddings (cells seeded
    * from the label column): exact-decimal centroids, then every vector
    * reassigned to its nearest centroid by squared euclidean distance
    * (tie-break on the smaller cell id). The full algorithm is this
    * operator iterated — each round is one broadcast of k centroids and
    * one map-side scan, the canonical distributed k-means shape. */
  def simKmeansStep(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val cent = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(expr("cast(sum(cast(v as decimal(18,9))) as double) / count(*)").as("c"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)").as("cv"))
      .select(col("label").as("clabel"), col("cv"))
    val dists = e.crossJoin(broadcast(cent))
      .withColumn("dist", expr(
        "aggregate(zip_with(embedding, cv, (x, c) -> (cast(x as double) - c) * (cast(x as double) - c)), cast(0 as double), (acc, v) -> acc + v)"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("clabel"))
    dists
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("label"), col("clabel").as("new_label"),
        round(col("dist"), 6).as("dist"))
      .orderBy(col("vec_id"))
  }

  /** Within-cluster inertia (SSE) per assigned centroid — the
    * clustering-quality readout (the y-axis of an elbow plot) that
    * completes the k-means family: [[simKmeansStep]] assigns, this
    * audits. Per-row distances are deterministic fixed-order float
    * folds (as in the step), then cross-row reduction happens in
    * DECIMAL over the rounded per-row values — partition-order
    * independent, the same discipline as PageRank's contribution
    * sums. Also reports how many vectors kept their label
    * (assignment stability). */
  def simInertia(spark: SparkSession, dir: String): DataFrame =
    simKmeansStep(spark, dir)
      .groupBy(col("new_label"))
      .agg(count(lit(1)).as("n_vecs"),
        expr("cast(sum(cast(dist as decimal(38,6))) as decimal(38,6))")
          .as("_inertia"),
        sum(when(col("label") === col("new_label"), 1L).otherwise(0L))
          .as("n_stable"))
      .withColumn("mean_dist", expr("cast(_inertia as double) / n_vecs"))
      // output edge: exact micro-integer (values are Σ of rounded-to-6
      // per-row distances, so ×10⁶ is integral by construction); no
      // DecimalType leaves a query (r5 verdict #1)
      .select(col("new_label"), col("n_vecs"),
        expr("cast(_inertia * 1000000 as bigint)").as("inertia_micro"),
        col("n_stable"), col("mean_dist"))
      .orderBy(col("new_label"))

  /** Int8 symmetric quantization of the embedding column (the storage/
    * bandwidth shrink applied before ANN serving): per-vector max-abs
    * scale, values mapped to round(v·127/scale). Pure projection — at
    * 100 TB this runs fused into the scan with zero shuffle. The
    * rounding is floor(x + 0.5) in BOTH engines (identical IEEE
    * arithmetic), sidestepping engine-specific round() conventions.
    * The vector is emitted CSV-encoded (a scalar column): downstream
    * gates canonicalize rows by sorting values, which needs scalar
    * cells, and the encoding is lossless for int8 payloads. */
  def simQuantize(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .withColumn("mx", expr(
        "array_max(transform(embedding, v -> abs(cast(v as double))))"))
      .select(col("vec_id"), round(col("mx"), 6).as("scale"),
        expr("""array_join(if(mx = 0.0, transform(embedding, v -> '0'),
               |  transform(embedding, v ->
               |    cast(cast(floor(cast(v as double) * 127 / mx + 0.5) as int) as string))), ',')""".stripMargin).as("qvec"))
      .orderBy(col("vec_id"))

  /** Davies–Bouldin index per cluster — the internal validation that
    * completes the tier (inertia = raw SSE, silhouette = per-point,
    * Calinski–Harabasz = global ratio; DB is the per-CLUSTER
    * worst-neighbour readout: which cluster most blurs into another).
    * DB_i = max_{j≠i} (s_i + s_j)/d_ij with s = mean Euclidean
    * scatter to the assigned centroid and d = centroid separation.
    * Numeric discipline: per-row sqrt distances round to 6 FIRST
    * (sqrt-only parity, the q62 rule), cross-row sums run in exact
    * DECIMAL over the rounded values (the inertia rule), and every
    * downstream ratio is integer-micro arithmetic — coincident
    * centroids (d = 0) drop out of the max and an isolated cluster
    * publishes NULL in both engines. Everything past the assignment
    * is k²-sized. */
  def simDaviesBouldin(spark: SparkSession, dir: String): DataFrame = {
    val scat = simKmeansStep(spark, dir)
      .withColumn("sd", expr("cast(round(sqrt(dist), 6) as decimal(38,6))"))
      .groupBy(col("new_label"))
      .agg(count(lit(1)).as("n_vecs"),
        expr("cast(sum(sd) * 1000000 as decimal(38,0))").as("ssum_micro"))
      .select(col("new_label"), col("n_vecs"),
        expr("cast(ssum_micro div n_vecs as bigint)").as("s_micro"))
    val cent = Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(expr("cast(sum(cast(v as decimal(18,9))) as double) / count(*)").as("c"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)").as("cv"))
    val a = cent.select(col("label").as("i"), col("cv").as("ca"))
    val b = cent.select(col("label").as("j"), col("cv").as("cb"))
    val sep = a.crossJoin(broadcast(b))
      .filter(col("i") =!= col("j"))
      .withColumn("d_micro", expr(
        """cast(cast(round(sqrt(aggregate(zip_with(ca, cb, (x, y) -> (x - y) * (x - y)),
          |cast(0 as double), (acc, v) -> acc + v)), 6) as decimal(38,6)) * 1000000 as bigint)""".stripMargin))
      .filter(col("d_micro") > 0)
      .select(col("i"), col("j"), col("d_micro"))
    val si = scat.select(col("new_label").as("i"), col("s_micro").as("si"))
    val sj = scat.select(col("new_label").as("j"), col("s_micro").as("sj"))
    val ratios = sep.join(broadcast(si), Seq("i")).join(broadcast(sj), Seq("j"))
      .withColumn("r_micro", expr(
        "cast(cast(si + sj as decimal(38,0)) * 1000000 div d_micro as bigint)"))
      .groupBy(col("i")).agg(max(col("r_micro")).as("db_micro"))
    scat.join(ratios, col("new_label") === col("i"), "left")
      .select(col("new_label"), col("n_vecs"), col("s_micro"), col("db_micro"))
      .orderBy(col("new_label"))
  }

  /** Pairwise cosine between label centroids — the cluster-geometry
    * diagnostic (how separable are the IVF cells). Centroids are exact
    * decimal means as in [[simIvfAnn]]; the pairwise stage is a tiny
    * #labels² broadcast cross join. */
  def simCentroidDist(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val cent = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(expr("cast(sum(cast(v as decimal(18,9))) as double) / count(*)").as("c"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)").as("cv"))
    val a = cent.select(col("label").as("label_a"), col("cv").as("ca"))
    val b = cent.select(col("label").as("label_b"), col("cv").as("cb"))
    a.crossJoin(broadcast(b))
      .filter(col("label_a") < col("label_b"))
      .withColumn("cosine",
        VectorOps.dotHof("ca", "cb") / (VectorOps.norm2Hof("ca") * VectorOps.norm2Hof("cb")))
      .select(col("label_a"), col("label_b"), round(col("cosine"), 6).as("cosine"))
      .orderBy(col("label_a"), col("label_b"))
  }

  /** Random-hyperplane LSH ANN (oracle-checked — the md5-derived
    * hyperplanes are reproduced in SQL, and the spec additionally
    * measures recall against the brute-force baseline). Sign bits over
    * `planes` hyperplanes bucket the corpus; a query scans only its own
    * bucket — O(n/2^planes) of the corpus per query in expectation, one
    * shuffle on the bucket id. */
  // 2^6 buckets — sized so buckets stay populated at test scale; at
  // corpus scale raise planes (buckets ≈ n / desired-bucket-size)
  private val LshPlanes = 6

  /** Corpus with deterministic sign-LSH bucket + norm. Hyperplanes are
    * derived from md5 ONCE on the driver and shipped as a literal
    * (64 × planes doubles), so bucketing is a plain dot product. */
  private def lshBucketed(spark: SparkSession, dir: String): DataFrame = {
    val dims = 64
    val md = java.security.MessageDigest.getInstance("MD5")
    def w(p: Int, d: Int): Double = {
      val hex = md.digest(s"$p:$d".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967295.0 - 0.5
    }
    val planeLit = typedLit((0 until LshPlanes).map(p => (1 to dims).map(w(p, _))))
    Tables.embeddings(spark, dir)
      .withColumn("planes", planeLit)
      .withColumn("bucket", expr(
        s"""aggregate(sequence(0, ${LshPlanes - 1}), cast(0 as bigint), (acc, p) ->
           |acc + if(aggregate(zip_with(embedding, element_at(planes, p + 1),
           |(x, wd) -> cast(x as double) * wd), cast(0 as double), (s, v) -> s + v) > 0,
           |shiftleft(cast(1 as bigint), p), cast(0 as bigint)))""".stripMargin))
      .drop("planes")
      .withColumn("nrm", VectorOps.norm2("embedding"))
  }

  /** Leave-one-out k-NN label-consistency accuracy — the
    * embedding-quality eval a training pipeline runs before trusting
    * vectors for retrieval (if a vector's nearest neighbours don't
    * share its label, the space hasn't separated the classes).
    * Neighbours come from the vector's own sign-LSH bucket — the
    * LABEL-FREE blocking ([[simKnnGraph]] blocks per label, which
    * would make self-label accuracy vacuously 1.0), and the same
    * bucket carve the production ANN tier serves from, so the
    * accuracy measured IS the deployed tier's. Per vector: top-k
    * same-bucket cosine neighbours (bounded-heap TopKPerGroup),
    * majority label (votes DESC, label ASC — total-ordered), compared
    * to its own; per-label rollup publishes coverage (vectors with
    * ≥1 same-bucket neighbour) beside the accuracy micro. */
  def simKnnAccuracy(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val b = lshBucketed(spark, dir)
    val a = b.select(col("vec_id").as("src"), col("label").as("slabel"),
      col("embedding").as("ea"), col("nrm").as("na"), col("bucket"))
    val c2 = b.select(col("vec_id").as("dst"), col("label").as("dlabel"),
      col("embedding").as("eb"), col("nrm").as("nb"), col("bucket"))
    val scored = a.join(c2, Seq("bucket"))
      .filter(col("src") =!= col("dst"))
      .withColumn("cosim", VectorOps.dot("ea", "eb") / (col("na") * col("nb")))
    val top = org.apache.spark.sql.graft.TopK.perGroup(
      scored, Seq("src"), Seq("cosim" -> true, "dst" -> false), k)
    val wVote = Window.partitionBy(col("src"))
      .orderBy(col("votes").desc, col("dlabel"))
    val pred = top.groupBy(col("src"), col("slabel"), col("dlabel"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("rn", row_number().over(wVote))
      .filter(col("rn") === 1)
    val total = b.groupBy(col("label")).agg(count(lit(1)).as("n_vectors"))
    pred.groupBy(col("slabel").as("label"))
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("dlabel") === col("slabel"), 1L).otherwise(0L)).as("n_correct"))
      .join(total, Seq("label"))
      .select(col("label").cast("long").as("label"), col("n_vectors"),
        col("n_eval"), col("n_correct"),
        expr("cast(n_correct * 1000000 div n_eval as bigint)").as("acc_micro"))
      .orderBy(col("label"))
  }

  def simLshAnn(spark: SparkSession, dir: String): DataFrame = {
    val bucketed = lshBucketed(spark, dir)
    val q = bucketed.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qnrm"), col("bucket"))
    val scored = broadcast(q)
      .join(bucketed, Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosim", VectorOps.dot("qe", "embedding") / (col("qnrm") * col("nrm")))
    topkPerQuery(scored)
  }

  /** Deterministic RP-tree split planes — md5-derived like the LSH
    * hyperplanes but an independent family (the "rp:" tag). Public so
    * the oracle SQL builder inlines the SAME doubles (Double.toString
    * round-trips bit-exactly through DuckDB's parser). */
  def rpPlane(p: Int, dims: Int = 64): Seq[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (1 to dims).map { d =>
      val hex = md.digest(s"rp:$p:$d".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967295.0 - 0.5
    }
  }

  private val RpDepth = 3

  /** Corpus with its random-projection-TREE leaf (depth 3 → 8
    * leaves): at each level every node splits at the exact lower
    * MEDIAN of its members' projections onto that level's plane —
    * the Annoy/RP-tree family (Dasgupta & Freund's data-dependent
    * splits), and the property sign-LSH can't give: leaves are
    * BALANCED by construction (|leaf| = n/2^depth ± depth), so probe
    * cost per query is deterministic n/8 — no hot-bucket skew to cap
    * (cf. [[Dedup.ddMinhashLsh]]'s bucketCap) and no empty cells.
    * Build cost is one per-node median exchange per level — the
    * one-time INDEX build a production system amortizes across query
    * batches (and computes from a per-node sample once leaves exceed
    * memory; exact medians here keep the oracle bit-checkable).
    * Query routing needs only the 2^depth−1 thresholds — a broadcast
    * frame — and the projections are map-side folds. */
  /** Corpus + norm + all RpDepth projections in one narrow map pass
    * (the projections don't depend on the tree). */
  private def rpProjected(spark: SparkSession, dir: String): DataFrame = {
    var base = Tables.embeddings(spark, dir)
      .withColumn("nrm", VectorOps.norm2("embedding"))
    for (p <- 0 until RpDepth) {
      base = base
        .withColumn("plane", typedLit(rpPlane(p)))
        .withColumn(s"proj$p", expr(
          """aggregate(zip_with(embedding, plane, (x, wd) -> cast(x as double) * wd),
            |cast(0 as double), (s, v) -> s + v)""".stripMargin))
        .drop("plane")
    }
    base
  }

  private def rpLeafed(spark: SparkSession, dir: String): DataFrame = {
    // all three projections in ONE map pass (they don't depend on the
    // tree), so every later stage derives from the same narrow base
    val base = rpProjected(spark, dir)
    // one pass bounds ALL levels' median buckets (the projections are
    // level-independent): min/max of each projection scaled to a
    // monotone long (×10⁹, trunc-toward-zero — monotone non-decreasing;
    // |proj| ≤ Σ|xᵢ·wᵢ| ≤ dims·max|x|/2 ~ tens, so the scaled value is
    // ~10¹⁰ ≪ 2⁶³ and the ×64 bucket arithmetic can't wrap)
    val plExprs = (0 until RpDepth)
      .map(p => s"cast(proj$p * 1000000000.0 as bigint) as pl$p")
    val bRow = base.selectExpr(plExprs: _*)
      .selectExpr((0 until RpDepth)
        .flatMap(p => Seq(s"min(pl$p)", s"max(pl$p)")): _*)
      .head()
    var frame = base.withColumn("node", lit(0))
    for (p <- 0 until RpDepth) {
      // the 2^p split thresholds ARE the index — collect them (≤ 4
      // rows) and re-inject as a literal map, so the next level's
      // lineage stays a narrow map over `base` instead of a join tree
      // that re-executes every earlier level per consumer (the
      // join-chained form measured 62 exchanges at depth 3; this one
      // keeps one median exchange per level plus the final probe).
      // lit(double) re-injects the collected threshold bit-exactly.
      //
      // The per-node exact median rides the repo's TWO-PHASE
      // distributed order statistic (the q104_weighted_median
      // device), NEVER a corpus-serial ranking window: at level 0
      // every row has node=0, so row_number().over(partitionBy(node))
      // would sort the ENTIRE corpus in one task. Instead: collapse
      // to distinct (node, projection) multiplicities, bucket by the
      // deterministic monotone scaled-long carve, distribute the
      // prefix sum (parallelism = nodes × populated buckets, each
      // within-bucket sort ~ n_distinct/64 rows), and keep the
      // smallest value whose inclusive cumulative count reaches rank
      // (n+1) div 2 — bit-identical to the rank-m value under the
      // old (proj, vec_id) serial ordering, because the rank-m VALUE
      // is invariant to the vec_id tiebreak.
      val lo = bRow.getLong(2 * p); val hi = bRow.getLong(2 * p + 1)
      val th: Map[Int, Double] = rpNodeMedians(frame, p, lo, hi)
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val thLit = map(th.toSeq.sortBy(_._1)
        .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
      frame = frame.withColumn("node", col("node") * 2 +
        when(col(s"proj$p") > element_at(thLit, col("node")), 1).otherwise(0))
    }
    frame.drop("proj0", "proj1", "proj2").withColumnRenamed("node", "leaf")
  }

  /** Bucket fan-out of the RP median device — the dial that bounds the
    * phase-2 rank task: the median bucket holds ~n/RpBuckets rows, so
    * a production 100 TB build raises this (or recurses the carve)
    * until the worst bucket fits one task — the q120 log-bucket
    * posture. */
  private val RpBuckets = 64

  /** One level's per-node exact lower medians as a ≤2^p-row frame —
    * the TWO-PHASE distributed order statistic (the q120 device the
    * r13 verdict prescribed), split out so the plan spec can assert
    * the level-0 shape (every row in node 0 — the corpus-serial
    * hazard) never sorts the corpus in one task:
    *
    *   phase 1 — one distributed groupBy pass counts rows per
    *     (node, equi-width projection bucket); the ≤ 2^p·RpBuckets
    *     count rows collect to the driver, which locates for each
    *     node the bucket holding rank m = (n+1) div 2 and the
    *     within-bucket residual rank m − (count before the bucket);
    *   phase 2 — ONLY the median bucket's rows survive the pushed
    *     bucket filter (~n/RpBuckets per node), collapse to distinct
    *     (node, value) multiplicities, and an inclusive running count
    *     over that pruned slice yields the smallest value reaching
    *     the residual rank — bit-identical to the rank-m value under
    *     the old (proj, vec_id) corpus-serial ordering, because the
    *     rank-m VALUE is invariant to the vec_id tiebreak.
    *
    * The phase-2 window partitions by node over the PRUNED slice —
    * 1/RpBuckets of the corpus, bounded by the RpBuckets dial — never
    * the full corpus the old row_number().over(partitionBy(node))
    * sorted in one task. */
  private[graft] def rpNodeMedians(frame: DataFrame, p: Int,
      lo: Long, hi: Long): DataFrame = {
    val span = Math.subtractExact(hi, lo)
    require(span < Long.MaxValue / RpBuckets, s"rpNodeMedians: proj$p span too wide")
    val bkt = expr(s"((cast(proj$p * 1000000000.0 as bigint) - cast($lo as bigint))" +
      s" * $RpBuckets) div (cast($span as bigint) + 1)")
    // phase 1: per-(node, bucket) counts — one corpus pass, tiny result
    val cells = frame.groupBy(col("node"), bkt.as("_bkt"))
      .agg(count(lit(1)).as("w"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val perNode: Map[Int, (Long, Long)] = cells.groupBy(_._1).map {
      case (node, cs) =>
        val sorted = cs.sortBy(_._2)
        val tw = sorted.map(_._3).sum
        val m = (tw + 1) / 2
        var acc = 0L; var target = -1L; var residual = 0L
        for ((_, b, w) <- sorted if target < 0) {
          if (acc + w >= m) { target = b; residual = m - acc } else acc += w
        }
        node -> (target, residual)
    }
    val bktMap = map(perNode.toSeq.sortBy(_._1)
      .flatMap { case (n, (b, _)) => Seq(lit(n), lit(b)) }: _*)
    val rnkMap = map(perNode.toSeq.sortBy(_._1)
      .flatMap { case (n, (_, r)) => Seq(lit(n), lit(r)) }: _*)
    // phase 2: rank only inside each node's median bucket. Collapsed
    // (node, value) rows are distinct in pv, so the default RANGE
    // window frame's inclusive running count is exact.
    val wCum = Window.partitionBy(col("node")).orderBy(col("pv"))
    frame
      .withColumn("_bkt", bkt)
      .filter(col("_bkt") === element_at(bktMap, col("node")))
      .groupBy(col("node"), col(s"proj$p").as("pv"))
      .agg(count(lit(1)).as("w"))
      .withColumn("cw", sum(col("w")).over(wCum))
      .filter(col("cw") >= element_at(rnkMap, col("node")))
      .groupBy(col("node")).agg(min(col("pv")).as("med"))
  }

  /** Level-0 median frame over the real corpus — the plan-spec hook:
    * builds the projected base with every row in node 0 and returns
    * the (uncollected) median frame whose physical plan the spec
    * string-parses. */
  private[graft] def rpLevel0MedianFrame(spark: SparkSession, dir: String): DataFrame = {
    val base = rpProjected(spark, dir)
    val b = base.selectExpr("cast(proj0 * 1000000000.0 as bigint) as pl0")
      .selectExpr("min(pl0)", "max(pl0)").head()
    rpNodeMedians(base.withColumn("node", lit(0)), 0, b.getLong(0), b.getLong(1))
  }

  /** RP-tree ANN (the tree rung of the ANN ladder, beside IVF /
    * sign-LSH / NSW): queries probe exactly their own leaf — a
    * guaranteed n/2^depth slice thanks to the median splits — and
    * brute-force it. Demo queries are corpus members, so their routed
    * leaf IS their build-time leaf (same thresholds, same
    * projections); an out-of-corpus query would route through the
    * broadcast threshold frame with three map-side plane folds. */
  def simRpTree(spark: SparkSession, dir: String): DataFrame = {
    val leafed = rpLeafed(spark, dir)
    val q = leafed.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qnrm"), col("leaf"))
    val scored = broadcast(q)
      .join(leafed, Seq("leaf"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosim", VectorOps.dot("qe", "embedding") / (col("qnrm") * col("nrm")))
    topkPerQuery(scored)
  }

  /** RP-tree recall@k vs the exact brute-force top-k — the accuracy
    * audit published next to [[simRecallReport]] (IVF) and
    * [[simNswRecall]]: one number per query, so the three ANN tiers'
    * recall/cost trade-offs compare on the same table. */
  def simRpRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = simTopkBruteforce(spark, dir)
      .select(col("query_id"), col("vec_id"))
    val approx = simRpTree(spark, dir)
      .select(col("query_id").as("qa"), col("vec_id").as("va"))
    exact
      .join(approx, col("query_id") === col("qa") && col("vec_id") === col("va"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k"),
        sum(when(col("va").isNotNull, 1L).otherwise(0L)).as("n_hit"))
      .select(col("query_id"), col("k"), col("n_hit"),
        (col("n_hit") / col("k")).as("recall_at_k"))
      .orderBy(col("query_id"))
  }

  /** Matryoshka truncation audit: how much of each embedding's energy
    * (and cosine fidelity) survives keeping only the first `keep`
    * dims — the check run before shipping truncated vectors to a
    * cheaper ANN tier. cos(full, truncate-and-pad) reduces to
    * ‖v₁..ₖ‖/‖v‖, so the whole audit is two sequential folds per row
    * (bit-identical to the oracle's list_sum) and one
    * IEEE-exact sqrt. Pure projection: fuses into the scan, zero
    * shuffle at any scale. */
  def simMatryoshka(spark: SparkSession, dir: String, keep: Int = 16): DataFrame =
    Tables.embeddings(spark, dir)
      .withColumn("e2_full", expr(
        "aggregate(embedding, cast(0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double))"))
      .withColumn("e2_head", expr(
        s"aggregate(slice(embedding, 1, $keep), cast(0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double))"))
      .filter(col("e2_full") > 0)
      .select(col("vec_id"), col("label"),
        round(col("e2_head") / col("e2_full"), 6).as("energy_kept"),
        round(sqrt(col("e2_head") / col("e2_full")), 6).as("cos_trunc"))
      .orderBy(col("vec_id"))
  /** Cosine RANGE search: every corpus vector within a similarity
    * radius of each query (the "find all sufficiently similar"
    * variant of top-k — recall-complete, no k cutoff). Same scale
    * shape as the brute-force baseline: queries broadcast, corpus
    * never shuffled, the filter runs map-side so only hits move. The
    * threshold compare is safe for the oracle because the cosine
    * doubles are bit-identical to the oracle's formula (norms
    * precomputed, IEEE mul/div correctly rounded). */
  def simRangeSearch(spark: SparkSession, dir: String, tau: Double = 0.25): DataFrame = {
    val c = corpus(spark, dir)
    broadcast(queries(c)).crossJoin(c)
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosim", VectorOps.dot("qe", "embedding") / (col("qnrm") * col("nrm")))
      .filter(col("cosim") >= tau)
      .select(col("qid").as("query_id"), col("vec_id"),
        round(col("cosim"), 6).as("score"))
      .orderBy(col("query_id"), col("vec_id"))
  }

  /** k-NN graph construction (the base layer an HNSW/NSW index or a
    * graph-based semdedup consumes): every vector's top-3 cosine
    * neighbours within its label cell. Candidate pairs stay cell-
    * blocked (Σ|cell|², same scale dial as [[Dedup.ddEmbedCos]]), and
    * per-source pruning runs through the bounded-heap TopKPerGroup
    * operator — the exchange carries ≤ vectors·k rows, never whole
    * candidate lists. */
  def simKnnGraph(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val c = corpus(spark, dir)
    val a = c.select(col("vec_id").as("src_id"), col("label"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = c.select(col("vec_id").as("dst_id"), col("label"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    val scored = a.join(b, Seq("label"))
      .filter(col("src_id") =!= col("dst_id"))
      .withColumn("cosim", VectorOps.dot("ea", "eb") / (col("na") * col("nb")))
    val pruned = org.apache.spark.sql.graft.TopK.perGroup(
      scored, Seq("src_id"), Seq("cosim" -> true, "dst_id" -> false), k)
    val w = Window.partitionBy(col("src_id")).orderBy(col("cosim").desc, col("dst_id"))
    pruned
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .select(col("src_id"), col("rank"), col("dst_id"),
        round(col("cosim"), 6).as("score"))
      .orderBy(col("src_id"), col("rank"))
  }

  /** Contrastive HARD-NEGATIVE mining: per query, the top-k most
    * cosine-similar vectors with a DIFFERENT label — the negatives a
    * contrastive/embedding trainer wants (maximally confusable, not
    * random). Same plan shape as [[simTopkBruteforce]] (tiny query set
    * broadcast, map-side scoring, bounded-heap TopKPerGroup before the
    * |Q|·k exchange) with the cross-label constraint as a map-side
    * filter; at scale the exact config swaps for the IVF-probed
    * variant exactly as ANN serving does — the label filter commutes
    * with cell pruning. */
  def simHardNegatives(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val c = corpus(spark, dir)
    val q = c.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("embedding").as("qe"), col("nrm").as("qnrm"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("label") =!= col("qlabel"))
      .withColumn("cosim", VectorOps.dot("qe", "embedding") / (col("qnrm") * col("nrm")))
    val pruned = org.apache.spark.sql.graft.TopK.perGroup(
      scored, Seq("qid"), Seq("cosim" -> true, "vec_id" -> false), k)
    val w = Window.partitionBy(col("qid")).orderBy(col("cosim").desc, col("vec_id"))
    pruned
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .select(col("qid").as("query_id"), col("rank"), col("vec_id"),
        col("label").cast("long").as("neg_label"),
        round(col("cosim"), 6).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The IVF-probed SCALE PATH of [[simHardNegatives]]: hard negatives
    * served the way ANN serving would — each query probes its top-2
    * FOREIGN cells (centroid cosine over cells with label ≠ the
    * query's; the cross-label constraint commutes with cell pruning
    * because cells here are label blocks) and scans only those, so the
    * per-query work is |probed cells|/|cells| of the corpus instead of
    * the brute-force full scan. Same exact-decimal centroids and
    * bounded-heap top-k as [[simIvfAnn]]; recall vs the exact config
    * is measured in the spec. */
  def simHardNegativesIvf(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val c = corpus(spark, dir)
    val cent = c
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(expr("cast(sum(cast(v as decimal(18,9))) as double) / count(*)").as("c"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)").as("cv"))
    val q = c.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("embedding").as("qe"), col("nrm").as("qnrm"))
    val cellScores = broadcast(q)
      .crossJoin(broadcast(cent))
      .filter(col("label") =!= col("qlabel"))
      .withColumn("cs", VectorOps.dotHof("qe", "cv") / (col("qnrm") * VectorOps.norm2Hof("cv")))
    val wCell = Window.partitionBy(col("qid")).orderBy(col("cs").desc, col("label"))
    val cells = cellScores
      .withColumn("rn", row_number().over(wCell))
      .filter(col("rn") <= 2)
      .select(col("qid"), col("label"), col("qe"), col("qnrm"))
    val scored = cells
      .join(c, Seq("label"))
      .withColumn("cosim", VectorOps.dot("qe", "embedding") / (col("qnrm") * col("nrm")))
    val pruned = org.apache.spark.sql.graft.TopK.perGroup(
      scored, Seq("qid"), Seq("cosim" -> true, "vec_id" -> false), k)
    val w = Window.partitionBy(col("qid")).orderBy(col("cosim").desc, col("vec_id"))
    pruned
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .select(col("qid").as("query_id"), col("rank"), col("vec_id"),
        col("label").cast("long").as("neg_label"),
        round(col("cosim"), 6).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** ANN quality report: recall@10 of the IVF index versus the
    * brute-force exact top-k, per query — the accuracy/cost readout
    * every index deployment publishes. Both sides are deterministic
    * (tie-broken rankings), so the recall is oracle-checkable; the
    * join is on the tiny |Q|·k result sets. */
  def simRecallReport(spark: SparkSession, dir: String): DataFrame = {
    val exact = simTopkBruteforce(spark, dir)
      .select(col("query_id"), col("vec_id"))
    val approx = simIvfAnn(spark, dir)
      .select(col("query_id").as("qa"), col("vec_id").as("va"))
    exact
      .join(approx, col("query_id") === col("qa") && col("vec_id") === col("va"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k"),
        sum(when(col("va").isNotNull, 1L).otherwise(0L)).as("n_hit"))
      .select(col("query_id"), col("k"), col("n_hit"),
        (col("n_hit") / col("k")).as("recall_at_k"))
      .orderBy(col("query_id"))
  }

  /** Product-quantization codes: the 64-dim vector splits into 8
    * subspaces of 8 dims; each subspace carries its own codebook (the
    * per-label means over that slice — exact-decimal sums, tiny and
    * broadcast) and every vector stores only its per-subspace
    * nearest-centroid id — the 64-float → 8-code compression a 100 TB
    * vector store applies before ANN serving. Assignment is map-side
    * behind the broadcast; the only windows are 10-row argmins per
    * (vector, subspace). Long-form output (vec_id, sub, code) with a
    * deterministic label tie-break. */
  def simPqCodes(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val cent = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("p", "v")))
      .groupBy(col("label"), expr("p div 8").as("sub"), col("p"))
      .agg(expr("cast(sum(cast(v as decimal(18,9))) as double) / count(*)").as("c"))
      .groupBy(col("label"), col("sub"))
      .agg(expr("transform(array_sort(collect_list(struct(p, c))), x -> x.c)").as("cv"))
      .select(col("label").as("clabel"), col("sub"), col("cv"))
    val sub = e.select(col("vec_id"), col("embedding"),
        explode(expr("sequence(0, 7)")).as("sub"))
      .withColumn("sv", expr("slice(embedding, sub * 8 + 1, 8)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"), col("sub")).orderBy(col("dist"), col("clabel"))
    sub.join(broadcast(cent), "sub")
      .withColumn("dist", expr(
        "aggregate(zip_with(sv, cv, (x, c) -> (cast(x as double) - c) * (cast(x as double) - c)), cast(0 as double), (acc, v) -> acc + v)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("sub").cast("bigint").as("sub"),
        col("clabel").cast("bigint").as("code"))
      .orderBy(col("vec_id"), col("sub"))
  }

  /** PQ quantization-error energy per subspace — the fidelity audit of
    * the compression tier: Σ‖x_sub − c_{sub,code(x)}‖² over the corpus
    * for each of the 8 subspaces (which slice of the vector loses the
    * most information to 8× compression). The assignment distance IS
    * the residual, so this is [[simPqCodes]]' argmin pass with the
    * distance kept: per-row float folds are deterministic fixed-order,
    * cross-row reduction is rounded-then-DECIMAL (the sim_inertia
    * discipline). 8-row output. */
  def simPqResidual(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    // ADC-style ORDER-PINNED centroid fold (vec_id order), NOT the
    // decimal-cast mean the argmin-only simPqCodes uses: float→decimal
    // casts round differently between engines (shortest decimal rep vs
    // exact binary), which an argmin absorbs but an emitted energy sum
    // cannot — the off-by-one-micro failures this op first gated with
    val cent = e
      .select(col("label"), col("vec_id"), posexplode(col("embedding")).as(Seq("p", "v")))
      .groupBy(col("label"), col("p"))
      .agg(expr(
        """aggregate(transform(array_sort(collect_list(struct(vec_id, v))),
          | x -> cast(x.v as double)), cast(0 as double), (acc, y) -> acc + y)""".stripMargin)
        .as("s"), count(lit(1)).as("n"))
      .withColumn("c", col("s") / col("n"))
      .groupBy(col("label"), expr("p div 8").as("sub"))
      .agg(expr("transform(array_sort(collect_list(struct(p, c))), x -> x.c)").as("cv"))
      .select(col("label").as("clabel"), col("sub"), col("cv"))
    val sub = e.select(col("vec_id"), col("embedding"),
        explode(expr("sequence(0, 7)")).as("sub"))
      .withColumn("sv", expr("slice(embedding, sub * 8 + 1, 8)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"), col("sub")).orderBy(col("dist"), col("clabel"))
    sub.join(broadcast(cent), "sub")
      .withColumn("dist", expr(
        "aggregate(zip_with(sv, cv, (x, c) -> (cast(x as double) - c) * (cast(x as double) - c)), cast(0 as double), (acc, v) -> acc + v)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("sub").cast("bigint").as("sub"))
      // floor(x·1e6 + 0.5), NOT round(x, 6): an 8-dim residual landed on
      // an exact representable half and Spark/DuckDB round() disagreed by
      // one ulp of the 6th decimal — the floor device is identical IEEE
      // arithmetic in both engines (the simQuantize precedent)
      .agg(count(lit(1)).as("n_vecs"),
        sum(expr("cast(floor(dist * 1000000 + 0.5) as bigint)")).as("energy_micro"),
        max(expr("cast(floor(dist * 1000000 + 0.5) as bigint)")).as("max_residual_micro"))
      .orderBy(col("sub"))
  }

  /** Asymmetric-distance (ADC) top-k over the PQ compression tier —
    * the query path that makes [[simPqCodes]] useful: each candidate
    * is scored from its 8 codebook ids alone (never its raw vector),
    * adc(q, v) = Σ_sub ‖q_sub − c_{sub, code_v}‖². Queries are
    * broadcast; the candidate side carries only (vec_id, sub, code) —
    * at 100 TB that is the entire point of PQ, the corpus scan touches
    * 8 small ints per vector. Both the 8-dim subspace distance and the
    * 8-subspace total run as explicit LEFT FOLDS in index order, so
    * the emitted doubles are bit-identical to the oracle (a bare
    * float groupBy-sum would be partition-order-dependent). Top-k per
    * query goes through the bounded-heap rewrite with a (dist, vec_id)
    * total order. */
  def simPqAdc(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    // distance codebook: centroid means via an ORDER-PINNED double fold
    // (vec_id order), NOT the decimal-cast mean simPqCodes uses for its
    // argmin — Spark and DuckDB round float→decimal differently (shortest
    // decimal rep vs exact binary value), which an argmin absorbs but an
    // emitted distance cannot
    val cent = e
      .select(col("label"), col("vec_id"), posexplode(col("embedding")).as(Seq("p", "v")))
      .groupBy(col("label"), col("p"))
      .agg(expr(
        """aggregate(transform(array_sort(collect_list(struct(vec_id, v))),
          | x -> cast(x.v as double)), cast(0 as double), (acc, y) -> acc + y)""".stripMargin)
        .as("s"), count(lit(1)).as("n"))
      .withColumn("c", col("s") / col("n"))
      .groupBy(col("label"), expr("p div 8").as("sub"))
      .agg(expr("transform(array_sort(collect_list(struct(p, c))), x -> x.c)").as("cv"))
      .select(col("label").cast("bigint").as("clabel"), col("sub").as("csub"), col("cv"))
    val codes = simPqCodes(spark, dir)
    val queries = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val terms = codes
      .join(broadcast(cent), codes("sub") === col("csub") && codes("code") === col("clabel"))
      .crossJoin(broadcast(queries))
      .withColumn("term", expr(
        """aggregate(zip_with(slice(q_emb, cast(sub * 8 + 1 as int), 8), cv,
          | (x, c) -> (cast(x as double) - c) * (cast(x as double) - c)),
          | cast(0 as double), (acc, v) -> acc + v)""".stripMargin))
    val adc = terms.groupBy(col("q_id"), col("vec_id"))
      .agg(expr(
        """aggregate(transform(array_sort(collect_list(struct(sub, term))), x -> x.term),
          | cast(0 as double), (acc, v) -> acc + v)""".stripMargin).as("adc_dist"))
      .filter(col("vec_id") =!= col("q_id"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc_dist"), col("vec_id"))
    adc.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"), col("adc_dist"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Two-stage retrieval: PQ-ADC candidate generation RE-RANKED exact
    * — THE production vector-serving shape (FAISS/ScaNN style): the
    * compressed-code scan proposes candK=20 candidates per query at
    * 8-bytes-a-vector cost, then ONLY those ≤ |Q|·candK rows fetch
    * their raw embeddings for the exact L2 re-rank that fixes the
    * quantization error ordering. At 100 TB the first stage scans
    * codes (32× smaller than raw floats), the second touches
    * candidates only — the raw embedding table is probed by vec_id,
    * never scanned. Distances are order-pinned double folds, identical
    * in both engines. */
  def simPqRerank(spark: SparkSession, dir: String,
      candK: Int = 20, k: Int = 5): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val queries = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val cand = simPqAdc(spark, dir, candK).select(col("q_id"), col("vec_id"))
    cand
      .join(broadcast(queries), Seq("q_id"))
      .join(e.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .withColumn("dist", expr(
        """aggregate(zip_with(q_emb, embedding,
          | (x, y) -> (cast(x as double) - cast(y as double)) * (cast(x as double) - cast(y as double))),
          | cast(0 as double), (acc, v) -> acc + v)""".stripMargin))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("dist"), col("vec_id"))).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"), col("dist"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** IVF-PQ composite with RESIDUAL encoding — the full FAISS-style
    * `IndexIVFPQ` serving shape, composing the two prune axes the
    * family so far exercises separately: [[simIvfAnn]] bounds WHICH
    * vectors are scanned (nprobe cells), [[simPqAdc]] bounds WHAT is
    * read per vector (8 codes, never raw floats). The honest part is
    * the residual: vectors are PQ-coded as r = x − centroid(cell(x))
    * (what survives after the coarse quantizer explains the cell —
    * residuals are near-centered so a shared codebook spends its
    * codewords on fine structure, the reason real IVFPQ encodes
    * residuals), and a query's residual DIFFERS PER PROBED CELL
    * (q − that cell's centroid), so the ADC lookup table is rebuilt
    * per (query, cell) exactly as FAISS does. The shared residual
    * codebook is a one-assignment-step quantizer seeded from the
    * deterministic vec_id%16 grouping (the [[simKmeansStep]] "one
    * Lloyd iteration" convention — k-means iterated IS this operator's
    * codebook loop). All emitted distances go through ORDER-PINNED
    * double folds (vec_id order for means, sub order for the ADC sum),
    * bit-identical in both engines; argmins absorb their fold order.
    *
    * 100 TB shape: cell centroids (#cells rows) and the codebook
    * (16×8 rows) broadcast; the query probe table (|Q|·nprobe rows,
    * carrying per-cell query residuals) broadcasts into the code
    * table, whose join on the cell label IS the inverted-file read —
    * only probed cells' codes are touched, 8 small ints per candidate;
    * the raw embedding table is scanned once to build codes and never
    * again at query time. */
  /** The PERSISTABLE parts of the IVF-PQ index — (cell centroids,
    * residual codebook, codes). Factored from [[ivfpqIndex]] so the
    * serving lake ([[graft.streaming.Streams]].ivfpqLakeWrite) writes
    * EXACTLY the frames the gated batch operator scores with — one
    * builder, no drift. */
  private[graft] def ivfpqIndexParts(spark: SparkSession, dir: String):
      (DataFrame, DataFrame, DataFrame) = {
    // r15 MEASURED DECLINE — do not persist these frames: the static
    // plan scans the embeddings parquet 16× (every consumer reference
    // re-derives its subtree), so persisting cellCent/cb/codes looked
    // like an obvious §1.2 win. Implemented and measured at sf0.1
    // (full interleaved bench, two runs, untouched controls ~1.1×
    // drift): sim_ivfpq 2.51→3.76 s, sim_ivfpq_probe_curve
    // 0.72→4.79 s, sim_ivfpq_recall 0.72→4.20 s — a 1.5–6.6×
    // REGRESSION, reverted. Mechanism: at runtime the duplicated
    // subtrees were already cheap (AQE reuses the broadcast exchanges;
    // the branches' stages run CONCURRENTLY inside one job), while
    // eager cache materialization serializes the DAG into a chain of
    // cache-build jobs with a barrier each and inserts columnar
    // conversion boundaries that break whole-stage fusion. The
    // lake writer (one consumer per frame, terminal writes) never
    // needed it either.
    val e = Tables.embeddings(spark, dir)
    val pinnedMean = expr(
      """aggregate(transform(array_sort(collect_list(struct(vec_id, v))),
        | x -> cast(x.v as double)), cast(0 as double), (acc, y) -> acc + y)""".stripMargin)
    // coarse quantizer: per-cell centroids, order-pinned (residuals
    // flow into emitted distances, so no decimal-cast shortcut here)
    val cellCent = e
      .select(col("label"), col("vec_id"), posexplode(col("embedding")).as(Seq("p", "v")))
      .groupBy(col("label"), col("p"))
      .agg(pinnedMean.as("s"), count(lit(1)).as("n"))
      .withColumn("c", col("s") / col("n"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(p, c))), x -> x.c)").as("cellv"))
    // residuals r = x - centroid(cell(x)): array<double>, map-side
    val resid = e.join(broadcast(cellCent), Seq("label"))
      .withColumn("r", expr("zip_with(embedding, cellv, (x, c) -> cast(x as double) - c)"))
      .select(col("vec_id"), col("label"), col("r"))
    // shared residual codebook: 16 codewords per subspace, vec_id%16 seed
    val cb = resid
      .select(expr("vec_id % 16").as("g"), col("vec_id"),
        posexplode(col("r")).as(Seq("p", "v")))
      .groupBy(col("g"), col("p"))
      .agg(pinnedMean.as("s"), count(lit(1)).as("n"))
      .withColumn("c", col("s") / col("n"))
      .groupBy(col("g"), expr("p div 8").as("sub"))
      .agg(expr("transform(array_sort(collect_list(struct(p, c))), x -> x.c)").as("cv"))
    // codes: per (vector, subspace) argmin over the 16 codewords —
    // r14: min_by over struct(dist, g) instead of the r13 row_number
    // window (same (dist, g) tie-break, same argmin), so the 16-way
    // candidate expansion partial-aggregates map-side inside the join
    // stage instead of shuffling all candidates into a sort
    val subRes = resid.select(col("vec_id"), col("label"), col("r"),
        explode(expr("sequence(0, 7)")).as("sub"))
      .withColumn("sv", expr("slice(r, sub * 8 + 1, 8)"))
    val codes = subRes.join(broadcast(cb), Seq("sub"))
      .withColumn("dist", expr(
        "aggregate(zip_with(sv, cv, (x, c) -> (x - c) * (x - c)), cast(0 as double), (acc, v) -> acc + v)"))
      .groupBy(col("vec_id"), col("label"), col("sub"))
      .agg(expr("min_by(g, struct(dist, g))").as("code"))
      .select(col("vec_id"), col("label"), col("sub"), col("code"))
    (cellCent, cb, codes)
  }

  /** The shared IVFPQ index build — (queries, cell centroids ranked
    * per query with per-cell query residuals, codebook, codes). Every
    * expression here is the one [[simIvfpq]] gates; the probe curve
    * reuses the identical build so the two operators cannot drift. */
  private def ivfpqIndex(spark: SparkSession, dir: String):
      (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val e = Tables.embeddings(spark, dir)
    val (cellCent, cb, codes) = ivfpqIndexParts(spark, dir)
    // query cells ranked by exact L2 to the centroid, each carrying
    // the PER-CELL query residual (rn = the probe rank; consumers cut
    // at their nprobe)
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("qdist"), col("label"))
    val ranked = q.crossJoin(broadcast(cellCent))
      .withColumn("qdist", expr(
        """aggregate(zip_with(q_emb, cellv, (x, c) -> (cast(x as double) - c) * (cast(x as double) - c)),
          | cast(0 as double), (acc, v) -> acc + v)""".stripMargin))
      .withColumn("rn", row_number().over(wProbe))
      .withColumn("qr", expr("zip_with(q_emb, cellv, (x, c) -> cast(x as double) - c)"))
      .select(col("q_id"), col("label"), col("qr"), col("rn"))
    (q, ranked, cb, codes)
  }

  /** ADC of the probed-cell candidates against a probe table
    * (q_id, label, qr) — the shared query path of [[simIvfpq]] and
    * [[simIvfpqProbeCurve]]. */
  private def ivfpqAdc(codes: DataFrame, cb: DataFrame,
      probes: DataFrame): DataFrame = {
    // ADC over probed cells only: the label join is the inverted-file
    // read — un-probed cells' codes never leave the scan. When the
    // probe table carries its probe rank `rn` (the r14 probe-curve
    // shape: ONE ADC pass at maxProbe, sliced by rank downstream), the
    // rank rides the rollup as `prn` — constant within a (q_id, label)
    // probe, so max() is pure carry-through.
    val terms = codes
      .join(broadcast(probes), Seq("label"))
      .join(broadcast(cb.select(col("g").as("code"), col("sub"), col("cv"))),
        Seq("sub", "code"))
      .withColumn("term", expr(
        """aggregate(transform(sequence(1, 8), j ->
          | (element_at(qr, cast(sub * 8 + j as int)) - element_at(cv, j))
          | * (element_at(qr, cast(sub * 8 + j as int)) - element_at(cv, j))),
          | cast(0 as double), (acc, v) -> acc + v)""".stripMargin))
    val distAgg = expr(
      """aggregate(transform(array_sort(collect_list(struct(sub, term))), x -> x.term),
        | cast(0 as double), (acc, v) -> acc + v)""".stripMargin).as("adc_dist")
    val rolled =
      if (probes.columns.contains("rn"))
        terms.groupBy(col("q_id"), col("vec_id"), col("label"))
          .agg(distAgg, max(col("rn")).as("prn"))
      else
        terms.groupBy(col("q_id"), col("vec_id"), col("label"))
          .agg(distAgg)
    rolled.filter(col("vec_id") =!= col("q_id"))
  }

  /** Exact L2 top-k ids per query — the shared exact side of the ANN
    * recall audits: queries broadcast, the corpus scans ONCE, and the
    * distance fold is the native codegen'd squared-L2 expression
    * (FloatVecL2Sq — bit-identical to the interpreted
    * `aggregate(zip_with(...))` HOF it replaced, r10 verdict next #3). */
  private def exactL2TopK(e: DataFrame, q: DataFrame, k: Int): DataFrame = {
    val exact = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("dist",
        graft.functions.VectorOps.l2sq(col("q_emb"), col("embedding")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("dist"), col("vec_id"))
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"))
  }

  def simIvfpq(spark: SparkSession, dir: String, nprobe: Int = 2,
      k: Int = 5): DataFrame = {
    val (_, ranked, cb, codes) = ivfpqIndex(spark, dir)
    val probes = ranked.filter(col("rn") <= nprobe)
      .select(col("q_id"), col("label"), col("qr"))
    val adc = ivfpqAdc(codes, cb, probes)
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("adc_dist"), col("vec_id"))
    adc.withColumn("rank", row_number().over(wTop).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"),
        col("label").cast("bigint").as("cell"), col("adc_dist"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** IVFPQ recall-vs-nprobe curve — THE tuning readout for the
    * composite tier ([[simIvfpqRecall]] audits one operating point;
    * this sweeps nprobe 1..maxProbe so a deployment picks the probe
    * depth where recall plateaus against candidate cost). For each
    * nprobe: candidates = codes in the top-p cells, ADC-ranked top-k,
    * overlapped with the exact L2 top-k; emits the candidate count
    * (the COST axis) next to recall (the BENEFIT axis), recall_micro
    * as the exact integer ratio. Candidate sets are NESTED in nprobe
    * (cost is monotone by construction); recall is typically — but
    * not provably — monotone: a wider candidate set can admit a
    * quantization-misordered vector whose ADC distance beats a true
    * neighbor's and push an exact hit out of the ADC top-k, so the
    * spec pins n_candidates monotone and records recall as an
    * observation. Scale shape: one probe table per p (|Q|·p rows,
    * broadcast), the same inverted-file label join; the sweep
    * multiplies query-side work only, never corpus passes. */
  def simIvfpqProbeCurve(spark: SparkSession, dir: String,
      maxProbe: Int = 4, k: Int = 5): DataFrame = {
    val (q, ranked, cb, codes) = ivfpqIndex(spark, dir)
    val e = Tables.embeddings(spark, dir)
    val exactTop = exactL2TopK(e, q, k)
    // r14: candidate sets are NESTED in nprobe (a cell probed at rank
    // r is probed at every p >= r), so ONE ADC pass at maxProbe with
    // the probe rank carried replaces the r13 per-p loop that re-ran
    // the codes⋈probes⋈codebook term join maxProbe times. Each
    // candidate explodes to the p values that see it (≤ maxProbe tiny
    // rows), and the per-p counts / ADC top-k / recall overlaps are
    // per-(q_id, p) windows over that one table — identical values at
    // every operating point (before/after in OPTIMIZATION_r14.md).
    val probes = ranked.filter(col("rn") <= maxProbe)
      .select(col("q_id"), col("label"), col("qr"), col("rn"))
    val adc = ivfpqAdc(codes, cb, probes)
    val adcp = adc.withColumn("p", explode(expr(s"sequence(prn, $maxProbe)")))
    val nCand = adcp.groupBy(col("p")).agg(count(lit(1)).as("n_candidates"))
    val wTop = Window.partitionBy(col("q_id"), col("p"))
      .orderBy(col("adc_dist"), col("vec_id"))
    val annTop = adcp.withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("p"), col("q_id"), col("vec_id"), lit(1L).as("hit"))
    val exactAll = exactTop
      .withColumn("p", explode(expr(s"sequence(1, $maxProbe)")))
    exactAll.join(annTop, Seq("p", "q_id", "vec_id"), "left")
      .groupBy(col("p"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .join(broadcast(nCand), Seq("p"), "left")
      .select(col("p").cast("bigint").as("nprobe"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        col("n_exact"), col("n_hits"),
        expr("n_hits * 1000000 div n_exact").as("recall_micro"))
      .orderBy(col("nprobe"))
  }

  /** IVFPQ recall@k — the end-to-end accuracy audit of the composed
    * serving path ([[simIvfpq]]): exact L2 top-k per query overlapped
    * with the IVF-PQ answer, folding BOTH loss sources into one
    * number — coarse-probe misses (the true neighbor's cell was not
    * among the nprobe probed) and residual-quantization misorderings
    * (ADC ranked a worse vector higher). The per-tier audits exist
    * separately ([[simIvfProbeCurve]] for cell recall, [[simPqRecall]]
    * for code loss); a deployment tunes nprobe and codebook size
    * against THIS composite curve. Same scale shape as the other
    * recall audits: one broadcast-query corpus scan per side, pairs
    * never materialize beyond queries × corpus. */
  def simIvfpqRecall(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    // the exact side takes its queries from the SAME ivfpqIndex build
    // the serving path uses (the shared `q` frame — the query
    // predicate lives in ONE place, so the two sides cannot drift;
    // r10 advice), and the ANN side IS simIvfpq's gated answer
    val (q, _, _, _) = ivfpqIndex(spark, dir)
    val e = Tables.embeddings(spark, dir)
    val exactTop = exactL2TopK(e, q, k)
    val annTop = simIvfpq(spark, dir, k = k)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    exactTop.join(annTop, Seq("q_id", "vec_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_overlap"),
        expr("array_join(transform(sort_array(collect_list(vec_id)), x -> cast(x as string)), ',')")
          .as("exact_ids"))
      .orderBy(col("q_id"))
  }

  /** PQ recall@k — the accuracy audit that decides whether the ADC
    * tier is usable: exact L2 top-k per query (order-pinned 64-dim
    * fold, broadcast queries, bounded-heap top-k) overlapped with
    * [[simPqAdc]]'s code-only answer. Emits integer overlap counts
    * plus the exact id list for eyeballing; the 8/64 quantization is
    * lossy by design, and this is the query that quantifies the loss.
    * Same scale shape as the ANN paths: the corpus is scanned once per
    * side, pairs never materialize beyond queries × corpus. */
  def simPqRecall(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val queries = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val exactTop = exactL2TopK(e, queries, k)
    val adcTop = simPqAdc(spark, dir, k)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    exactTop.join(adcTop, Seq("q_id", "vec_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_overlap"),
        expr("array_join(transform(sort_array(collect_list(vec_id)), x -> cast(x as string)), ',')")
          .as("exact_ids"))
      .orderBy(col("q_id"))
  }

  /** Simplified silhouette per cluster — the separation audit that
    * completes the k-means family ([[simKmeansStep]] assigns,
    * [[simInertia]] measures tightness, this measures tightness vs the
    * nearest OTHER cluster): a(i) = squared L2 to the own centroid,
    * b(i) = min squared L2 to any other centroid, s = (b−a)/max(a,b).
    * Squared distances are monotone-equivalent for the min and keep
    * the whole pipeline sqrt-free. Same scale shape as the step:
    * centroids broadcast (10 rows), per-point work is map-side.
    * Parity discipline: the distance folds can drift an ulp between
    * engines, so each dist rounds to 6 decimals FIRST (the
    * [[simInertia]] rule) and everything after runs in exact integer
    * micro-units — s_micro = ((B−A+G)·10⁶ div G) − 10⁶ with
    * G = max(A,B), the +G shift keeping the numerator non-negative so
    * both engines' integer division truncates identically. No float
    * quotient ever feeds a floor/round. n_well_placed counts B > A. */
  def simSilhouette(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val cent = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(expr("cast(sum(cast(v as decimal(18,9))) as double) / count(*)").as("c"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)").as("cv"))
      .select(col("label").as("clabel"), col("cv"))
    val ab = e.crossJoin(broadcast(cent))
      .withColumn("dist", expr(
        "aggregate(zip_with(embedding, cv, (x, c) -> (cast(x as double) - c) * (cast(x as double) - c)), cast(0 as double), (acc, v) -> acc + v)"))
      .groupBy(col("vec_id"), col("label"))
      .agg(min(when(col("clabel") === col("label"), col("dist"))).as("a_dist"),
        min(when(col("clabel") =!= col("label"), col("dist"))).as("b_dist"))
      .withColumn("am", expr(
        "cast(cast(round(a_dist, 6) as decimal(18,6)) * 1000000 as bigint)"))
      .withColumn("bm", expr(
        "cast(cast(round(b_dist, 6) as decimal(18,6)) * 1000000 as bigint)"))
      .withColumn("g", greatest(col("am"), col("bm")))
      .withColumn("s_micro", expr(
        "(bm - am + g) * 1000000 div greatest(g, 1) - 1000000"))
    ab.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("s_micro")).as("s_sum_micro"),
        sum(when(col("bm") > col("am"), 1L).otherwise(0L)).as("n_well_placed"))
      .withColumn("mean_silhouette",
        expr("cast(s_sum_micro as double) / 1000000.0 / n_vecs"))
      .orderBy(col("label"))
  }

  /** Binary sign-bit ANN: each 64-dim vector compresses to two 32-bit
    * sign words (bit i set iff dim i > 0) and top-k runs on Hamming
    * distance `bit_count(xor)` — the 32×-compression tier a 100 TB
    * vector store serves first, before any float rerank. Code
    * construction is a pure projection (two sequence folds, integer
    * adds — fuses into the scan); probes broadcast; distances are
    * exact integers so the ranking is oracle-checkable bit-for-bit.
    * The per-query cut runs through the bounded-heap TopKPerGroup
    * operator — the exchange carries ≤ |Q|·k rows. Two 32-bit words
    * rather than one 64-bit word keep bit 63 out of the sign
    * position on both engines. */
  def simHammingTopk(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    def word(lo: Int): String =
      s"""aggregate(sequence($lo, ${lo + 31}), cast(0 as bigint),
         | (acc, i) -> acc + CASE WHEN element_at(embedding, i + 1) > cast(0 as float)
         |   THEN shiftleft(cast(1 as bigint), i - $lo) ELSE cast(0 as bigint) END)""".stripMargin
    val codes = Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr(word(0)).as("w1"), expr(word(32)).as("w2"))
    val probes = codes.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("w1").as("qw1"), col("w2").as("qw2"))
    val scored = broadcast(probes).crossJoin(codes)
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("hamming",
        expr("cast(bit_count(qw1 ^ w1) + bit_count(qw2 ^ w2) as bigint)"))
    val pruned = org.apache.spark.sql.graft.TopK.perGroup(
      scored, Seq("qid"), Seq("hamming" -> false, "vec_id" -> false), k)
    val w = Window.partitionBy(col("qid")).orderBy(col("hamming"), col("vec_id"))
    pruned.withColumn("rank", row_number().over(w).cast("bigint"))
      .select(col("qid").as("query_id"), col("rank"), col("vec_id"), col("hamming"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF inverted-list IMBALANCE FACTOR — Jégou's balance metric
    * λ = k·Σn_c²/n² (1.0 = perfectly balanced lists; λ ≈ 2 means
    * probing costs ~2× the balanced ideal because hot cells dominate
    * the candidate volume): the one-aggregate audit you run before
    * trusting any nprobe tuning, completing the IVF family's ops
    * surface beside the probe/recall curves. Exact integers end to
    * end; the ×10⁶ product runs in decimal (n² alone is fine in
    * int64, but k·Σn_c²·10⁶ passes it at ~10⁸ vectors). */
  def simIvfImbalance(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .groupBy(col("label")).agg(count(lit(1)).as("nc"))
      .agg(count(lit(1)).as("k"), sum(col("nc")).as("n"),
        min(col("nc")).as("min_cell"), max(col("nc")).as("max_cell"),
        sum(col("nc") * col("nc")).as("sum_sq"))
      .select(col("k"), col("n"), col("min_cell"), col("max_cell"), col("sum_sq"),
        expr("cast(cast(k as decimal(38,0)) * sum_sq * 1000000" +
          " div (cast(n as decimal(38,0)) * n) as bigint)").as("imbalance_micro"))

  /** One k-means‖ (scalable k-means++) OVERSAMPLING round — the
    * distributed seeding step (Bahmani et al.) that replaces
    * k-means++'s inherently serial one-point-at-a-time d²-sampling:
    * given the current centroids, every vector is selected
    * independently with probability ℓ·d²(x)/φ (φ = Σd² — one exact
    * rollup), so a round costs one broadcast-assign pass and yields
    * ~ℓ candidates regardless of corpus size. Determinism contract:
    * the coin is the 40-bit md5 integer u(x) and selection is the
    * EXACT cross-multiplied integer/decimal test
    * u·φ < ℓ·d²ᵣ·2⁴⁰ (d²ᵣ = per-row distance rounded to 6, the
    * sim_inertia float discipline: fixed-order double fold per row,
    * exact decimal across rows) — no float boundary can disagree with
    * the oracle. Centroids are the deterministic label-mean seeds
    * [[simKmeansStep]] assigns against. */
  def simKmeansParStep(spark: SparkSession, dir: String, ell: Int = 20): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val cent = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(expr("cast(sum(cast(v as decimal(18,9))) as double) / count(*)").as("c"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)").as("cv"))
      .select(col("label").as("clabel"), col("cv"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("clabel"))
    val best = e.crossJoin(broadcast(cent))
      .withColumn("dist", expr(
        "aggregate(zip_with(embedding, cv, (x, c) -> (cast(x as double) - c) * (cast(x as double) - c)), cast(0 as double), (acc, v) -> acc + v)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("clabel").as("cell"),
        expr("cast(round(dist, 6) as decimal(38,6))").as("d2r"))
    val phi = best.agg(sum(col("d2r")).as("phi"))
    best.crossJoin(broadcast(phi))
      .withColumn("u40", expr(
        "cast(conv(substring(md5(concat('kmpp:', cast(vec_id as string))), 1, 10), 16, 10) as bigint)"))
      .filter(expr(s"u40 * phi < $ell * d2r * 1099511627776"))
      .select(col("vec_id"), col("cell"), expr("cast(d2r as double)").as("d2"))
      .orderBy(col("vec_id"))
  }

  /** Two-stage BINARY-quantized retrieval: sign-bit Hamming candidate
    * generation RE-RANKED exact — the query path of the 64×-compressed
    * tier (FAISS's IndexBinaryFlat + float refine), completing the
    * compression ladder symmetrically with [[simPqRerank]] on the PQ
    * side. Stage 1 scans only the two 64-bit sign words per vector
    * ([[simHammingTopk]], candK per query); stage 2 reads raw floats
    * for just |Q|·candK candidates and re-scores exact cosine — at
    * 100 TB the full-precision corpus is touched at candidate
    * granularity only, the scan cost is the binary codes. Rank ties
    * broken by vec_id in both stages. */
  def simBqRerank(spark: SparkSession, dir: String,
      candK: Int = 20, k: Int = 5): DataFrame = {
    val c = corpus(spark, dir)
    val cand = simHammingTopk(spark, dir, candK)
      .select(col("query_id").as("qid"), col("vec_id"))
    cand
      .join(broadcast(queries(c)), Seq("qid"))
      .join(c.select(col("vec_id"), col("embedding"), col("nrm")), Seq("vec_id"))
      .withColumn("cosim",
        VectorOps.dot("qe", "embedding") / (col("qnrm") * col("nrm")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cosim").desc, col("vec_id"))).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"), col("vec_id"),
        round(col("cosim"), 6).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Hubness audit of the k-NN graph: the in-degree histogram — how
    * many nodes appear in d other nodes' top-k lists. High-hubness
    * distributions are the classic failure mode of high-dimensional
    * ANN (a few "hub" vectors dominate every neighbor list and poison
    * retrieval diversity); this is the one-scan readout you check
    * before trusting any k-NN-graph-derived signal. Left join keeps
    * the anti-hubs (in-degree 0) in the histogram. Output is bounded
    * by the max in-degree ≤ n; aggregates are node-keyed. */
  def simHubness(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val cites = simKnnGraph(spark, dir, k).select(col("dst_id"))
    Tables.embeddings(spark, dir).select(col("vec_id"))
      .join(cites, col("vec_id") === col("dst_id"), "left")
      .groupBy(col("vec_id")).agg(count(col("dst_id")).as("indeg"))
      .groupBy(col("indeg")).agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("indeg"))
  }

  /** Uncentered covariance (Gram) matrix of the embedding corpus —
    * the d×d second-moment table PCA/whitening starts from, emitted
    * as the upper triangle with per-dimension sums so consumers can
    * center it. Per-row products are single IEEE doubles rounded to
    * 6 (bit-identical in both engines), then cross-row summed in
    * exact DECIMAL — the sim_inertia float discipline. The explode
    * is d(d+1)/2 ≈ 2k structs per row, map-side combined into d²/2
    * groups before any shuffle: linear in n, constant in output. */
  /** Exact-decimal core of [[simCovariance]]: DECIMAL(38,6) sums
    * (linear-in-n headroom to ~10³² row-products — the full 38-digit
    * discipline the other exact-sum operators use) kept INTERNAL so
    * [[simPowerIteration]] reads the unrounded matrix while the gated
    * output edge below stays DecimalType-free. */
  private def covarianceExact(spark: SparkSession, dir: String): DataFrame = {
    // the d(d+1)/2 index pairs ride a broadcast nested-loop join (no
    // per-row array materialization: a native build-the-2080-array +
    // posexplode variant measured 4.7× SLOWER per core — Generate
    // overhead on 2080 tiny rows loses to the fused NLJ + project —
    // and the naive flatten(transform(transform(...))) HOF 2.4× slower
    // still); the product is pure codegen behind the broadcast.
    //
    // Parallelism guard (r11 — THE sf1 cost): the embeddings table is
    // kilobytes-per-megarow ON DISK relative to the expansion it feeds
    // (5 MB of floats → 41.6M product rows at sf1), so the file scan
    // arrives in one partition and the whole Gram pass used to run as
    // ONE task (45.9 s single-thread at sf1). Repartitioning the slim
    // 64-float rows first is a megabyte-scale shuffle that unlocks
    // every core for the quadratic expansion — the standard
    // tiny-input/huge-expansion shape (same reason the pair-explode
    // dedup ops rebalance first).
    val pairs = spark.range(0, 64).select(col("id").cast("int").as("i"))
      .crossJoin(spark.range(0, 64).select(col("id").cast("int").as("j")))
      .filter(col("j") >= col("i"))
    val gram = Tables.embeddings(spark, dir)
      .select(col("embedding"))
      .repartition(spark.sparkContext.defaultParallelism)
      .crossJoin(broadcast(pairs))
      .select(col("i").cast("long").as("dim_i"), col("j").cast("long").as("dim_j"),
        expr("round(cast(element_at(embedding, i + 1) as double) * element_at(embedding, j + 1), 6)").as("p"))
      .groupBy(col("dim_i"), col("dim_j"))
      .agg(count(lit(1)).as("n"),
        expr("cast(sum(cast(p as decimal(38,6))) as decimal(38,6))").as("sum_prod"))
    // Σ round(xi, 6) depends only on i — a 64-row side aggregate off a
    // linear posexplode, instead of the former per-(i, j) ride-along
    // that decimal-summed the SAME per-dim values 2080× each
    val sums = Tables.embeddings(spark, dir)
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("dim"))
      .agg(expr("cast(sum(cast(round(cast(v as double), 6) as decimal(38,6))) as decimal(38,6))")
        .as("sum_i"))
    gram.join(broadcast(sums.select(col("dim").cast("long").as("dim_i"), col("sum_i"))),
        "dim_i")
      .select(col("dim_i"), col("dim_j"), col("n"), col("sum_prod"), col("sum_i"))
  }

  def simCovariance(spark: SparkSession, dir: String): DataFrame =
    covarianceExact(spark, dir)
      // output edge: exact micro-integers (sums of 6-dp-rounded
      // per-row terms, so ×10⁶ is integral by construction)
      .select(col("dim_i"), col("dim_j"), col("n"),
        expr("cast(sum_prod * 1000000 as bigint)").as("sum_prod_micro"),
        expr("cast(sum_i * 1000000 as bigint)").as("sum_i_micro"))
      .orderBy(col("dim_i"), col("dim_j"))

  /** Top principal direction by three unrolled power iterations on the
    * Gram matrix: v₃ = G³·1 — the PCA driver loop, distributed. The
    * d×d matrix comes from [[simCovariance]] (exact DECIMAL entries,
    * mirrored to full form); each iteration is one broadcast join of
    * the 64-row vector against the matrix and one per-row ORDERED fold
    * (array_sort by j, then a left-to-right `aggregate` — the only
    * float summation, deterministic by construction, the q119/q121
    * device). No normalization inside the loop (that would need sqrt);
    * consumers read the dominant direction from v₃'s ratios, and the
    * unnormalized growth stays far inside double range for 3
    * iterations. Unrolled fixed rounds, exactly like q57's PageRank. */
  def simPowerIteration(spark: SparkSession, dir: String): DataFrame = {
    val upper = covarianceExact(spark, dir)
      .select(col("dim_i").as("i"), col("dim_j").as("j"),
        col("sum_prod").cast("double").as("g"))
    // materialize the UPPER TRIANGLE once and mirror it driver-side
    // into a LocalRelation: the corpus-sized covariance pass runs
    // exactly ONE time. The tempting alternatives both re-ran it —
    // a self-union scans the subtree twice, and .persist() is a trap
    // (the cache-build pipeline executed this plan 6× slower than the
    // plain run; measured at sf0.1). The collect is bounded by
    // d(d+1)/2 = 2080 rows regardless of corpus scale — the
    // materializeAndRelease rationale applied at the matrix tier.
    val upRows = upper.collect()
    val mirrored = upRows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))) ++
      upRows.collect {
        case r if r.getLong(0) != r.getLong(1) =>
          (r.getLong(1), r.getLong(0), r.getDouble(2))
      }
    // r15: the three matrix-vector rounds run DRIVER-SIDE over the
    // already-collected 64×64 matrix — the DataFrame mul-chain was 24
    // exchanges / ~7 stage barriers over 64-row frames (measured
    // barrier-bound: 8-core ratio 0.67 with zero data to parallelize;
    // a 64-dim matrix is dimension-bounded, never corpus-bounded, so
    // this is the materializeAndRelease rationale applied to the whole
    // iteration tier). Operation order is IDENTICAL to the removed SQL:
    // per row i, terms sorted by j ascending, one left-to-right double
    // fold (what `aggregate(array_sort(collect_list(...)))` pinned) —
    // same IEEE sums bit for bit, oracle-gated.
    val byI = mirrored.groupBy(_._1).map { case (i, rs) =>
      (i, rs.map(r => (r._2, r._3)).sortBy(_._1))
    }
    def mulVec(v: Map[Long, Double]): Map[Long, Double] =
      byI.map { case (i, rs) =>
        (i, rs.foldLeft(0.0) { case (acc, (j, g)) => acc + g * v(j) })
      }
    val v1 = byI.map { case (i, rs) =>
      (i, rs.foldLeft(0.0) { case (acc, (_, g)) => acc + g })
    }
    val v2 = mulVec(v1)
    val v3 = mulVec(v2)
    import spark.implicits._
    v1.keys.toSeq.sorted
      .map(d => (d, v1(d), v2(d), v3(d)))
      .toDF("dim", "v1", "v2", "v3")
  }

  /** Centroid drift of one Lloyd step: squared-L2 shift between each
    * label's current centroid and the centroid of the vectors
    * [[simKmeansStep]] reassigns to it — the convergence metric a
    * k-means driver loop watches. Centroid means and the 64-term
    * distance fold follow the step's own deterministic discipline
    * (DECIMAL mean sums cast to double, ordered zip_with fold); only
    * labels that received members appear (inner join, documented). */
  def simCentroidShift(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    def cent(df: DataFrame, labCol: String, out: String): DataFrame = df
      .select(col(labCol).as("lab"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("lab"), col("pos"))
      .agg(expr("cast(sum(cast(v as decimal(18,9))) as double) / count(*)").as("c"))
      .groupBy(col("lab"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)").as(out))
    val step = simKmeansStep(spark, dir).select(col("vec_id").as("vid"), col("new_label"))
    val newMembers = e.join(step, col("vec_id") === col("vid"))
    val oldC = cent(e, "label", "oldv")
    val newC = cent(newMembers, "new_label", "newv")
    val nOld = e.groupBy(col("label").as("lab")).agg(count(lit(1)).as("n_old"))
    val nNew = step.groupBy(col("new_label").as("lab")).agg(count(lit(1)).as("n_new"))
    oldC.join(newC, "lab").join(broadcast(nOld), "lab").join(broadcast(nNew), "lab")
      .withColumn("shift_sq", round(expr(
        "aggregate(zip_with(oldv, newv, (a, b) -> (a - b) * (a - b)), " +
          "cast(0 as double), (acc, v) -> acc + v)"), 6))
      .select(col("lab").as("label"), col("n_old"), col("n_new"), col("shift_sq"))
      .orderBy(col("label"))
  }

  /** IVF probe-count tuning curve: recall@10 and candidate volume at
    * nprobe ∈ {1, 2, 4} off ONE centroid-scoring pass — the
    * accuracy/cost sweep an index deployment publishes before fixing
    * nprobe ([[ddLshTuningCurve]]'s twin on the vector side). Exact
    * hit counts against the deterministic brute-force top-10; recall
    * as an integer micro-division. Candidates are counted, not
    * re-scored per config — the cell ranking is shared. */
  def simIvfProbeCurve(spark: SparkSession, dir: String,
      probes: Seq[Int] = Seq(1, 2, 4), k: Int = 10): DataFrame = {
    val c = corpus(spark, dir)
    val cent = c
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(expr("cast(sum(cast(v as decimal(18,9))) as double) / count(*)").as("c"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)").as("cv"))
    val wCell = Window.partitionBy(col("qid")).orderBy(col("cs").desc, col("label"))
    val rankedCells = broadcast(queries(c)).crossJoin(broadcast(cent))
      .withColumn("cs", VectorOps.dotHof("qe", "cv") / (col("qnrm") * VectorOps.norm2Hof("cv")))
      .withColumn("cell_rn", row_number().over(wCell))
    // exact baseline built at the SAME k as the approx side (the gated
    // simTopkBruteforce is pinned to its own K=10 — reusing it would
    // silently report recall@10 for any other k)
    val exactScored = broadcast(queries(c)).crossJoin(c)
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosim", VectorOps.dot("qe", "embedding") / (col("qnrm") * col("nrm")))
    val wE = Window.partitionBy(col("qid")).orderBy(col("cosim").desc, col("vec_id"))
    val exact = org.apache.spark.sql.graft.TopK.perGroup(
        exactScored, Seq("qid"), Seq("cosim" -> true, "vec_id" -> false), k)
      .withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= k)
      .select(col("qid").as("eq"), col("vec_id").as("ev"))
    probes.map { p =>
      val cells = rankedCells.filter(col("cell_rn") <= p)
        .select(col("qid"), col("label"), col("qe"), col("qnrm"))
      val scored = cells.join(c, Seq("label"))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("cosim", VectorOps.dot("qe", "embedding") / (col("qnrm") * col("nrm")))
      val nCand = scored.agg(count(lit(1)).as("n_candidates"))
      val wQ = Window.partitionBy(col("qid")).orderBy(col("cosim").desc, col("vec_id"))
      val approx = org.apache.spark.sql.graft.TopK.perGroup(
          scored, Seq("qid"), Seq("cosim" -> true, "vec_id" -> false), k)
        .withColumn("rank", row_number().over(wQ))
        .filter(col("rank") <= k)
        .select(col("qid"), col("vec_id"))
      val hits = exact
        .join(approx, col("eq") === col("qid") && col("ev") === col("vec_id"), "left")
        .agg(count(lit(1)).as("n_exact"),
          sum(when(col("qid").isNotNull, 1L).otherwise(0L)).as("n_hits"))
      hits.crossJoin(broadcast(nCand))
        .select(lit(p.toLong).as("nprobe"), col("n_candidates"), col("n_exact"),
          col("n_hits"), expr("n_hits * 1000000 div n_exact").as("recall_micro"))
    }.reduce(_ unionAll _).orderBy(col("nprobe"))
  }

  /** Squared-L2-norm histogram of the embedding corpus — the
    * normalization audit run before cosine anything (un-normalized
    * vectors silently break dot-product ≈ cosine assumptions). The
    * per-row norm² is one ordered array fold; micro-unit conversion
    * goes through a DECIMAL(18,6) cast of the ALREADY-6-rounded double
    * (unambiguous nearest-decimal, so both engines land the same
    * integer); buckets are the integer equi-width arithmetic over
    * broadcast exact bounds. Map-side everything, 10-row output. */
  /** Shared MaxSim scoring pieces: the left-to-right double folds every
    * sim_* op uses (so oracle parity holds bit for bit), parameterized
    * over PRE-HOISTED sub-vector/norm array columns `qsubs`/`qnorms`
    * (broadcast side) and `dsubs`/`dnorms` (corpus side). The score is
    * ragged-safe — it iterates `size(qsubs)`/`size(dsubs)`, not a
    * compile-time constant — so the fixed-slice and ragged operators
    * share one expression. */
  private object MaxSimOps {
    def dotF(a: String, b: String): String =
      s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), cast(0 as double), (acc, v) -> acc + v)"
    def n2F(a: String): String =
      s"sqrt(aggregate($a, cast(0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double)))"
    val scoreExpr: Column = expr(
      s"""aggregate(transform(sequence(1, size(qsubs)), s ->
         |  cast(floor(1000000 * array_max(transform(sequence(1, size(dsubs)), t ->
         |    ${dotF("element_at(qsubs, s)", "element_at(dsubs, t)")} /
         |    (element_at(qnorms, s) * element_at(dnorms, t))))) as bigint)),
         | cast(0 as bigint), (acc, v) -> acc + v)""".stripMargin)
  }

  /** MaxSim late-interaction retrieval (the ColBERT scoring rule) over
    * MULTI-VECTOR representations: each vector is treated as `subs`
    * token-level sub-vectors (contiguous `subDim`-wide slices of the
    * stored embedding — the standard trick for deriving a multi-vector
    * table from a single-vector lake), and
    * score(q, d) = Σ_s max_t cos(q_s, d_t): every query sub-vector is
    * matched to its best doc sub-vector, then the per-sub maxima are
    * summed. The per-sub maxima are floored to exact micro longs BEFORE
    * the sum, so the score is an order-free integer and the only
    * doubles crossing engines are the individual pair cosines (same
    * left-to-right fold as every other sim_* op).
    *
    * 100 TB shape: the query set (|Q|·subs sub-vectors) broadcasts as
    * ONE row per query carrying its sub-vector array; scoring is a
    * single map-side pass over the corpus — the whole
    * max-over-subs/sum-over-subs interaction happens inside one
    * per-row expression, so there is NO shuffle at corpus cardinality;
    * TopK.perGroup then prunes each partition to k rows with bounded
    * heaps and only |partitions|·|Q|·k rows reach the final window. */
  def simMaxsim(spark: SparkSession, dir: String, k: Int = 10,
      subs: Int = 4, subDim: Int = 16): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"),
        expr(s"transform(sequence(0, ${subs - 1}), s -> slice(embedding, s * $subDim + 1, $subDim))").as("qsubs"))
      .withColumn("qnorms", expr(s"transform(qsubs, v -> ${MaxSimOps.n2F("v")})"))
    // Doc sub-vectors and their norms are projected BELOW the broadcast
    // join (a Project under the stream side of the nested-loop join —
    // Catalyst cannot collapse it into the score projection above the
    // join), so each doc's `subs` norm folds run ONCE per corpus row
    // instead of once per (query, doc, query-sub) evaluation: subs²
    // norm folds per pair → zero. Query norms materialize once at
    // broadcast build. The per-pair work is now dots only.
    val d = e.select(col("vec_id"),
        expr(s"transform(sequence(0, ${subs - 1}), t -> slice(embedding, t * $subDim + 1, $subDim))").as("dsubs"))
      .withColumn("dnorms", expr(s"transform(dsubs, v -> ${MaxSimOps.n2F("v")})"))
    val scored = broadcast(q).crossJoin(d)
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("score_micro", MaxSimOps.scoreExpr)
    val pruned = org.apache.spark.sql.graft.TopK.perGroup(
      scored, Seq("qid"), Seq("score_micro" -> true, "vec_id" -> false), k)
    val w = Window.partitionBy(col("qid")).orderBy(col("score_micro").desc, col("vec_id"))
    pruned
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"), col("vec_id"),
        col("score_micro"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** MaxSim over a RAGGED multi-vector table — the shape a ColBERT-
    * style index actually lands in: documents carry a VARIABLE number
    * of token sub-vectors (here 2–5, derived deterministically as
    * overlapping `subDim`-wide windows of the stored embedding at
    * stride 13 mod 49 — offsets differ per position, so no two docs
    * with different sub-counts see the same slice set), queries carry
    * 2–4 (stride 11), and some documents are UN-ENCODED (every 17th:
    * token list NULL). Score is the same Σ_s max_t cosine as
    * [[simMaxsim]] — the shared [[MaxSimOps.scoreExpr]] iterates the
    * actual array sizes, so raggedness needs no padding, masking, or
    * per-width plans. NULL-token docs are not retrievable (a doc with
    * no encoding has no similarity to anything) and are filtered
    * BEFORE the join — they never enter the |Q|·|corpus| interaction;
    * `n_doc_subs` in the output proves the ranked lists mix widths.
    *
    * 100 TB shape: identical to [[simMaxsim]] — queries broadcast as
    * one row each, doc sub-vectors and norms are hoisted into a
    * Project below the join (norm folds once per corpus row), the
    * whole interaction is one map-side expression, TopK.perGroup
    * bounds what reaches the final window. Ragged widths only change
    * per-row loop trip counts, not the plan. */
  def simMaxsimRagged(spark: SparkSession, dir: String, k: Int = 10,
      subDim: Int = 16): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"),
        expr(s"transform(sequence(0, cast(vec_id % 3 as int) + 1), s -> slice(embedding, (s * 11) % 49 + 1, $subDim))").as("qsubs"))
      .withColumn("qnorms", expr(s"transform(qsubs, v -> ${MaxSimOps.n2F("v")})"))
    val d = e
      .select(col("vec_id"),
        when(col("vec_id") % 17 === 0, lit(null).cast("array<array<float>>"))
          .otherwise(expr(s"transform(sequence(0, cast(vec_id % 4 as int) + 1), t -> slice(embedding, (t * 13) % 49 + 1, $subDim))"))
          .as("dsubs"))
      .filter(col("dsubs").isNotNull)
      .withColumn("dnorms", expr(s"transform(dsubs, v -> ${MaxSimOps.n2F("v")})"))
    val scored = broadcast(q).crossJoin(d)
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("score_micro", MaxSimOps.scoreExpr)
    val pruned = org.apache.spark.sql.graft.TopK.perGroup(
      scored, Seq("qid"), Seq("score_micro" -> true, "vec_id" -> false), k)
    val w = Window.partitionBy(col("qid")).orderBy(col("score_micro").desc, col("vec_id"))
    pruned
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"), col("vec_id"),
        size(col("dsubs")).cast("bigint").as("n_doc_subs"),
        col("score_micro"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** MMR (Maximal Marginal Relevance) diverse top-k — the
    * redundancy-penalized re-ranking every retrieval-for-training
    * pipeline runs so the k selected neighbors aren't k near-copies:
    * greedily pick argmax_d [λ·rel(q,d) − (1−λ)·max_{s∈S} sim(d,s)]
    * with λ = ½, which in micro units is the all-integer objective
    * rel_micro − max_sim_micro (id tie-break — fully deterministic).
    *
    * Deployment shape, scalable where it must be: stage 1 (the only
    * corpus-sized work) is the brute cosine against the broadcast query
    * set pruned by bounded-heap TopKPerGroup to a poolK-candidate pool;
    * stage 2 computes the |Q|·poolK² candidate-pair sims; stage 3
    * unrolls the greedy k times over that tiny pool — the classic
    * "distributed candidate generation, per-query re-rank" serving
    * split. All sims are micro-floored once, so the greedy itself is
    * exact integer arithmetic in both engines. */
  def simMmr(spark: SparkSession, dir: String, poolK: Int = 20,
      k: Int = 5): DataFrame = {
    import spark.implicits._
    val c = corpus(spark, dir)
    val scored = broadcast(queries(c)).crossJoin(c)
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("rel_micro", floor(lit(1000000) *
        (VectorOps.dot("qe", "embedding") / (col("qnrm") * col("nrm")))))
      .select(col("qid"), col("vec_id"), col("embedding"), col("nrm"),
        col("rel_micro"))
    val pool = org.apache.spark.sql.graft.TopK.perGroup(
      scored, Seq("qid"), Seq("rel_micro" -> true, "vec_id" -> false), poolK)
    // per-query greedy over the pruned pool: one shuffle of poolK
    // rows/query, the whole O(poolK²·k) interaction local to its group.
    // Pair sims use the same left-to-right double fold as the SQL/oracle
    // formulation (floored once to micro), so the greedy is exact
    // integer arithmetic — value-identical to the k-stage CTE oracle.
    pool.select(col("qid"), col("vec_id"), col("embedding"), col("nrm"),
        col("rel_micro"))
      .as[(Long, Long, Array[Float], Double, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (qid: Long, it: Iterator[(Long, Long, Array[Float], Double, Long)]) =>
        val cand = it.toArray
        def psim(a: Int, b: Int): Long = {
          val (ea, na) = (cand(a)._3, cand(a)._4)
          val (eb, nb) = (cand(b)._3, cand(b)._4)
          var dot = 0.0
          var i = 0
          while (i < ea.length) { dot += ea(i).toDouble * eb(i).toDouble; i += 1 }
          math.floor(1000000.0 * (dot / (na * nb))).toLong
        }
        val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
        val msim = Array.fill(cand.length)(Long.MinValue)
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long, Long, Option[Long])]
        for (step <- 1 to math.min(k, cand.length)) {
          var best = -1
          for (i <- cand.indices if !selected.contains(i)) {
            val obj = cand(i)._5 - (if (step == 1) 0L else msim(i))
            if (best < 0) best = i
            else {
              val bObj = cand(best)._5 - (if (step == 1) 0L else msim(best))
              if (obj > bObj || (obj == bObj && cand(i)._2 < cand(best)._2))
                best = i
            }
          }
          out += ((qid, step.toLong, cand(best)._2, cand(best)._5,
            if (step == 1) None else Some(msim(best))))
          selected += best
          for (i <- cand.indices if !selected.contains(i)) {
            val s = psim(i, best)
            if (s > msim(i)) msim(i) = s
          }
        }
        out.iterator
      }
      .toDF("query_id", "step", "vec_id", "rel_micro", "max_sim_micro")
      .withColumn("mmr_micro",
        col("rel_micro") - coalesce(col("max_sim_micro"), lit(0L)))
      .orderBy(col("query_id"), col("step"))
  }

  def simNorm2Hist(spark: SparkSession, dir: String, buckets: Int = 10): DataFrame = {
    val n2 = Tables.embeddings(spark, dir)
      .select(expr("cast(cast(round(aggregate(embedding, cast(0 as double)," +
        " (acc, x) -> acc + cast(x as double) * x), 6) as decimal(18,6))" +
        " * 1000000 as bigint)").as("n2_micro"))
    val bounds = n2.agg(min(col("n2_micro")).as("lo"), max(col("n2_micro")).as("hi"))
    n2.crossJoin(broadcast(bounds))
      .withColumn("bucket", expr(s"(n2_micro - lo) * $buckets div (hi - lo + 1)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("n2_micro")).as("min_n2_micro"),
        max(col("n2_micro")).as("max_n2_micro"))
      .orderBy(col("bucket"))
  }

  /** The k-NN edge list behind the graph-ANN rung, materialized once
    * per corpus snapshot (the Analytics edge-snapshot store): the
    * graph BUILD is the expensive cell-blocked pairwise pass, and
    * [[simNswTopk]] traverses it twice per query — at 100 TB the
    * neighbor graph is an index you persist in the lake, not a
    * per-query recomputation. */
  private def knnEdges(spark: SparkSession, dir: String, k: Int): DataFrame =
    Analytics.snapshotTable(spark, dir, s"knn_edges_$k")(
      simKnnGraph(spark, dir, k).select(col("src_id"), col("dst_id")))

  /** kNN edges with the DESTINATION vector (and its norm) stored
    * alongside — the vector-adjacent edge store every graph-ANN
    * system keeps (HNSW lays vectors next to their link lists for
    * the same reason): a beam hop then expands AND re-scores in one
    * map-side pass over this table, instead of expanding against the
    * slim edge list and paying a second corpus join to look the
    * embeddings up. Storage is n·graphK vectors (~5× the corpus at
    * k=5) — the standard graph-ANN space/time trade, paid once per
    * corpus snapshot. */
  private def knnEdgesEmb(spark: SparkSession, dir: String, k: Int): DataFrame =
    Analytics.snapshotTable(spark, dir, s"knn_edges_emb_$k")(
      simKnnGraph(spark, dir, k).select(col("src_id"), col("dst_id"))
        .join(corpus(spark, dir).select(col("vec_id").as("dst_id"),
          col("embedding").as("demb"), col("nrm").as("dnrm")), Seq("dst_id")))

  /** NSW-style graph-ANN search — the navigable-small-world rung above
    * [[simKnnGraph]]: per-cell entry points are scored, the best
    * `beam` survive, and `hops` unrolled beam-search steps expand each
    * survivor's graph neighbors (≤ beam·graphK candidate ids per query
    * per hop — never a corpus scan), re-scoring and re-pruning after
    * each; the final readout is the top-`k` of the last beam. Entry
    * points are the min-vec_id vector per label cell (deterministic);
    * every pruning is total-ordered (cosim DESC, vec_id) so the
    * traversal is reproducible and oracle-checkable. The candidate
    * frames are |Q|·beam-sized throughout: the only corpus-scale work
    * is the one-time snapshotted graph build. Recall vs the exact
    * brute-force ladder is audited in the spec (the sim_recall_report
    * pattern). */
  def simNswTopk(spark: SparkSession, dir: String, beam: Int = 16, k: Int = 5,
      graphK: Int = 5, hops: Int = 3): DataFrame = {
    val c = corpus(spark, dir)
    val qb = broadcast(queries(c))
    // the vector-adjacent edge store: a hop expands AND re-scores in
    // one map-side pass over this table — the r13 shape expanded
    // against the slim edge list and paid a SECOND corpus join per
    // hop to look the candidate embeddings up (2 extra stages/hop,
    // the verdict's tiny-frame-exchange constant)
    val edgesEmb = knnEdgesEmb(spark, dir, graphK)
    // min per label via partial-aggregated groupBy — no corpus-wide
    // window shuffle for a 10-row entry list
    val entries = c.groupBy(col("label")).agg(min(col("vec_id")).as("vec_id"))
      .select(col("vec_id"))
    // every post-score frame is ≤ |Q|·beam·(graphK+1) rows: exchange
    // it into ONE partition (SinglePartition satisfies the window's
    // ClusteredDistribution AND the distinct's, so the explicit
    // repartition(1) REPLACES the 32-partition hash exchanges the
    // window and the dedup would otherwise insert — the r13 verdict's
    // ~0.5 s/round tiny-frame constant). repartition, not coalesce:
    // coalesce(1) would propagate up and collapse the corpus-side
    // scan of the scoring join to one task.
    // callers hand topB an already-single-partition frame, so the
    // rank window (and the hop dedup before it) run exchange-free
    def topB(scored: DataFrame, b: Int): DataFrame = {
      val w = Window.partitionBy(col("qid")).orderBy(col("cosim").desc, col("vec_id"))
      scored
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= b)
        .select(col("qid"), col("vec_id"), col("cosim"))
    }
    val seeds = qb.select(col("qid"))
      .crossJoin(broadcast(entries))
      .filter(col("vec_id") =!= col("qid"))
    // seed scoring is the one corpus lookup (entry points are corpus
    // rows outside the edge store's dst side)
    val seedScored = c.select(col("vec_id"), col("embedding"), col("nrm"))
      .join(broadcast(seeds), Seq("vec_id"))
      .join(qb, Seq("qid"))
      .withColumn("cosim", VectorOps.dot("qe", "embedding") / (col("qnrm") * col("nrm")))
      .select(col("qid"), col("vec_id"), col("cosim"))
    // beams localCheckpoint (lazily, the q126/q187 frontier rule):
    // each hop both BROADCASTS the beam and unions it back in, and
    // without the checkpoint every consumer re-executes the whole
    // chained lineage of all previous hops — plan depth (and the
    // per-hop broadcast build) stays CONSTANT in hops instead
    var beamF = topB(seedScored.repartition(1), beam).localCheckpoint(false)
    for (_ <- 1 to hops) {
      // ONE stage: stream the edge store, broadcast the beam, score
      // the expansion map-side against the broadcast query frame.
      // cosim for a (qid, vec_id) pair is the same deterministic
      // double arithmetic wherever the vector copy comes from (the
      // store holds verbatim copies), so the distinct that merges the
      // expansion with the already-scored beam collapses duplicates
      // exactly.
      val expanded = edgesEmb
        .join(broadcast(beamF.select(col("qid"), col("vec_id").as("src_id"))),
          Seq("src_id"))
        .filter(col("dst_id") =!= col("qid"))
        .join(qb, Seq("qid"))
        .withColumn("cosim", VectorOps.dot("qe", "demb") / (col("qnrm") * col("dnrm")))
        .select(col("qid"), col("dst_id").as("vec_id"), col("cosim"))
        .unionByName(beamF)
        .repartition(1)
        .distinct()
      beamF = topB(expanded, beam).localCheckpoint(false)
    }
    // beamF is already SinglePartition (topB's contract) — the final
    // rank window runs exchange-free too
    val w = Window.partitionBy(col("qid")).orderBy(col("cosim").desc, col("vec_id"))
    beamF
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"), col("vec_id"),
        round(col("cosim"), 6).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Recall@k of the NSW graph traversal versus the exact brute-force
    * top-k — [[simRecallReport]] for the graph-ANN rung, so the
    * navigability loss of the snapshotted k-NN graph is a published,
    * oracle-checked number per query (not just a spec floor). The
    * join is on the tiny |Q|·k result sets. */
  def simNswRecall(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val exact = simTopkBruteforce(spark, dir)
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"))
    val approx = simNswTopk(spark, dir)
      .select(col("query_id").as("qa"), col("vec_id").as("va"))
    exact
      .join(approx, col("query_id") === col("qa") && col("vec_id") === col("va"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k"),
        sum(when(col("va").isNotNull, 1L).otherwise(0L)).as("n_hit"))
      .select(col("query_id"), col("k"), col("n_hit"),
        (col("n_hit") / col("k")).as("recall_at_k"))
      .orderBy(col("query_id"))
  }

  /** HNSW layer-1 membership: a deterministic md5 carve (first hex
    * nibble of md5("hnsw:" + vec_id) = '0' → 1/16 of the corpus) —
    * the reproducible analogue of HNSW's geometric level assignment
    * (p = 1/M per level), the q31 md5-prefix-carve device. */
  private def hnswL1(c: DataFrame): DataFrame =
    c.filter(expr(
      "substring(md5(concat('hnsw:', cast(vec_id as string))), 1, 1) = '0'"))

  /** The hierarchy layer's vector-adjacent edge store: the layer-1
    * members' k-NN graph with destination vectors alongside (the
    * [[knnEdgesEmb]] posture one level up), snapshotted per corpus —
    * 1/16 the rows of the base store, the geometric-series space cost
    * HNSW pays for its logarithmic descent. */
  private def hnswL1EdgesEmb(spark: SparkSession, dir: String, k: Int): DataFrame =
    Analytics.snapshotTable(spark, dir, s"hnsw_l1_edges_emb_$k") {
      val m = hnswL1(corpus(spark, dir))
      val a = m.select(col("vec_id").as("src_id"), col("label"),
        col("embedding").as("ea"), col("nrm").as("na"))
      val b = m.select(col("vec_id").as("dst_id"), col("label"),
        col("embedding").as("demb"), col("nrm").as("dnrm"))
      val scored = a.join(b, Seq("label"))
        .filter(col("src_id") =!= col("dst_id"))
        .withColumn("cosim", VectorOps.dot("ea", "demb") / (col("na") * col("dnrm")))
      org.apache.spark.sql.graft.TopK.perGroup(
        scored, Seq("src_id"), Seq("cosim" -> true, "dst_id" -> false), k)
        .select(col("src_id"), col("dst_id"), col("demb"), col("dnrm"))
    }

  /** HNSW-style hierarchical graph-ANN search — the hierarchy rung
    * completing the graph-ANN ladder above [[simNswTopk]] (Malkov &
    * Yashunin: NSW's entry-point problem solved by descending a
    * sparser upper layer first): the l1Beam smallest-id layer-1
    * members seed a COARSE beam descent (beam l1Beam, l1Hops hops)
    * over the 1/16-sized layer-1 edge store, and its survivors —
    * already scored — seed the layer-0 beam search (beam × hops, the
    * NSW reach) from entries the descent has already pulled near the
    * answer. On an UNLABELED corpus this matters
    * more: flat NSW's per-cell entries assume the IVF labels exist;
    * the hierarchy needs nothing but the graph. Same traversal
    * contracts as NSW: every frame ≤ |Q|·beam·(graphK+1) rows and
    * single-partition (the repartition(1) exchange-elision device),
    * every pruning total-ordered (cosim DESC, vec_id), per-hop
    * localCheckpoint for constant plan depth; the only corpus-scale
    * work is the two snapshotted graph builds. Multiple entry points
    * (not HNSW's single top node) keep every query seeded even when
    * a query id lands in the entry set itself. */
  def simHnswTopk(spark: SparkSession, dir: String, beam: Int = 16, k: Int = 5,
      graphK: Int = 5, hops: Int = 3, l1Beam: Int = 4, l1Hops: Int = 2): DataFrame = {
    val c = corpus(spark, dir)
    val qb = broadcast(queries(c))
    val l1Edges = hnswL1EdgesEmb(spark, dir, graphK)
    val edgesEmb = knnEdgesEmb(spark, dir, graphK)
    def topB(scored: DataFrame, b: Int): DataFrame = {
      val w = Window.partitionBy(col("qid")).orderBy(col("cosim").desc, col("vec_id"))
      scored
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= b)
        .select(col("qid"), col("vec_id"), col("cosim"))
    }
    def descend(start: DataFrame, edges: DataFrame, b: Int, nHops: Int): DataFrame = {
      var beamF = topB(start.repartition(1), b).localCheckpoint(false)
      for (_ <- 1 to nHops) {
        val expanded = edges
          .join(broadcast(beamF.select(col("qid"), col("vec_id").as("src_id"))),
            Seq("src_id"))
          .filter(col("dst_id") =!= col("qid"))
          .join(qb, Seq("qid"))
          .withColumn("cosim", VectorOps.dot("qe", "demb") / (col("qnrm") * col("dnrm")))
          .select(col("qid"), col("dst_id").as("vec_id"), col("cosim"))
          .unionByName(beamF)
          .repartition(1)
          .distinct()
        beamF = topB(expanded, b).localCheckpoint(false)
      }
      beamF
    }
    // entry set: the l1Beam smallest layer-1 ids (deterministic; a
    // bounded sort over the 1/16 member slice, never the corpus)
    val entries = hnswL1(c).select(col("vec_id")).orderBy(col("vec_id")).limit(l1Beam)
    val seeds = qb.select(col("qid"))
      .crossJoin(broadcast(entries))
      .filter(col("vec_id") =!= col("qid"))
    val seedScored = c.select(col("vec_id"), col("embedding"), col("nrm"))
      .join(broadcast(seeds), Seq("vec_id"))
      .join(qb, Seq("qid"))
      .withColumn("cosim", VectorOps.dot("qe", "embedding") / (col("qnrm") * col("nrm")))
      .select(col("qid"), col("vec_id"), col("cosim"))
    val l1Out = descend(seedScored, l1Edges, l1Beam, l1Hops)
    val beamF = descend(l1Out, edgesEmb, beam, hops)
    val w = Window.partitionBy(col("qid")).orderBy(col("cosim").desc, col("vec_id"))
    beamF
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"), col("vec_id"),
        round(col("cosim"), 6).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Recall@k of the HNSW hierarchical traversal versus the exact
    * brute-force top-k — the published navigability audit of the
    * hierarchy rung (the [[simNswRecall]] readout one rung up). */
  def simHnswRecall(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val exact = simTopkBruteforce(spark, dir)
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"))
    val approx = simHnswTopk(spark, dir)
      .select(col("query_id").as("qa"), col("vec_id").as("va"))
    exact
      .join(approx, col("query_id") === col("qa") && col("vec_id") === col("va"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k"),
        sum(when(col("va").isNotNull, 1L).otherwise(0L)).as("n_hit"))
      .select(col("query_id"), col("k"), col("n_hit"),
        (col("n_hit") / col("k")).as("recall_at_k"))
      .orderBy(col("query_id"))
  }

  /** Spherical k-means assignment step — the COSINE-geometry Lloyd
    * step embeddings actually want (L2 k-means over unnormalized
    * vectors lets magnitude dominate direction; spherical normalizes
    * first and assigns by cosine — Dhillon & Modha). Vectors
    * normalize to x̂ = x/‖x‖ in fixed IEEE arithmetic; per-label
    * centroids of the NORMALIZED vectors use the exact-nanos sum
    * (floor(x̂ᵢ·10⁹+0.5) as bigint — the [[simCalinski]] hardening:
    * bit-identical across engines, no float→decimal cast ambiguity);
    * assignment = max cosine, smallest-label tie-break. Same shape
    * and scale posture as [[simKmeansStep]]: one corpus×centroid
    * broadcast pass. */
  def simSphericalStep(spark: SparkSession, dir: String): DataFrame = {
    // ‖x‖ once per row through the native codegen kernel (spec'd
    // bit-equal to the sqrt-of-sequential-fold it replaces), BOUND AS
    // A LAMBDA VARIABLE through the single-element-array trick (the
    // txt_gopher precedent) so CollapseProject cannot re-inline the
    // norm into the division lambda and evaluate it once per ELEMENT
    // (the r13 shape paid exactly that: a 64-step fold per dimension)
    val e = Tables.embeddings(spark, dir)
      .withColumn("nhat", element_at(
        transform(array(VectorOps.norm2("embedding")),
          nv => transform(col("embedding"), x => x.cast("double") / nv)), 1))
    val cent = e
      .select(col("label"), posexplode(col("nhat")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(expr(
        "cast(sum(cast(floor(v * 1000000000 + 0.5) as bigint)) as double) / 1000000000 / count(*)")
        .as("c"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)").as("cv"))
      // hoist the centroid norm to the k-row frame: it rides the
      // broadcast as DATA, so the corpus pass no longer recomputes
      // the 64-term sqrt fold once per (row × centroid)
      .withColumn("cvn", expr(
        "sqrt(aggregate(transform(cv, c -> c * c), cast(0 as double), (acc, v) -> acc + v))"))
      .select(col("label").as("clabel"), col("cv"), col("cvn"))
    // corpus × centroid cosine through the native dot kernel
    // (double-array side of FloatVecDot — sequential left-to-right
    // accumulation, bit-identical to the zip_with fold it replaces)
    val scored = e.crossJoin(broadcast(cent))
      .withColumn("cos", VectorOps.dot(col("nhat"), col("cv")) / col("cvn"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("clabel"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("label"), col("clabel").as("new_label"),
        round(col("cos"), 6).as("cos"))
      .orderBy(col("vec_id"))
  }

  /** Semi-hard triplet mining (FaceNet's training-data assembly rule)
    * — for each anchor, the (anchor, positive, negative) triple a
    * metric-learning batch builder emits: positive = hardest same-label
    * match (highest cosine, the anchor's own near-dup), negative = the
    * HARDEST SEMI-HARD foreign vector (max cosine among those with
    * cosim < pos_score — closer than that band makes the triple
    * violate before training starts, farther contributes no gradient).
    * n_band publishes how many candidates the band held; when it's
    * empty the hardest foreign vector stands in (the standard
    * fallback, visible as n_band = 0). One broadcast-query scored
    * pass (the [[simHardNegatives]] shape) feeds both sides; ranks
    * run over |Q|-keyed windows. */
  def simTriplets(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val q = c.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("embedding").as("qe"), col("nrm").as("qnrm"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosim", VectorOps.dot("qe", "embedding") / (col("qnrm") * col("nrm")))
    val wPos = Window.partitionBy(col("qid")).orderBy(col("cosim").desc, col("vec_id"))
    val pos = scored.filter(col("label") === col("qlabel"))
      .withColumn("rn", row_number().over(wPos)).filter(col("rn") === 1)
      .select(col("qid").as("aid"), col("vec_id").as("pos_id"), col("cosim").as("pos_cos"))
    val negs = scored.filter(col("label") =!= col("qlabel"))
      .join(broadcast(pos), col("qid") === col("aid"))
      .withColumn("in_band", (col("cosim") < col("pos_cos")).cast("int"))
    val wNeg = Window.partitionBy(col("qid"))
      .orderBy(col("in_band").desc, col("cosim").desc, col("vec_id"))
    val nband = negs.groupBy(col("qid").as("q2"))
      .agg(sum(col("in_band")).cast("bigint").as("n_band"))
    negs.withColumn("rn", row_number().over(wNeg)).filter(col("rn") === 1)
      .join(broadcast(nband), col("qid") === col("q2"))
      .select(col("qid").as("anchor_id"), col("pos_id"),
        round(col("pos_cos"), 6).as("pos_score"),
        col("vec_id").as("neg_id"), round(col("cosim"), 6).as("neg_score"),
        col("n_band"))
      .orderBy(col("anchor_id"))
  }

  /** DBSCAN core-point census under the label-cell blocking (the
    * SemDeDup cell contract): per vector, how many SAME-CELL
    * neighbours sit within squared-L2 eps², and whether that makes it
    * a core point (≥ minPts). This is the density profile a
    * density-based clusterer (or a dedup pass choosing its radius)
    * reads before committing to eps — and the blocked form is the
    * 100 TB posture: the ε-neighbour join runs inside cells only
    * (Σ|cell|² pairs, never corpus²), exactly like the dedup family's
    * banded joins; the cap is semantic (cross-cell neighbours are out
    * of contract), replicated verbatim in the oracle. The distance
    * threshold compares identical IEEE doubles in both engines. */
  def simDbscanCores(spark: SparkSession, dir: String,
      eps2: Double = 1.5, minPts: Int = 4): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val a = e.select(col("vec_id").as("va"), col("label"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("vb"), col("label").as("lb"), col("embedding").as("eb"))
    a.join(b, col("label") === col("lb") && col("va") =!= col("vb"))
      .withColumn("d2", expr(
        "aggregate(zip_with(ea, eb, (x, y) -> (cast(x as double) - cast(y as double)) * (cast(x as double) - cast(y as double))), cast(0 as double), (acc, v) -> acc + v)"))
      .groupBy(col("va"), col("label"))
      .agg(sum(when(col("d2") <= eps2, 1L).otherwise(0L)).as("n_neighbors"))
      .select(col("va").as("vec_id"), col("label").cast("long").as("cell"),
        col("n_neighbors"), (col("n_neighbors") >= minPts).as("is_core"))
      .orderBy(col("vec_id"))
  }

  /** Deterministic sign-LSH sub-cell planes for the capped DBSCAN
    * census — md5-derived like [[rpPlane]] but an independent family
    * (the "dbs:" tag). Public so the oracle SQL builder inlines the
    * SAME doubles. */
  def dbsPlane(p: Int, dims: Int = 64): Seq[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (1 to dims).map { d =>
      val hex = md.digest(s"dbs:$p:$d".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967295.0 - 0.5
    }
  }

  /** The 100 TB configuration of [[simDbscanCores]]: the label cells
    * grow ∝ corpus at a FIXED label count, so the blocked Σ|cell|²
    * ε-self-join grows n²/k — broadcast luck at bench SFs, a
    * scale-killer at web scale (r13 verdict, weak #3). This config
    * REFINES each label cell with `subBits` sign-LSH sub-cell bits
    * (geometric, so near neighbours usually share a sub-cell): cell
    * count multiplies by 2^subBits per added bit, giving a dial that
    * holds |cell| constant as the corpus grows — the
    * dd_minhash_lsh_capped posture. The refinement is SEMANTIC
    * (cross-sub-cell neighbours are out of contract, replicated
    * verbatim in the oracle); subBits = 0 is bit-identical to the
    * uncapped census, and a finer carve can only REMOVE neighbours —
    * both proven in the invariance spec. minPts pairs with the cell
    * family (a finer carve shrinks every neighbourhood): the gated
    * config runs (subBits = 2, minPts = 2), measured live — both
    * core classes populated — at every test SF, where minPts = 4
    * under the 2-bit carve goes vacuous at sf ≤ 0.01. */
  def simDbscanCoresCapped(spark: SparkSession, dir: String,
      eps2: Double = 1.5, minPts: Int = 2, subBits: Int = 2): DataFrame = {
    var f = Tables.embeddings(spark, dir)
    for (p <- 0 until subBits) {
      f = f.withColumn("plane", typedLit(dbsPlane(p)))
        .withColumn(s"sb$p", (expr(
          """aggregate(zip_with(embedding, plane, (x, wd) -> cast(x as double) * wd),
            |cast(0 as double), (s, v) -> s + v)""".stripMargin) > lit(0d)).cast("int"))
        .drop("plane")
    }
    val bits =
      if (subBits == 0) lit(0L)
      else expr((0 until subBits)
        .map(p => s"cast(sb$p as bigint) * ${1L << (subBits - 1 - p)}")
        .mkString(" + "))
    val cells = f
      .withColumn("cell", col("label").cast("long") * (1L << subBits) + bits)
      .select(col("vec_id"), col("cell"), col("embedding"))
    val a = cells.select(col("vec_id").as("va"), col("cell"), col("embedding").as("ea"))
    val b = cells.select(col("vec_id").as("vb"), col("cell").as("cb"), col("embedding").as("eb"))
    a.join(b, col("cell") === col("cb") && col("va") =!= col("vb"))
      .withColumn("d2", expr(
        "aggregate(zip_with(ea, eb, (x, y) -> (cast(x as double) - cast(y as double)) * (cast(x as double) - cast(y as double))), cast(0 as double), (acc, v) -> acc + v)"))
      .groupBy(col("va"), col("cell"))
      .agg(sum(when(col("d2") <= eps2, 1L).otherwise(0L)).as("n_neighbors"))
      .select(col("va").as("vec_id"), col("cell"),
        col("n_neighbors"), (col("n_neighbors") >= minPts).as("is_core"))
      .orderBy(col("vec_id"))
  }

  /** Calinski–Harabasz index (variance-ratio criterion) of the
    * Lloyd-step assignment — the INTERNAL clustering validation that
    * reads beside the elbow plot ([[simInertia]] is its denominator):
    * CH = (B/(k−1)) / (W/(n−k)). Within-SS comes from the assignment's
    * per-row rounded distances summed in DECIMAL (the inertia
    * discipline); total-SS is one broadcast join against the GLOBAL
    * exact-decimal centroid with the identical fixed-order float fold;
    * between = total − within as integer micros, and CH is one
    * decimal(38,0) cross-multiplied division (~10²³ at 100× test
    * scale). Two corpus passes (assignment + total), both
    * broadcast-joined — nothing shuffles beyond the Lloyd step's own
    * aggregates. A single-cluster degenerate (k=1) or zero within-SS
    * emits NULL in both engines via the guard. */
  def simCalinski(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    // global centroid from EXACT integer nanos — floor(v·10⁹ + 0.5) is
    // pure IEEE arithmetic, so the summed centroid is bit-identical in
    // both engines. (The per-label family uses cast(float→decimal(18,9)),
    // whose engine-specific float rounding skews a 500-row mean by
    // ~3e-10 — summing 500 ROUNDED distances here made one row cross a
    // micro boundary at sf0.001, seen live in the gate.)
    val gmean = e
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(expr(
        "cast(sum(cast(floor(cast(v as double) * 1000000000 + 0.5) as bigint)) as double) / 1000000000 / count(*)")
        .as("c"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)").as("gv"))
    val total = e.crossJoin(broadcast(gmean))
      .withColumn("gdist", expr(
        "round(aggregate(zip_with(embedding, gv, (x, c) -> (cast(x as double) - c) * (cast(x as double) - c)), cast(0 as double), (acc, v) -> acc + v), 6)"))
      .agg(count(lit(1)).as("n"),
        expr("cast(sum(cast(gdist as decimal(38,6))) * 1000000 as bigint)").as("total_micro"))
    val within = simKmeansStep(spark, dir)
      .agg(count_distinct(col("new_label")).as("k"),
        expr("cast(sum(cast(dist as decimal(38,6))) * 1000000 as bigint)").as("within_micro"))
    total.crossJoin(broadcast(within))
      .select(col("n"), col("k"), col("total_micro"), col("within_micro"),
        (col("total_micro") - col("within_micro")).as("between_micro"),
        expr("""CASE WHEN within_micro > 0 AND k > 1 THEN
               | cast(cast(total_micro - within_micro as decimal(38,0)) * (n - k)
               |   * 1000000 div (cast(within_micro as decimal(38,0)) * (k - 1)) as bigint)
               |END""".stripMargin).as("ch_micro"))
  }

  /** Per-cluster purity of the Lloyd-step assignment — the EXTERNAL
    * per-cluster readout (which clusters are clean, which are mixed)
    * beside the corpus-level chance-corrected [[simAri]]: majority
    * true label per assigned cluster (deterministic count-desc,
    * label-asc tie-break) and its share as an exact integer micro.
    * Everything past the assignment is k²-sized cells; the argmax is
    * a window over those cells, not over vectors. */
  def simClusterPurity(spark: SparkSession, dir: String): DataFrame = {
    val cells = simKmeansStep(spark, dir)
      .groupBy(col("new_label"), col("label"))
      .agg(count(lit(1)).as("nij"))
    val w = Window.partitionBy(col("new_label")).orderBy(col("nij").desc, col("label"))
    cells.withColumn("rn", row_number().over(w))
      .groupBy(col("new_label"))
      .agg(sum(col("nij")).as("n_vecs"),
        max(when(col("rn") === 1, col("label"))).as("top_label"),
        max(when(col("rn") === 1, col("nij"))).as("n_top"))
      .select(col("new_label"), col("n_vecs"), col("top_label"), col("n_top"),
        expr("n_top * 1000000 div n_vecs").as("purity_micro"))
      .orderBy(col("new_label"))
  }

  /** Adjusted Rand index between the Lloyd-step cluster assignment
    * ([[simKmeansStep]]'s new_label) and the ground-truth label — the
    * chance-corrected external clustering validation (Hubert &
    * Arabie), completing the eval tier beside the internal metrics
    * (inertia / silhouette / centroid drift). All sufficient
    * statistics are EXACT integer pair counts off the k×k contingency
    * table: Σᵢⱼ C(nᵢⱼ,2), row/column-marginal pair sums and C(n,2);
    * ARI = 2(sp·np − sa·sb) / ((sa+sb)·np − 2·sa·sb) is published as
    * one decimal(38,0) cross-multiplied micro (products ~10³⁰ at
    * 100× test scale — inside decimal(38); the all-one-cluster
    * degenerate makes the denominator 0 and BOTH engines emit NULL
    * via the explicit guard). Everything past the assignment is
    * k²-sized — the contingency aggregate is the only corpus-scale
    * pass, and it rides the assignment's existing shuffle. */
  def simAri(spark: SparkSession, dir: String): DataFrame =
    ariFromAssignment(simKmeansStep(spark, dir)
      .select(col("vec_id"), col("label"), col("new_label")))

  /** ARI sufficient-statistics tail over any (label, new_label)
    * assignment frame — split out so the sign-split quotient is
    * testable on a worse-than-chance fixture (negative ARI), not just
    * the label-seeded Lloyd assignment the gate sees (which is
    * strongly positive by construction). */
  private[graft] def ariFromAssignment(assign: DataFrame): DataFrame = {
    val cells = assign.groupBy(col("label"), col("new_label"))
      .agg(count(lit(1)).as("nij"))
    val sp = cells.agg(
      sum(expr("cast(nij as decimal(38,0)) * (nij - 1) div 2")).as("sum_pairs"),
      sum(col("nij")).as("n"))
    val sa = cells.groupBy(col("label"))
      .agg(sum(col("nij")).as("ai"))
      .agg(sum(expr("cast(ai as decimal(38,0)) * (ai - 1) div 2")).as("sum_a"))
    val sb = cells.groupBy(col("new_label"))
      .agg(sum(col("nij")).as("bj"))
      .agg(sum(expr("cast(bj as decimal(38,0)) * (bj - 1) div 2")).as("sum_b"))
    // the ARI ratio works on the UNdivided n(n−1) (both sides ×2 — the
    // truncated quotient is unchanged) and every product runs in
    // decimal(38,0): the `div 2` pair sums come back as LONGs, and a
    // long×long chain here ANSI-overflowed at sf1 (20k vectors).
    // The quotient is SIGN-SPLIT (sign · (abs(num) div den), the
    // Theil-Sen convention): ARI is NEGATIVE for worse-than-chance
    // agreement — in-domain for the statistic — and Spark's div
    // truncates where the oracle's `//` floors; only the numerator
    // needs the split because the denominator (max−expected index,
    // ×4) is ≥ 0 (sa·sb ≤ min(sa,sb)·n_pairs ≤ (sa+sb)/2·n_pairs)
    // and the <> 0 guard excludes the degenerate zero.
    sp.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
      .select(col("n"),
        col("sum_pairs").cast("bigint").as("sum_pairs"),
        col("sum_a").cast("bigint").as("sum_a"),
        col("sum_b").cast("bigint").as("sum_b"),
        expr("""2 * (cast(sum_pairs as decimal(38,0))
               |       * (cast(n as decimal(38,0)) * (n - 1))
               |     - 2 * cast(sum_a as decimal(38,0)) * sum_b) * 1000000
               |""".stripMargin).as("ari_num"),
        expr("""(cast(sum_a as decimal(38,0)) + sum_b)
               |  * (cast(n as decimal(38,0)) * (n - 1))
               | - 4 * cast(sum_a as decimal(38,0)) * sum_b""".stripMargin).as("ari_den"))
      .select(col("n"), col("sum_pairs"), col("sum_a"), col("sum_b"),
        expr("cast(cast(n as decimal(38,0)) * (n - 1) div 2 as bigint)").as("n_pairs"),
        expr("""CASE WHEN ari_den <> 0 THEN
               | cast(CASE WHEN ari_num < 0 THEN -((-ari_num) div ari_den)
               |           ELSE ari_num div ari_den END as bigint)
               |END""".stripMargin).as("ari_micro"))
  }


  /** Xie–Beni index of the Lloyd assignment — the separation-aware
    * compactness score completing the internal-validation tier
    * (inertia = compactness only, DB = per-cluster worst pair, CH =
    * variance ratio; XB = Σd²/(n·min-sep²) is the one that punishes
    * the single closest centroid pair, the k-selection criterion of
    * the fuzzy-clustering literature). Numerator = the inertia
    * device verbatim (per-row rounded-6 squared distances summed in
    * exact DECIMAL); denominator = n × the minimum squared centroid
    * separation off the k²-row broadcast frame (round-6-first, exact
    * micro); XB publishes as one integer-micro division. Coincident
    * centroids (min sep = 0) → NULL in both engines. */
  def simXieBeni(spark: SparkSession, dir: String): DataFrame = {
    val tot = simKmeansStep(spark, dir)
      .agg(count(lit(1)).as("n_vecs"),
        expr("cast(sum(cast(dist as decimal(38,6))) * 1000000 as decimal(38,0))")
          .as("im"))
    val cent = Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(expr("cast(sum(cast(v as decimal(18,9))) as double) / count(*)").as("c"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)").as("cv"))
    val a = cent.select(col("label").as("i"), col("cv").as("ca"))
    val b = cent.select(col("label").as("j"), col("cv").as("cb"))
    val sep = a.crossJoin(broadcast(b))
      .filter(col("i") =!= col("j"))
      .select(expr(
        """cast(cast(round(aggregate(zip_with(ca, cb, (x, y) -> (x - y) * (x - y)),
          |cast(0 as double), (acc, v) -> acc + v), 6) as decimal(38,6)) * 1000000 as bigint)""".stripMargin)
        .as("sep2_micro"))
      .agg(min(col("sep2_micro")).as("min_sep2_micro"))
    tot.crossJoin(broadcast(sep))
      .select(col("n_vecs"),
        expr("cast(im as bigint)").as("inertia_micro"),
        col("min_sep2_micro"),
        expr("""CASE WHEN min_sep2_micro > 0 THEN
               |cast(im * 1000000 div (cast(n_vecs as decimal(38,0)) * min_sep2_micro) as bigint) END""".stripMargin)
          .as("xb_micro"))
  }

  /** Spherical-Gaussian BIC / AIC of the Lloyd assignment (the
    * Pelleg–Moore X-means scoring rule) — the k-SELECTION criterion
    * completing internal validation: inertia/silhouette/CH/DB/XB rank
    * a FIXED k, BIC is the one you compare ACROSS k (fit +
    * parameter-count penalty p = k(d+1)). Everything evaluates in
    * BASE-2 fixed point (the entropy/perplexity contract —
    * "bits-BIC", a constant lg₂e factor off the nats version,
    * documented): σ̂² = SSE_micro/(10⁶·d·(n−k)) enters as
    * lg(SSE_micro) − lg(10⁶·d·(n−k)), the transcendental constants
    * lg₂(2π) and lg₂(e) are the shared LITERAL integers 2780295 /
    * 1512775 (⌊2²⁰·c⌋ — engine math libraries never enter), and the
    * doubled log-likelihood F2 = 2·ll·2²⁰ =
    * −n·d·(LG2PI + lgσ²) − d·(n−k)·LG2E + 2·Σⱼnⱼ·lg nⱼ − 2·n·lg n
    * stays an exact integer. BIC_bits = −2·ll + p·lg n and
    * AIC_bits = −2·ll + 2p·lg₂e publish as SIGN-SPLIT milli
    * divisions (ll is negative; Spark div truncates, DuckDB //
    * floors — the q182 lesson). Perfect fit (SSE = 0) or n ≤ k
    * guard the scores to NULL. One k-row frame past the assignment;
    * the corpus is touched once by the shared Lloyd pass. */
  def simKmeansBic(spark: SparkSession, dir: String): DataFrame = {
    def lgS(x: String): String =
      s"(CASE WHEN ($x) < 8796093022208 THEN log2_fixed($x)" +
        s" ELSE log2_fixed(($x) div shiftleft(cast(1 as bigint), length(bin($x)) - 43))" +
        s" + cast(length(bin($x)) - 43 as bigint) * 1048576 END)"
    def signedDiv(num: String, den: String): String =
      s"""cast(CASE WHEN ($num) < 0 THEN -((-($num)) div ($den))
         |     ELSE ($num) div ($den) END as bigint)""".stripMargin
    val dd = Tables.embeddings(spark, dir)
      .agg(max(size(col("embedding"))).cast("long").as("d"))
    val per = simKmeansStep(spark, dir)
      .groupBy(col("new_label"))
      .agg(count(lit(1)).as("n_j"),
        expr("cast(sum(cast(dist as decimal(38,6))) * 1000000 as decimal(38,0))").as("sse_j"))
    per
      .agg(sum(col("n_j")).as("n"), count(lit(1)).as("k"),
        expr("cast(sum(sse_j) as bigint)").as("sse_micro"),
        sum(expr(s"cast(n_j as decimal(38,0)) * ${lgS("n_j")}")).as("snl"))
      .crossJoin(broadcast(dd))
      .withColumn("f2", expr(
        s"""CASE WHEN n > k AND sse_micro > 0 THEN
           | - cast(n as decimal(38,0)) * d
           |   * (2780295 + ${lgS("sse_micro")} - ${lgS("1000000 * d * (n - k)")})
           | - cast(d as decimal(38,0)) * (n - k) * 1512775
           | + 2 * snl
           | - 2 * cast(n as decimal(38,0)) * ${lgS("n")} END""".stripMargin))
      .select(col("n").as("n_vecs"), col("k"), col("d"), col("sse_micro"),
        expr(signedDiv("f2 * 1000", "cast(2097152 as decimal(38,0))"))
          .as("ll_bits_milli"),
        expr(signedDiv(
          s"(-f2 + cast(k as decimal(38,0)) * (d + 1) * ${lgS("n")}) * 1000",
          "cast(1048576 as decimal(38,0))")).as("bic_bits_milli"),
        expr(signedDiv(
          "(-f2 + cast(k as decimal(38,0)) * (d + 1) * 2 * 1512775) * 1000",
          "cast(1048576 as decimal(38,0))")).as("aic_bits_milli"))
  }

  /** Hopkins statistic of clustering TENDENCY — the missing rung
    * BEFORE the validation ladder (inertia/CH/DB/XB/BIC all presume
    * clusters exist; Hopkins asks whether the corpus has any
    * structure to cluster at all: H → 0.5 on uniform noise, → 1 on
    * clustered data). Fully deterministic twin of the sampled
    * statistic: data probes = the m smallest-md5("hop:"+id) vectors
    * (distributed TakeOrdered, never a corpus-serial window);
    * synthetic uniform probes = per-dimension min + md5-fraction ·
    * range (8 hex nibbles / 2³² — exact in double, the q31 carve
    * family); both nearest-neighbour minima are sqrt-free squared-L2
    * (the silhouette convention), floored ONCE to micro, summed
    * exact; H publishes as the exact integer ratio Σu·10⁶ div
    * (Σu+Σw). Two broadcast corpus passes (2m probe rows against
    * the scan), one 64-row bounds frame. */
  def simHopkins(spark: SparkSession, dir: String, m: Int = 50): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val probes = e.select(col("vec_id"), col("embedding"))
      .orderBy(expr("md5(concat('hop:', cast(vec_id as string)))"), col("vec_id"))
      .limit(m)
    val bounds = e
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(expr("cast(v as double)")).as("lo"), max(expr("cast(v as double)")).as("hi"))
    val synth = spark.range(0, m).select(col("id").as("probe_id"))
      .crossJoin(broadcast(bounds))
      .withColumn("frac", expr(
        """cast(conv(substring(md5(concat('hopu:', cast(probe_id as string), ':',
          |cast(pos + 1 as string))), 1, 8), 16, 10) as double) / 4294967296.0""".stripMargin))
      .withColumn("coord", expr("lo + frac * (hi - lo)"))
      .groupBy(col("probe_id"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, coord))), x -> x.coord)")
        .as("pe"))
    val wmin = e.crossJoin(broadcast(probes.select(col("vec_id").as("pid"),
        col("embedding").as("p_emb"))))
      .filter(col("vec_id") =!= col("pid"))
      .withColumn("d2", expr(
        """aggregate(zip_with(p_emb, embedding,
          |(x, y) -> (cast(x as double) - cast(y as double)) * (cast(x as double) - cast(y as double))),
          |cast(0 as double), (acc, v) -> acc + v)""".stripMargin))
      .groupBy(col("pid"))
      .agg(expr("cast(floor(1000000 * min(d2)) as bigint)").as("w2"))
      .agg(count(lit(1)).as("m_probes"), sum(col("w2")).as("sum_w2"))
    val umin = e.crossJoin(broadcast(synth))
      .withColumn("d2", expr(
        """aggregate(zip_with(pe, embedding,
          |(x, y) -> (x - cast(y as double)) * (x - cast(y as double))),
          |cast(0 as double), (acc, v) -> acc + v)""".stripMargin))
      .groupBy(col("probe_id"))
      .agg(expr("cast(floor(1000000 * min(d2)) as bigint)").as("u2"))
      .agg(sum(col("u2")).as("sum_u2"))
    wmin.crossJoin(broadcast(umin))
      .select(col("m_probes").as("m"),
        col("sum_w2").as("sum_w2_micro"),
        col("sum_u2").as("sum_u2_micro"),
        expr("cast(cast(sum_u2 as decimal(38,0)) * 1000000 div (cast(sum_u2 as decimal(38,0)) + sum_w2) as bigint)")
          .as("hopkins_micro"))
  }
}
