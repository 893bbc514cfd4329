package graft

import graft.functions.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage-level timing probe for the text/dedup hot path —
  * isolates tokenizer/ngram cost from signature cost from pairing cost
  * so optimization work targets the measured bottleneck, not a guess.
  * Not part of the driver contract. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_PROBE_STAGES=1 prints per-stage wall/task/GC/spill —
    // the tool that separates "one stage balloons" from "everything
    // drifts" when a sample runs hot.
    if (sys.env.get("SPARK_GRAFT_PROBE_STAGES").contains("1")) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val m = i.taskMetrics
          val wall = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s).getOrElse(-1L)
          println(f"[stage] id=${i.stageId}%-4d tasks=${i.numTasks}%-4d wall=${wall / 1e3}%7.2fs " +
            f"task=${m.executorRunTime / 1e3}%8.2fs gc=${m.jvmGCTime / 1e3}%7.2fs " +
            f"memSpill=${m.memoryBytesSpilled / 1000000}%6dMB diskSpill=${m.diskBytesSpilled / 1000000}%6dMB " +
            f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1000000}%6dMB " +
            i.name.takeWhile(_ != '\n').take(60))
        }
      })
    }
    spark.read.parquet(s"$sfDir/region.parquet").count()

    // SPARK_GRAFT_PROBE_REPEAT > 1 prints every sample — the tool for
    // separating a bimodal plan (same JVM, samples split into modes)
    // from host contention (samples drift together).
    val repeat = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPEAT", "1").toInt
    // SPARK_GRAFT_PROBE_ONLY=name,name runs a subset (fresh-JVM isolation
    // of one stage from the allocation churn of the stages before it).
    val probeOnly = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(',').map(_.trim).toSet)
    def time(name: String)(f: => Long): Unit = {
      if (probeOnly.exists(!_.contains(name))) return
      var i = 0
      while (i < repeat) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
        // clear only BETWEEN repeats: repeat>1 mode wants cold samples,
        // but default single-run mode must keep cache reuse across
        // probes so its timings stay comparable to historical records
        if (i + 1 < repeat) spark.catalog.clearCache()
        i += 1
      }
    }

    val docs = TextOps.balanced(Tables.documents(spark, sfDir))

    time("ngram3_explode") {
      docs.select(col("doc_id"), explode(TextOps.shingleArray("text")).as("s")).count()
    }
    time("ngram3_distinct_explode") {
      docs.select(col("doc_id"),
        explode(array_distinct(TextOps.shingleArray("text"))).as("s")).count()
    }
    time("minhash_bands_native") {
      docs.select(col("doc_id"), TextOps.shingleArray("text").as("sh"))
        .filter(size(col("sh")) > 0)
        .select(col("doc_id"), org.apache.spark.sql.graft.TextExpressions
          .minhashBands(col("sh"), 8, 4).as("bands"))
        .select(col("doc_id"), element_at(col("bands"), 1).as("b0"))
        .count()
    }
    time("fingerprint_minmd5") {
      docs.select(col("doc_id"), TextOps.shingleArray("text").as("sh"))
        .filter(size(col("sh")) > 0)
        .select(col("doc_id"),
          org.apache.spark.sql.graft.TextExpressions.md5Min(col("sh")).as("fp"))
        .count()
    }
    time("dd_minhash_lsh_full") {
      operators.Dedup.ddMinhashLsh(spark, sfDir).count()
    }
    time("dd_ngram_jaccard_full") {
      operators.Dedup.ddNgramJaccard(spark, sfDir).count()
    }
    time("jaccard_pairs_unsorted") {
      operators.Dedup.jaccardPairs(spark, sfDir).count()
    }
    time("dd_components_full") {
      operators.Dedup.ddComponents(spark, sfDir).count()
    }
    time("pipe_clean_full") {
      operators.CorpusPipeline.pipeCleanCorpus(spark, sfDir).count()
    }
    spark.stop()
  }
}
