package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.{AsOfJoinStrategy, GraftFunctions, TopKPerGroupRewrite, TopKPerGroupStrategy}

/** Session-extension entry point for cluster deployment:
  * `--conf spark.sql.extensions=graft.GraftExtensions` registers the
  * native vector functions, the top-k-per-group optimizer rewrite
  * (window `row_number() <= k` → bounded-heap physical operator) and
  * its planner strategy in every session the cluster creates. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => TopKPerGroupRewrite)
    ext.injectPlannerStrategy(_ => TopKPerGroupStrategy)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
