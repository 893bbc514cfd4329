package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.GraftFunctions

/** Session-extension entry point for cluster deployment:
  * `--conf spark.sql.extensions=graft.GraftExtensions` registers the
  * native vector functions in every session the cluster creates. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach(ext.injectFunction)
}
