package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}

/** Archive discovery — the Spark-native equivalent of zipFileUtils.py.
  *
  * Uses the Hadoop FileSystem API instead of a local glob so the same code
  * lists a POSIX dir on a dev box and an HDFS/S3 prefix on a cluster
  * (zipFileUtils.py:7-17 is local-only).
  */
object FileDiscovery {

  private def list(dir: String, prefix: String, extension: String,
      conf: Configuration): Seq[FileStatus] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(conf)
    if (!fs.exists(path)) return Seq.empty
    fs.listStatus(path).toSeq.filter { st =>
      val n = st.getPath.getName
      st.isFile && n.startsWith(prefix) && n.endsWith("." + extension)
    }
  }

  /** Most recent matching file by modification time
    * (zipFileUtils.py:7-17); None when nothing matches. */
  def mostRecent(dir: String, prefix: String, extension: String,
      conf: Configuration = new Configuration()): Option[String] =
    list(dir, prefix, extension, conf)
      .sortBy(st => (st.getModificationTime, st.getPath.getName))
      .lastOption.map(_.getPath.toString)

  /** All matching archives — the scale path: at 100 TB you process every
    * outstanding archive in one distributed read, not one file per run. */
  def all(dir: String, prefix: String, extension: String,
      conf: Configuration = new Configuration()): Seq[String] =
    list(dir, prefix, extension, conf).map(_.getPath.toString).sorted

  /** `\d{4}-\d{2}-\d{2}` from the basename (zipFileUtils.py:25-35). */
  private val DatePattern = "\\d{4}-\\d{2}-\\d{2}".r
  def extractFileDate(path: String): Option[String] = {
    val base = path.split('/').last
    DatePattern.findFirstIn(base)
  }

  /** The reference's year/protocol archive layout
    * (dataimporter.py:97,109-115). */
  def dataPath(archiveRoot: String, year: Int, protocol: String): String =
    s"$archiveRoot/$year/$protocol/"
}
