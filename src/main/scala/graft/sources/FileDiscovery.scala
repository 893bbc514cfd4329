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

  /** Move a processed archive into `destDir` (zipFileUtils.py:60-69,
    * `move_processed_file`). Hadoop FS rename, so the same call works
    * on POSIX, HDFS and S3A; the destination directory is created if
    * absent. Returns false (never throws) when the source is missing
    * or the rename is refused — mirroring the reference's print-and-
    * continue error handling. */
  def moveProcessed(filePath: String, destDir: String,
      conf: Configuration = new Configuration()): Boolean =
    try {
      val src = new Path(filePath)
      val fs = src.getFileSystem(conf)
      if (!fs.exists(src)) false
      else {
        val dir = new Path(destDir)
        if (!fs.exists(dir)) fs.mkdirs(dir)
        fs.rename(src, new Path(dir, src.getName))
      }
    } catch { case _: Exception => false }

  /** Delete a temp/processed file (zipFileUtils.py:50-58,
    * `delete_file`). Returns false on missing file or failure instead
    * of throwing, like the reference. */
  def delete(filePath: String,
      conf: Configuration = new Configuration()): Boolean =
    try {
      val p = new Path(filePath)
      val fs = p.getFileSystem(conf)
      fs.exists(p) && fs.delete(p, false)
    } catch { case _: Exception => false }
}
