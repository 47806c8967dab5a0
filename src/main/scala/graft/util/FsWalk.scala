package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Directory listing over Hadoop's `FileSystem` API, so driver-side
  * issue-tree walks ([[graft.discover.Discover]],
  * [[graft.sources.IssueTreeSource]]) work against any store Spark can
  * reach — local disk in tests, HDFS/object stores at deployment —
  * instead of being hard-wired to `java.io.File`. The reference walks a
  * POSIX mount (importers/detect.py os.listdir); a 100 TB deployment
  * lists a remote store, same pruning.
  */
object FsWalk {

  /** A listed subdirectory: `name` is the final path segment, `path`
    * round-trips into the next [[subdirs]] call or into file-opening
    * code (local paths come back scheme-less so `java.io`-based parsers
    * keep working). */
  case class Dir(name: String, path: String)

  /** The active session's Hadoop conf (carries fs.* credentials), or a
    * default conf off-session (tests, bare tools). */
  def hadoopConf: Configuration =
    SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  private def externalForm(p: Path): String = {
    val uri = p.toUri
    if (uri.getScheme == null || uri.getScheme == "file") uri.getPath
    else p.toString
  }

  /** Subdirectories of `base`, sorted by name; a missing base lists as
    * empty (detect over an absent alias is zero issues, not a crash). */
  def subdirs(base: String): Seq[Dir] = {
    val p = new Path(base)
    val fs = p.getFileSystem(hadoopConf)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(s => Dir(s.getPath.getName, externalForm(s.getPath)))
      .sortBy(_.name)
  }
}
