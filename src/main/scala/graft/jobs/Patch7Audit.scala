package graft.jobs

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Dataset, SparkSession}

import graft.util.FsWalk

/** The patch-7 discovery audit
  * (importer_scripts/patching/canonical_patch_7_find_issues.py): for
  * every issue directory of every title, collect (a) the converted image
  * tree's `image-info.json` contents (conversion source, strategy,
  * source/destination dimensions per page) and (b) the original
  * `Document.zip` archive's image listing plus the resolutions embedded
  * in `..._RES.ext` filenames. A curator triages this report into the
  * patch-7 resolution table consumed by
  * [[PatchJob.patch7RescaleIssues]]/[[PatchJob.patch7RescalePages]].
  *
  * The reference runs this as a single-process `os.walk` with periodic
  * JSON checkpoints (find_issues.py:110-192) — hours over a full
  * collection. Here the walk stays a cheap driver-side listing of issue
  * directories (same posture as [[graft.discover.Discover]]); the
  * per-issue IO — JSON parse + zip directory read — fans out over
  * executors through Hadoop's FileSystem API (local disk, HDFS or
  * object stores; the driver's Hadoop conf ships to tasks as key/value
  * pairs so credentials follow). Checkpoint/resume comes free from
  * rerunning: the audit is a pure function of the input trees.
  */
object Patch7Audit {

  /** One page's conversion record from `image-info.json`
    * (find_issues.py:129-137: `s`, `strat`, `s_dim`, `d_dim`). Dims are
    * kept as raw JSON text — the reference stores them opaquely too. */
  case class PageConv(page: Int, source_used: Option[String],
      strat: Option[String], s_dim: Option[String], d_dim: Option[String])

  case class AuditRow(
      issue_id: String,
      title: String,
      info_file_present: Boolean,
      n_info_files: Int,
      conv: Seq[PageConv],
      zip_doc_present: Boolean,
      zip_img_contents: Seq[String],
      resolutions: Seq[String],
      zip_error: Option[String])

  private case class IssueDirRef(issueId: String, title: String,
      imgDir: String, ogDir: String)

  /** Leaf directories (no subdirectories) under `base` — the
    * reference's `len(sub_dirs) == 0` walk condition. */
  private def leafDirs(base: String): Seq[String] = {
    def walk(p: String): Seq[String] = {
      val subs = FsWalk.subdirs(p)
      if (subs.isEmpty) Seq(p) else subs.flatMap(d => walk(d.path))
    }
    walk(base)
  }

  /** Run the audit over the converted-image tree (`imgBasePath/title/
    * year/mm/dd/ed`) against the original tree (`ogBasePath` — same
    * layout minus the edition leaf, find_issues.py:155). `titles` empty
    * means every title present in the image tree. */
  def run(spark: SparkSession, imgBasePath: String, ogBasePath: String,
      titles: Seq[String] = Nil): Dataset[AuditRow] = {
    import spark.implicits._
    val imgBase = stripTrailing(imgBasePath)
    val ogBase = stripTrailing(ogBasePath)
    val wanted = FsWalk.subdirs(imgBase)
      .filter(t => titles.isEmpty || titles.contains(t.name))
    val refs = wanted.flatMap { title =>
      leafDirs(title.path).map { dir =>
        val sub = dir.stripPrefix(imgBase).stripPrefix("/")
        val issueId = sub.replace('/', '-')
        // original tree has no edition leaf: drop the final '/ed'
        // (find_issues.py:155 `[:-2]`)
        val ogDir = s"$ogBase/${sub.split('/').dropRight(1).mkString("/")}"
        IssueDirRef(issueId, title.name, dir, ogDir)
      }
    }.toIndexedSeq
    // ship the driver's Hadoop conf (fs credentials) to tasks
    val confKv = FsWalk.hadoopConf.iterator().asScala
      .map(e => e.getKey -> e.getValue).toArray
    val refsB = spark.sparkContext.broadcast(refs)
    val parallelism = math.max(1, math.min(refs.size,
      spark.sparkContext.defaultParallelism))
    spark.createDataset(refs.indices.toList)
      .repartition(parallelism)
      .mapPartitions { it =>
        val conf = new Configuration(false)
        confKv.foreach { case (k, v) => conf.set(k, v) }
        it.map(i => audit(refsB.value(i), conf))
      }
  }

  private def stripTrailing(p: String): String =
    if (p.length > 1 && p.endsWith("/")) p.dropRight(1) else p

  private def audit(ref: IssueDirRef, conf: Configuration): AuditRow = {
    val imgPath = new Path(ref.imgDir)
    val fs = imgPath.getFileSystem(conf)
    val files =
      if (!fs.exists(imgPath)) Array.empty[Path]
      else fs.listStatus(imgPath).filter(_.isFile).map(_.getPath)
    val infoFiles = files.filter(_.getName.endsWith("image-info.json"))
    val conv: Seq[PageConv] =
      if (infoFiles.length == 1) parseImageInfo(fs, infoFiles.head)
      else Nil

    val zipPath = new Path(ref.ogDir, "Document.zip")
    val zipFs = zipPath.getFileSystem(conf)
    val zipExists = zipFs.exists(zipPath)
    val (contents, resolutions, zipErr) =
      if (!zipExists) (Nil, Nil, None)
      else try {
        val zis = new java.util.zip.ZipInputStream(zipFs.open(zipPath))
        try {
          val b = Seq.newBuilder[String]
          var e = zis.getNextEntry
          while (e != null) { b += e.getName; e = zis.getNextEntry }
          val names = b.result()
          // image page files, and the subset whose basename embeds a
          // resolution (`Pg001_300.png`, find_issues.py:46-48)
          val pgRes = names.filter(n => n.contains("Img") && n.contains("Pg"))
          (pgRes, pgRes.filter(_.contains("_")), None)
        } finally zis.close()
      } catch {
        case e: Exception => (Nil, Nil,
          Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
      }

    AuditRow(ref.issueId, ref.title,
      info_file_present = infoFiles.length == 1,
      n_info_files = infoFiles.length,
      conv = conv,
      zip_doc_present = zipExists,
      zip_img_contents = contents,
      resolutions = resolutions,
      zip_error = zipErr)
  }

  private def parseImageInfo(fs: FileSystem, f: Path): Seq[PageConv] = try {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val in = fs.open(f)
    val root = try mapper.readTree(in) finally in.close()
    if (!root.isArray) Nil
    else (0 until root.size).map { p =>
      val n = root.get(p)
      def str(k: String): Option[String] =
        Option(n.get(k)).filterNot(_.isNull).map(v =>
          if (v.isTextual) v.asText else v.toString)
      PageConv(p, str("s"), str("strat"), str("s_dim"), str("d_dim"))
    }
  } catch { case _: Exception => Nil }
}
