package graft.jobs

import java.io.File

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

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
  * executors, and the report is a DataFrame that writes partitioned by
  * title. Checkpoint/resume comes free from rerunning: the audit is a
  * pure function of the input trees.
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

  /** Leaf directories (no subdirectories) under `base/title/...` — the
    * reference's `len(sub_dirs) == 0` walk condition. */
  private def leafDirs(base: File): Seq[File] = {
    def walk(f: File): Seq[File] = {
      val subs = Option(f.listFiles).getOrElse(Array.empty)
        .filter(_.isDirectory).sortBy(_.getName)
      if (subs.isEmpty) Seq(f) else subs.toSeq.flatMap(walk)
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
    val imgBase = new File(imgBasePath)
    val wanted = Option(imgBase.listFiles).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName).sorted
      .filter(t => titles.isEmpty || titles.contains(t))
    val refs = wanted.flatMap { title =>
      leafDirs(new File(imgBase, title)).map { dir =>
        val sub = dir.getPath.stripPrefix(imgBase.getPath)
          .stripPrefix(File.separator)
        val issueId = sub.replace(File.separatorChar, '-')
        // original tree has no edition leaf: drop the final '/ed'
        // (find_issues.py:155 `[:-2]`)
        val ogDir = new File(ogBasePath,
          sub.split(File.separatorChar).dropRight(1).mkString(File.separator))
        IssueDirRef(issueId, title, dir.getPath, ogDir.getPath)
      }
    }.toIndexedSeq
    val refsB = spark.sparkContext.broadcast(refs)
    val parallelism = math.max(1, math.min(refs.size,
      spark.sparkContext.defaultParallelism))
    spark.createDataset(refs.indices.toList)
      .repartition(parallelism)
      .map(i => audit(refsB.value(i)))
  }

  private def audit(ref: IssueDirRef): AuditRow = {
    val files = Option(new File(ref.imgDir).listFiles)
      .getOrElse(Array.empty).filter(_.isFile)
    val infoFiles = files.filter(_.getName.endsWith("image-info.json"))
    val conv: Seq[PageConv] =
      if (infoFiles.length == 1) parseImageInfo(infoFiles.head)
      else Nil

    val zipFile = new File(ref.ogDir, "Document.zip")
    val (contents, resolutions, zipErr) =
      if (!zipFile.exists()) (Nil, Nil, None)
      else try {
        val zf = new java.util.zip.ZipFile(zipFile)
        try {
          val names = {
            val e = zf.entries(); val b = Seq.newBuilder[String]
            while (e.hasMoreElements) b += e.nextElement().getName
            b.result()
          }
          // image page files, and the subset whose basename embeds a
          // resolution (`Pg001_300.png`, find_issues.py:46-48)
          val pgRes = names.filter(n => n.contains("Img") && n.contains("Pg"))
          (pgRes, pgRes.filter(_.contains("_")), None)
        } finally zf.close()
      } catch {
        case e: Exception => (Nil, Nil,
          Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
      }

    AuditRow(ref.issueId, ref.title,
      info_file_present = infoFiles.length == 1,
      n_info_files = infoFiles.length,
      conv = conv,
      zip_doc_present = zipFile.exists(),
      zip_img_contents = contents,
      resolutions = resolutions,
      zip_error = zipErr)
  }

  private def parseImageInfo(f: File): Seq[PageConv] = try {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(f)
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
