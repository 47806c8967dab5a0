package graft.sources

import java.util.zip.ZipFile

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Zip-archive source (SURVEY.md §2.1 S4): issues shipped as one zip per
  * issue (Olive, SWA, BL — importers/classes.py:200-266 ZipArchive).
  *
  * The reference unpacks each zip to a temp directory; here entries are
  * read directly with `java.util.zip.ZipFile` inside a per-partition
  * task — no temp files, no cleanup, re-execution-safe. Listing and
  * reading happen executor-side so a directory of thousands of zips
  * fans out across the cluster.
  */
object ZipSource {

  case class ZipEntryRow(archive: String, entry: String, bytes: Array[Byte])

  /** Read all entries matching `entryFilter` from each zip under `dir`.
    * Returns (archive path, entry name, payload bytes). */
  def read(spark: SparkSession, dir: String,
      entryFilter: String => Boolean = _ => true): DataFrame = {
    import spark.implicits._
    val zips = graft.util.FsWalk.files(dir)
      .filter(_.name.toLowerCase.endsWith(".zip"))
      .map(_.path).sorted
    spark.createDataset(zips)
      .repartition(math.max(1, math.min(zips.size,
        spark.sparkContext.defaultParallelism)))
      .flatMap { path =>
        // executor-side: withLocalFile passes local paths through and
        // stages remote archives to scratch for ZipFile's random
        // access, deleting the staged copy when the task is done
        graft.util.FsWalk.withLocalFile(path) { local =>
          val zf = new ZipFile(local)
          try {
            val entries = scala.jdk.CollectionConverters
              .EnumerationHasAsScala(zf.entries).asScala.toList
            entries.filter(e => !e.isDirectory && entryFilter(e.getName))
              .map { e =>
                val in = zf.getInputStream(e)
                val bytes = in.readAllBytes()
                in.close()
                ZipEntryRow(path, e.getName, bytes)
              }
          } finally zf.close()
        }
      }
      .toDF()
  }
}
