package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.util.Json
import graft.util.Json.{JArr, JDouble, JInt, JObj, JStr, JValue}
import graft.parse.Pdf

/** SwissInfo PDF → OCR-JSON pre-extraction — the engine-side form of
  * the reference's preprocessing script
  * (importer_scripts/preprocessing/swissinfo_extract_ocr_from_pdfs.py),
  * closing the raw-input gap: a user starting from the SOC bulletin
  * PDFs can now reach [[graft.parse.SwissInfoImporter]]'s input with
  * this job alone.
  *
  * Faithful re-expression of the script's dataflow:
  *  - canonical path/id from the PDF filename
  *    (`<x>_<x>_<program>_<YYYYMMDD>_<LANG>[_<edition>].pdf` →
  *    `SOC_<program>/<yyyy>/<mm>/<dd>/<edition>`, script:152-193; the
  *    edition branch reproduces the intended `chr(n + 96)` letter —
  *    the reference applies it to the raw string, a latent TypeError
  *    its corpus never hits because no multi-edition day exists);
  *  - per page: the PyMuPDF `get_text("dict")` block/line/span tree
  *    with bboxes, here from the pure-JVM [[graft.parse.Pdf]] reader;
  *  - every bbox also carried as `rescaled_bbox` in facsimile pixels
  *    (`rescale_coords`, utils.py — the linear map from the PDF point
  *    space to the rendered page size at `dpi`);
  *  - the facsimile JP2 PATHS are minted exactly as the script does
  *    (`images/<canonical_path>/<id>-pNNNN.jp2`); the pixel rendering
  *    itself requires a raster+JPEG2000 toolchain (the script uses
  *    pdf2image+PIL) and is out of scope here — the OCR-JSON dataflow
  *    is the importer's input surface, and the importer touches only
  *    the path NAMES.
  *
  * Distribution: one task per PDF (the ImportJob broadcast-index
  * pattern); a malformed PDF becomes an error row, never a job
  * failure. Output lands in the `WW2-SOC-bulletins-json/...` layout
  * [[graft.parse.SwissInfoImporter.detectIssues]] walks.
  */
object SwissInfoPdfExtract {

  /** (canonicalPath, lang) from a bulletin PDF filename —
    * script:152-193. */
  def canonicalPath(filename: String): (String, String) = {
    val elements = filename.split("\\.")(0).split("_")
    require(elements.length >= 5,
      s"unexpected SOC bulletin filename: $filename")
    val program = elements(2)
    val date = elements(3)
    require(date.matches("\\d{8}"), s"bad date in $filename")
    val lang = elements(4).toLowerCase
    val edition =
      if (elements.length > 5) ('a' + elements(5).toInt - 1).toChar
      else 'a'
    val path = s"SOC_$program/${date.substring(0, 4)}/" +
      s"${date.substring(4, 6)}/${date.substring(6, 8)}/$edition"
    (path, lang)
  }

  /** `rescale_coords` (utils.py): linear map between coordinate
    * spaces. */
  def rescale(bbox: Seq[Double], cur: (Double, Double),
      dest: (Double, Double)): Seq[Double] = {
    val fx = dest._1 / cur._1
    val fy = dest._2 / cur._2
    Seq(bbox(0) * fx, bbox(1) * fy, bbox(2) * fx, bbox(3) * fy)
  }

  private def boxJson(b: Seq[Double]): JValue =
    JArr(b.map(v => JDouble(v)))

  /** The OCR JSON document for one PDF — the
    * `pdf_to_jp2_and_ocr_json` output (script:243-334). */
  def ocrJson(filename: String, originalPath: String,
      pdfBytes: Array[Byte], outBaseDir: String,
      dpi: Int = 200): (String, String, String, Int) = {
    val (canPath, lang) = canonicalPath(filename)
    val canId = canPath.replace("/", "-")
    val pages = Pdf.extract(pdfBytes)
    require(pages.nonEmpty,
      s"$filename: no parseable pages — not a PDF or an unsupported one")
    val jp2Paths = pages.indices.map(i =>
      s"$outBaseDir/images/$canPath/$canId-p${"%04d".format(i + 1)}.jp2")
    val ocrPages = pages.zipWithIndex.map { case (p, idx) =>
      val cur = (p.width, p.height)
      val dest = (math.round(p.width * dpi / 72.0).toDouble,
        math.round(p.height * dpi / 72.0).toDouble)
      def withRescaled(b: Seq[Double]): Seq[(String, JValue)] = Seq(
        "bbox" -> boxJson(b),
        "rescaled_bbox" -> boxJson(rescale(b, cur, dest)))
      val blocks = p.blocks.map { bl =>
        JObj(withRescaled(bl.bbox) :+
          ("lines" -> (JArr(bl.lines.map { ln =>
            JObj(withRescaled(ln.bbox) :+
              ("spans" -> (JArr(ln.spans.map { sp =>
                JObj(withRescaled(sp.bbox) :+
                  ("text" -> (JStr(sp.text): JValue)))
              }): JValue)))
          }): JValue)))
      }
      JObj(Seq(
        "page_num" -> JInt(idx.toLong),
        "ocr_page_size" -> boxJson(Seq(p.width, p.height)),
        "jp2_img_size" -> JArr(Seq(JInt(dest._1.toLong), JInt(dest._2.toLong))),
        "blocks_with_lines" -> JArr(blocks),
        "blocks_without_lines" -> JArr(Nil)))
    }
    val doc = JObj(Seq(
      "canonical_id" -> JStr(canId),
      "lang" -> JStr(lang),
      "original_path" -> JStr(originalPath),
      "jp2_full_paths" -> Json.strs(jp2Paths),
      "ocr_pages" -> JArr(ocrPages)))
    (canPath, canId, Json.render(doc), pages.length)
  }

  /** Run the pre-extraction over every `*.pdf` under `inputDir`,
    * writing `<outDir>/WW2-SOC-bulletins-json/<canonical_path>/
    * <canonical_id>.json` — the exact tree
    * [[graft.parse.SwissInfoImporter.detectIssues]] consumes.
    * Returns a summary frame (issue_id, n_pages, error). */
  def run(spark: SparkSession, inputDir: String, outDir: String,
      dpi: Int = 200): DataFrame = {
    import spark.implicits._
    val listed = new java.io.File(inputDir).listFiles()
    require(listed != null,
      s"SwissInfoPdfExtract: input dir not found or unreadable: $inputDir")
    val files = listed
      .filter(f => f.isFile && f.getName.toLowerCase.endsWith(".pdf"))
      .map(_.getAbsolutePath).sorted.toIndexedSeq
    val filesB = spark.sparkContext.broadcast(files)
    val dataRoot = s"$outDir/${graft.parse.SwissInfoImporter.DataDirname}"
    val parallelism = math.max(1, math.min(files.size,
      spark.sparkContext.defaultParallelism))
    spark.createDataset(files.indices.toList)
      .repartition(parallelism)
      .map { i =>
        val path = filesB.value(i)
        val name = new java.io.File(path).getName
        try {
          val bytes = java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(path))
          val (canPath, canId, json, nPages) = ocrJson(name, path,
            bytes, outDir, dpi)
          val dir = java.nio.file.Paths.get(dataRoot, canPath)
          java.nio.file.Files.createDirectories(dir)
          java.nio.file.Files.writeString(dir.resolve(s"$canId.json"), json)
          (canId, nPages, None: Option[String])
        } catch {
          case e: Exception =>
            (name, 0, Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
        }
      }
      .toDF("issue_id", "n_pages", "error")
  }
}
