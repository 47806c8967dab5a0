package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Patch-style canonical reprocessing (SURVEY.md §0 side concerns;
  * reference: importer_scripts/patching/canonical_patch_*.py).
  *
  * The reference's patches are one-off Dask scripts that read canonical
  * JSONL from S3, apply a per-issue/per-page fix, and rewrite the
  * affected (title, year) partitions. Here each patch is a declarative
  * DataFrame transform, so a patch run is
  *
  *   readIssues → patch transform → writePartitioned (overwrite)
  *
  * and Spark's dynamic partition overwrite replaces exactly the
  * (alias, year) partitions the patch touched — the idempotent-rewrite
  * posture that replaces the reference's temp-dir + re-upload dance.
  */
object PatchJob {

  /** canonical_patch_1_uzh `uzh_image_base_uri`: point every page's
    * IIIF base at the impresso proxy for its canonical id. */
  def patchPageIiifBase(pages: DataFrame, iiifBase: String): DataFrame =
    pages.withColumn("iiif_img_base_uri",
      concat(lit(iiifBase.stripSuffix("/") + "/"), col("id")))

  /** canonical_patch_5_rero `add_ro_to_items`: stamp the reading order
    * on every content item — rank CIs by (pages spanned, item number),
    * the utils.py get_reading_order semantics, as a pure Column
    * expression over the nested array (no shuffle, no UDF). */
  def patchAddReadingOrder(issues: DataFrame): DataFrame = {
    // rank via the sorted array of (pp, num) keys; arrays_zip keeps the
    // original order for the position lookup
    val keyed = transform(col("i"), ci => struct(
      ci.getField("m").getField("pp").as("pp"),
      regexp_extract(ci.getField("m").getField("id"), "-i(\\d+)$", 1)
        .cast("int").as("num")))
    val ranked = array_sort(keyed)
    issues.withColumn("i", transform(col("i"), ci => {
      val key = struct(
        ci.getField("m").getField("pp").as("pp"),
        regexp_extract(ci.getField("m").getField("id"), "-i(\\d+)$", 1)
          .cast("int").as("num"))
      val ro = array_position(ranked, key).cast("int")
      ci.withField("m.ro", ro)
    }))
  }

  /** Generic field patch: apply `fix` to every content item of every
    * issue — the shape shared by all canonical patches (patch a nested
    * field, leave everything else untouched). */
  def patchContentItems(issues: DataFrame, fix: Column => Column): DataFrame =
    issues.withColumn("i", transform(col("i"), fix))
}
