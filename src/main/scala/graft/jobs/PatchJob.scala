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

  /** The full canonical patch 5 job shape: [[patchAddReadingOrder]]
    * restricted to a title list — the reference runs `add_ro_to_items`
    * over exactly the RERO 2/3 titles it fetches
    * (canonical_patch_5_rero.py:60-89 RERO_2_3_TITLES, :37-42
    * add_ro_to_items, utils.py:139-158 get_reading_order). The title
    * restriction is a plain `alias IN (...)` predicate, so on an
    * (alias, year)-partitioned canonical store it prunes partitions at
    * the scan — the reference's `fetch_files(titles)` download filter
    * expressed declaratively; unpatched titles are never read, and the
    * dynamic-partition-overwrite write path rewrites only what was
    * read. Pages pass through the patch unchanged in the reference
    * (re-uploaded as-is, :123-136) — here "unchanged" means: don't
    * read them at all. */
  def patch5AddReadingOrder(issues: DataFrame, titles: Seq[String],
      aliasOf: Column = regexp_extract(col("id"), "^([^-]+)-", 1))
      : DataFrame =
    patchAddReadingOrder(issues.filter(aliasOf.isin(titles: _*)))

  // ---- patch 7: Olive/RERO coordinate rescale ----
  // (canonical_patch_7_rero_olive.py: scale_coords / convert_issue_coords
  // / convert_page_coords). The resolution table — one row per issue to
  // patch, (issue_id, curr_res, dest_res) — is the output of the patch-7
  // audit (the reference's find_issues listing + notebook triage). It is
  // tiny relative to the canonical data, so both patches broadcast it:
  // the 100 TB side never shuffles, and untouched issues pass through
  // unchanged (left join, null curr_res → identity).

  /** `int(c * dest / curr)` as a Column (scale_coords,
    * canonical_patch_7_rero_olive.py:38-51): Python `int()` truncates,
    * so the double product is cast straight to int. */
  private def scaleCoords(c: Column, curr: Column, dest: Column): Column =
    when(c.isNull || curr.isNull, c).otherwise(
      transform(c, x =>
        (x.cast("double") * dest.cast("double") / curr.cast("double"))
          .cast("int")))

  /** Rescale CI-level image coordinates inside issues
    * (convert_issue_coords: `m.c` takes precedence over top-level `c`,
    * only one of the two is scaled). Adds a `patched` flag column the
    * caller can split the patch-info report on. */
  def patch7RescaleIssues(issues: DataFrame, resolutions: DataFrame): DataFrame = {
    val res = broadcast(resolutions
      .select(col("issue_id"), col("curr_res"), col("dest_res")))
    issues.join(res, issues("id") === res("issue_id"), "left")
      .withColumn("i", transform(col("i"), ci =>
        when(ci.getField("m").getField("c").isNotNull,
          ci.withField("m.c", scaleCoords(ci.getField("m").getField("c"),
            col("curr_res"), col("dest_res"))))
          .otherwise(
            ci.withField("c", scaleCoords(ci.getField("c"),
              col("curr_res"), col("dest_res"))))))
      .withColumn("patched", col("curr_res").isNotNull &&
        exists(col("i"), ci => ci.getField("m").getField("c").isNotNull ||
          ci.getField("c").isNotNull))
      .drop("issue_id", "curr_res", "dest_res")
  }

  /** Rescale every region/line/token coordinate inside pages
    * (convert_page_coords: regions, lines and tokens are scaled;
    * paragraph boxes are not — the reference's sanity count covers
    * exactly those three levels). Pure nested `transform`, no shuffle:
    * the only wide op is the broadcast of the resolution table. */
  def patch7RescalePages(pages: DataFrame, resolutions: DataFrame): DataFrame = {
    val res = broadcast(resolutions
      .select(col("issue_id"), col("curr_res"), col("dest_res")))
    val keyed = pages.withColumn("__issue_id",
      regexp_replace(col("id"), "-p\\d+$", ""))
    val curr = col("curr_res")
    val dest = col("dest_res")
    keyed.join(res, keyed("__issue_id") === res("issue_id"), "left")
      .withColumn("r", when(curr.isNull, col("r")).otherwise(
        transform(col("r"), region =>
          region
            .withField("c", scaleCoords(region.getField("c"), curr, dest))
            .withField("p", transform(region.getField("p"), para =>
              para.withField("l", transform(para.getField("l"), line =>
                line
                  .withField("c", scaleCoords(line.getField("c"), curr, dest))
                  .withField("t", transform(line.getField("t"), tok =>
                    tok.withField("c",
                      scaleCoords(tok.getField("c"), curr, dest)))))))))))
      .withColumn("patched", curr.isNotNull)
      .drop("__issue_id", "issue_id", "curr_res", "dest_res")
  }
}
