package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.util.Tables

/** Local profiling harness (test scope, not shipped): stage-level timing
  * for the LSH dedup pipeline. Run with
  * `sbt "Test/runMain graft.BenchScratch"`. */
object BenchScratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.MinHashImpl.register(spark)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }

    // warmup
    Tables.documents(spark, d).count()

    val docs = Tables.documents(spark, d)
    time("scan")(docs.count())
    val sh = docs.select(col("doc_id").as("id"), col("text"))
      .withColumn("sh", Dedup.shingles(col("text"), 3))
    time("shingles")(sh.count())
    val sig = sh.withColumn("sig", expr("minhash_sig(sh, 16)"))
    time("shingles+sig")(sig.count())
    time("bands-no-explode")(sig.select(col("id"),
      Dedup.bandHashes(col("sig"), 4, 4).as("bhs")).count())
    time("explode-no-sh")(sig.select(col("id"),
      posexplode(Dedup.bandHashes(col("sig"), 4, 4)).as(Seq("band", "bh"))).count())
    time("explode-sig-passthrough")(sig.select(col("id"), col("sh"),
      posexplode(col("sig")).as(Seq("band", "bh"))).count())
    // no-HOF band hashes: md5 over concat_ws of element_at slices
    def bandsNoHof(sig: org.apache.spark.sql.Column, bands: Int, rows: Int) =
      array((0 until bands).map { j =>
        md5(concat_ws("|", (1 to rows).map(r =>
          element_at(sig, j * rows + r).cast("string")): _*))
      }: _*)
    time("explode-nohof-bands")(sig.select(col("id"),
      posexplode(bandsNoHof(col("sig"), 4, 4)).as(Seq("band", "bh"))).count())
    val sigP = sig.persist()
    sigP.count()
    time("explode-after-persist")(sigP.select(col("id"), col("sh"),
      posexplode(Dedup.bandHashes(col("sig"), 4, 4)).as(Seq("band", "bh"))).count())
    sigP.unpersist()
    time("explode-after-repart")(sig.repartition(32).select(col("id"), col("sh"),
      posexplode(Dedup.bandHashes(col("sig"), 4, 4)).as(Seq("band", "bh"))).count())
    time("explode-no-sh-nohof-noshingle")(docs
      .select(col("doc_id").as("id"),
        expr("minhash_sig(array(text), 16)").as("sig"))
      .select(col("id"), posexplode(bandsNoHof(col("sig"), 4, 4))
        .as(Seq("band", "bh"))).count())
    val banded = sig.select(col("id"), col("sh"),
      posexplode(Dedup.bandHashes(col("sig"), 4, 4)).as(Seq("band", "bh")))
    time("banded")(banded.count())
    val buckets = banded.groupBy(col("band"), col("bh"))
      .agg(collect_list(struct(col("id"), col("sh"))).as("xs"))
      .filter(size(col("xs")) > 1)
    time("buckets>1")(buckets.count())
    time("bucket-max-size")(buckets.select(max(size(col("xs")))).head().getInt(0).toLong)
    val pairs = buckets
      .select(explode(flatten(transform(col("xs"), (x, i) =>
        transform(slice(col("xs"), i + lit(2), size(col("xs"))), y =>
          struct(
            when(x("id") < y("id"), x("id")).otherwise(y("id")).as("id_a"),
            when(x("id") < y("id"), y("id")).otherwise(x("id")).as("id_b"),
            when(x("id") < y("id"), x("sh")).otherwise(y("sh")).as("sh_a"),
            when(x("id") < y("id"), y("sh")).otherwise(x("sh")).as("sh_b"))))))
        .as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.sh_a"), col("p.sh_b"))
    time("pairs")(pairs.count())
    val dd = pairs.dropDuplicates("id_a", "id_b")
    time("pairs+dropDup")(dd.count())
    val jac = dd.withColumn("jaccard", Dedup.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= 0.8)
    time("full")(jac.count())
    time("full-again")(Dedup.lshNearDupPairs(docs, "doc_id", "text",
      3, 16, 4, 0.8).count())

    // rebuild stage decomposition
    import graft.queries.RebuildQueries
    import graft.rebuild.RebuildJob
    val si = RebuildQueries.syntheticIssues(spark, d)
    val sp = RebuildQueries.syntheticPages(spark, d)
    time("rb-issues-scan")(si.count())
    time("rb-pages-scan")(sp.count())
    time("rb-cis")(RebuildJob.contentItems(si).count())
    time("rb-joined")(RebuildJob.joined(si, sp).count())
    time("rb-full")(RebuildJob.rebuildSolr(spark, si, sp, "T").count())
    time("rb-full-again")(RebuildJob.rebuildSolr(spark, si, sp, "T").count())
    spark.stop()
  }
}
