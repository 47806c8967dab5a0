package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bench-only scale-up of the driver's synthetic tables: replicates a
  * source scale factor `factor`× with per-copy key offsets and content
  * perturbation, so the battery can be measured above sf0.1 (VERDICT r5
  * "run sf1" — everything above sf0.1 was plan-shape extrapolation).
  *
  * NOT oracle data — correctness stays gated on the driver's sf0.01
  * parquet. Design constraints the copies must honor for timings to be
  * interpretable:
  *  - relational structure preserved: every foreign key is offset by
  *    the same per-copy stride as its primary key, so join fan-out and
  *    group cardinality scale linearly (dims nation/region stay fixed,
  *    as a real 10× corpus would keep its dimension tables);
  *  - near-dup structure preserved, NOT amplified: a naive copy makes
  *    every row a near-duplicate of its 9 twins — LSH buckets grow 10×
  *    and pair output grows ~45×, measuring a different (adversarial)
  *    workload. Instead each copy gets a per-copy consonant/vowel
  *    rotation (`translate`), which rewrites most shingles globally, so
  *    copies are NOT near-dups of each other and the per-document
  *    duplicate structure of the original corpus is what scales;
  *  - embeddings get a per-copy sign-flip mask (distinct masks →
  *    pairwise cosine far from 1) for the same reason;
  *  - events keep their timeline but shift user/event ids, so windows
  *    hold 10× rows and state stores hold 10× keys — the dimensions
  *    that matter for streaming state.
  */
object ScaleUp {

  /** Stride between copies, > any source key at sf0.1. */
  private val Stride = 10000000L

  /** Per-copy letter permutation (identity at c=0): translate rewrites
    * most k-gram shingles of every copy, breaking cross-copy near-dup
    * similarity while preserving text length and token shape.
    *
    * Permutations are seeded Fisher-Yates shuffles, NOT rotations —
    * the 9-letter alphabet has only 9 distinct rotations, so at
    * factor 10 the old `rotated(9)` equaled `rotated(0)` and every
    * copy-0 document gained a byte-identical copy-9 twin: exactly the
    * duplicated-corpus amplification this generator exists to avoid,
    * silently folded into the round-6 sf1 dedup numbers. */
  private val Alphabet = "aeioustnr"
  private def permuted(c: Int): String =
    if (c == 0) Alphabet
    else {
      val a = Alphabet.toCharArray
      val rnd = new java.util.Random(c * 0x9E3779B97F4A7C15L)
      var i = a.length - 1
      while (i > 0) {
        val j = rnd.nextInt(i + 1)
        val t = a(i); a(i) = a(j); a(j) = t
        i -= 1
      }
      new String(a)
    }

  /** The factor letter maps, with pairwise distinctness REQUIRED (a
    * seed collision or an accidental identity would silently reintroduce
    * exact cross-copy twins). */
  def letterMaps(factor: Int): IndexedSeq[String] = {
    val maps = (0 until factor).map(permuted)
    require(maps.distinct.size == factor,
      s"letter maps must be pairwise distinct for factor $factor")
    maps
  }

  private def offset(df: DataFrame, c: Int, keys: String*): DataFrame =
    keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(c * Stride)))

  def copies(df: DataFrame, factor: Int)(one: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until factor).map(c => one(df, c)).reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/root/repo/target/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    // optional comma-list of tables (4th arg): the sf10 battery only
    // exercises the d/s/e families, so only documents/embeddings/events
    // need the 100x generation cost
    val onlyTables = if (args.length > 3) Some(args(3).split(",").toSet)
      else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.util.Tables

    def write(name: String, df: => DataFrame): Unit =
      if (onlyTables.forall(_.contains(name))) {
        df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
        println(s"$name: ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
      }

    // dims stay fixed
    write("region", Tables.region(spark, src))
    write("nation", Tables.nation(spark, src))

    write("customer", copies(Tables.customer(spark, src), factor)(
      offset(_, _, "c_custkey")))
    write("supplier", copies(Tables.supplier(spark, src), factor)(
      offset(_, _, "s_suppkey")))
    write("part", copies(Tables.part(spark, src), factor)(
      offset(_, _, "p_partkey")))
    write("orders", copies(Tables.orders(spark, src), factor)(
      offset(_, _, "o_orderkey", "o_custkey")))
    write("lineitem", copies(Tables.lineitem(spark, src), factor)(
      offset(_, _, "l_orderkey", "l_partkey", "l_suppkey")))

    // events: the source ts is parquet TIMESTAMP(NANOS), which Spark
    // only reads as a long (nanosAsLong); written back it becomes a
    // plain BIGINT of nanos — Tables.events' `ts div 1000` read path
    // handles both physical types identically
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    write("events", copies(
      spark.read.parquet(s"$src/events.parquet"), factor)(
      offset(_, _, "event_id", "user_id")))

    val maps = letterMaps(factor)
    write("documents", copies(Tables.documents(spark, src), factor) {
      (df, c) =>
        offset(df, c, "doc_id").withColumn("text",
          if (c == 0) col("text")
          else translate(col("text"), Alphabet, maps(c)))
    })

    write("embeddings", copies(Tables.embeddings(spark, src), factor) {
      (df, c) =>
        // per-copy sign-flip mask from bit i of a Knuth-hashed copy id;
        // c=0 has mask 0 (identity)
        val mask = if (c == 0) 0L else c * 2654435761L
        offset(df, c, "vec_id").withColumn("embedding",
          expr(s"transform(embedding, (x, i) -> " +
            s"CASE WHEN (shiftright(${mask}L, i % 32) % 2) = 1 " +
            s"THEN -x ELSE x END)"))
    })

    spark.stop()
  }
}
