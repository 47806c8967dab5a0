package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
object PqScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val e = graft.util.Tables.embeddings(spark, dir)
    val n = e.count().toInt
    println(s"n = $n")
    val q = e.filter(col("vec_id") < 16)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def mse(cb: Array[Array[Array[Float]]]): Double = {
      val rec = Similarity.pqReconstruct(
        Similarity.pqEncode(col("embedding"), cb), cb)
      e.select(avg(
        Similarity.dot(col("embedding"), col("embedding"))
          - lit(2.0) * Similarity.dot(col("embedding"), rec)
          + Similarity.dot(rec, rec))).first().getDouble(0)
    }
    val exact = pairs(Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5))
    val cbF = Similarity.pqCodebooksFirst(e, "vec_id", "embedding", 8, 16)
    val first = pairs(Similarity.pqTopKWith(q, e, "vec_id", "embedding", 5, cbF))
    val cbT = Similarity.pqCodebooks(e, "vec_id", "embedding", 8, 16, 3)
    val trained = pairs(Similarity.pqTopKWith(q, e, "vec_id", "embedding", 5, cbT))
    println(s"recall first = ${(first & exact).size.toDouble / exact.size}")
    println(s"recall trained = ${(trained & exact).size.toDouble / exact.size}")
    println(s"mse first = ${mse(cbF)}  mse trained = ${mse(cbT)}")
    val sub = e.filter(col("vec_id") < 200)
    val exactSub = pairs(Similarity.bruteForceTopK(q, sub, "vec_id", "embedding", 5))
    val degen = pairs(Similarity.pqTopK(q, sub, "vec_id", "embedding", 5, 8, 200))
    println(s"degenerate ksub=n equals exact: ${degen == exactSub}")
    spark.stop()
  }
}
object IvfPqScratch {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val e = graft.util.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") < 16)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "n_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // degenerate chain on a 200-vector subset
    val sub = e.filter(col("vec_id") < 200)
    val cents4 = Similarity.pqCodebooksFirst(sub, "vec_id", "embedding", 1, 4)(0)
    val exactSub = pairs(Similarity.bruteForceTopK(q, sub, "vec_id", "embedding", 5))
    val degen = pairs(Similarity.ivfPqTopK(q, sub, "vec_id", "embedding", 5,
      cents4, nprobe = 4, m = 8, ksub = 200, iters = 1))
    println(s"ivfpq degenerate equals exact: ${degen == exactSub}")
    if (degen != exactSub) {
      println(s"  missing: ${(exactSub -- degen).take(5)}")
      println(s"  extra:   ${(degen -- exactSub).take(5)}")
    }
    // realistic recall, trained centroids + residual PQ
    val exact = pairs(Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5))
      .map(t => (t._1, t._2))
    val cents = Similarity.kmeansCentroids(e, "vec_id", "embedding", 16, 3)
    for (nprobe <- Seq(4, 8, 16)) {
      val got = pairs(Similarity.ivfPqTopK(q, e, "vec_id", "embedding", 5,
        cents, nprobe, m = 8, ksub = 16, iters = 3)).map(t => (t._1, t._2))
      println(s"ivfpq nprobe=$nprobe recall = ${(got & exact).size.toDouble / exact.size}")
    }
    spark.stop()
  }
}
