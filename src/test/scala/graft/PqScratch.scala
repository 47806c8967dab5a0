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
