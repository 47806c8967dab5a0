package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MinHashImpl
import graft.operators.Dedup

class MinHashExpressionSpec extends AnyFunSuite {
  import SparkTestSession._

  test("native expression equals the HOF formulation, from SQL and Column API") {
    import spark.implicits._
    MinHashImpl.register(spark)
    val docs = graft.util.Tables.documents(spark, sf).limit(50)
      .withColumn("sh", Dedup.shingles(col("text"), 3))
    val both = docs
      .withColumn("native", expr("minhash_sig(sh, 16)"))
      .withColumn("hof",
        Dedup.minhashSigFromHashes(Dedup.baseHashes(col("sh")), 16))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    // SQL surface
    docs.createOrReplaceTempView("docs_sh")
    val viaSql = spark.sql(
      "SELECT doc_id, minhash_sig(sh, 16) AS sig FROM docs_sh")
    assert(viaSql.count() == 50)
    assert(viaSql.schema("sig").dataType.simpleString == "array<bigint>")
  }

  test("native word_shingles equals the HOF formulation") {
    import spark.implicits._
    graft.functions.ShinglesImpl.register(spark)
    val docs = graft.util.Tables.documents(spark, sf).limit(100)
      .select(col("doc_id"), col("text"))
    // plus edge cases: empty, blank, single token, k-1 tokens
    val edge = Seq((9001L, ""), (9002L, "   "), (9003L, "one"),
      (9004L, "one two"), (9005L, " padded  with   runs  "))
      .toDF("doc_id", "text")
    for (k <- Seq(2, 3, 5)) {
      val both = docs.unionByName(edge)
        .withColumn("native", expr(s"word_shingles(text, $k)"))
        .withColumn("hof", Dedup.shingles(col("text"), k))
      assert(both.filter(col("native") =!= col("hof")).count() == 0,
        s"k=$k mismatch")
    }
  }

  test("empty shingle array yields null, matching the HOF form") {
    import spark.implicits._
    MinHashImpl.register(spark)
    val df = Seq((1L, Seq.empty[String]), (2L, Seq("a b c"))).toDF("id", "sh")
    val out = df.select(col("id"), expr("minhash_sig(sh, 16)").as("sig"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1))
    assert(!out(1).isNullAt(1))
  }

  test("edition letters extend past z (bijective base-26)") {
    import graft.functions.Ids
    assert(Ids.editionLetter(0) == "a")
    assert(Ids.editionLetter(25) == "z")
    assert(Ids.editionLetter(26) == "aa")
    assert(Ids.editionLetter(27) == "ab")
    assert(Ids.editionLetter(51) == "az")
    assert(Ids.editionLetter(52) == "ba")
  }

  test("signature is order-insensitive over shingle multisets") {
    import spark.implicits._
    MinHashImpl.register(spark)
    val df = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("c d e", "a b c", "b c d", "a b c"))).toDF("id", "sh")
    val sigs = df.select(expr("minhash_sig(sh, 16)")).collect()
    assert(sigs(0).getSeq[Long](0) == sigs(1).getSeq[Long](0))
  }
}
