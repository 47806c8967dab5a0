package graft

import org.apache.spark.sql.GraftColumns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{SimHash60, TextAnalysis}
import graft.util.Tables

/** The SQL surface installed by `spark.sql.extensions=graft.
  * GraftExtensions` (the shared test session sets the conf, exactly as
  * a cluster user would): inventory present, SQL ≡ Column API, literal
  * argument guards at analysis time. */
class GraftExtensionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("the full function inventory resolves in the session registry") {
    for ((id, _, _) <- GraftExtensions.functions)
      assert(spark.sessionState.functionRegistry.functionExists(id),
        id.funcName)
    // and DESCRIBE FUNCTION surfaces the registered usage text
    val desc = spark.sql("DESCRIBE FUNCTION simhash60")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("simhash60"))
  }

  test("SQL text computes exactly what the Column API computes") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_token_count(text) AS n,
        |  graft_quality_score(text) AS q, graft_lang_id(text) AS l,
        |  graft_fingerprint(text) AS f, simhash60(text) AS s
        |FROM ext_docs""".stripMargin).orderBy("doc_id").collect()
    val viaCol = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.qualityScore(col("text")).as("q"),
      TextAnalysis.langId(col("text")).as("l"),
      TextAnalysis.fingerprint(col("text")).as("f"),
      GraftColumns.column(SimHash60(
        GraftColumns.expression(col("text")))).as("s"))
      .orderBy("doc_id").collect()
    assert(viaSql.length == viaCol.length && viaSql.nonEmpty)
    viaSql.zip(viaCol).foreach { case (a, b) => assert(a == b) }
  }

  test("native expressions evaluate from pure SQL") {
    val row = spark.sql(
      """SELECT dotf(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
        |  minhash_sig(word_shingles('a b c d', 2), 4) AS sig""".stripMargin)
      .collect().head
    assert(row.getDouble(0) == 11.0)
    assert(row.getSeq[Long](1).length == 4)
  }

  test("non-literal shingle width is rejected at analysis time") {
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles(text, doc_id) FROM ext_docs").collect()
    }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ::: msgs(t.getCause)
    // the guard message differs in case between the extensions builder
    // ("INT literal") and the session-local ShinglesImpl.register
    // builder ("int literal") — either may own the name depending on
    // which suites ran before this one in the shared session
    assert(msgs(e).exists(_.toLowerCase.contains("int literal")))
  }
}
