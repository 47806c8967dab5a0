package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataSource V2 issue-tree specs: descriptor rows, alias filter
  * pushdown (visible in the plan), and date-bound directory pruning. */
class IssueTreeSourceSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val base: String = {
    val b = Files.createTempDirectory("tree").toString
    for {
      (alias, dates) <- Seq(
        "GDL" -> Seq("1900/01/02", "1900/01/03", "1901/06/15"),
        "JDG" -> Seq("1900/01/02", "1950/12/31"))
      d <- dates
    } Files.createDirectories(java.nio.file.Paths.get(b, alias, d))
    // one multi-edition day
    Files.createDirectories(java.nio.file.Paths.get(b, "GDL/1900/01/02/a"))
    Files.createDirectories(java.nio.file.Paths.get(b, "GDL/1900/01/02/b"))
    b
  }

  private def read() =
    spark.read.format("graft.sources.IssueTreeSource").load(base)

  test("tree reads as issue descriptors with editions") {
    val rows = read().orderBy("alias", "date", "edition").collect()
    // GDL 1900-01-02 has editions a+b; other days default to edition a
    assert(rows.length == 6)
    val gdl0102 = rows.filter(r => r.getString(0) == "GDL" &&
      r.getDate(1).toString == "1900-01-02")
    assert(gdl0102.map(_.getString(2)).toSeq == Seq("a", "b"))
    assert(rows.forall(_.getString(3).startsWith(base)))
  }

  test("alias equality is pushed down and prunes other titles") {
    val q = read().filter(col("alias") === "JDG")
    assert(q.count() == 2)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("prunedBy=[EqualTo(alias,JDG)]"), plan.take(800))
  }

  test("date bounds prune year directories and stay residual-correct") {
    val q = read().filter(col("date").between("1900-01-01", "1900-12-31"))
    val rows = q.collect()
    assert(rows.length == 4) // GDL a+b on 01-02, GDL 01-03, JDG 01-02
    assert(rows.forall(_.getDate(1).toString.startsWith("1900")))
    // equality on date also prunes
    assert(read().filter(col("date") === "1950-12-31").count() == 1)
  }

  test("descriptors feed the discovery selection and the import path") {
    // the v2 source composes with Discover.select semantics
    val sel = graft.discover.Discover.select(read(),
      graft.discover.Discover.SelectConfig(
        titles = Map("GDL" -> Some("1900/01/01-1900/12/31"))))
    assert(sel.count() == 3)
    assert(sel.select("alias").distinct().head().getString(0) == "GDL")
  }
}
