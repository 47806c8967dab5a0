package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** RangeJoin correctness is independent of bucket width — width is a
  * pure cost knob. The naive theta-join is the executable spec. */
class RangeJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bucketized equals the naive theta-join for any width, incl. edges") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val points = Seq.fill(300)(rnd.nextDouble() * 100 - 50)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("pid", "v")
    val intervals = Seq.fill(40) {
      val lo = rnd.nextDouble() * 100 - 50
      (lo, lo + rnd.nextDouble() * 10)
    }.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
      .toDF("iid", "lo", "hi")
    val expected = points.join(intervals,
      col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(expected.nonEmpty, "test data must produce matches")
    // widths spanning tiny (every interval replicates widely), typical,
    // and giant (everything lands in one bucket — degenerate but exact)
    for (width <- Seq(0.25, 5.0, 1000.0)) {
      val got = RangeJoin.bucketized(points, "v", intervals, "lo", "hi", width)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      assert(got == expected, s"width=$width")
    }
    // zero-span intervals (lo == hi) and exact boundary hits survive
    val pt = Seq((1L, 10.0), (2L, 10.000001)).toDF("pid", "v")
    val iv = Seq((1L, 10.0, 10.0)).toDF("iid", "lo", "hi")
    val hits = RangeJoin.bucketized(pt, "v", iv, "lo", "hi", 3.0)
      .select("pid").as[Long].collect().toSeq
    assert(hits == Seq(1L))
    intercept[IllegalArgumentException](
      RangeJoin.bucketized(pt, "v", iv, "lo", "hi", 0.0))
  }
}
