package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class PcaSpec extends AnyFunSuite {
  import SparkTestSession._

  private def vecs(rows: Seq[Array[Float]]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
      .repartition(4) // exercise partial/merge across partitions
  }

  test("GramSum: moments match exact sums across partitions") {
    import org.apache.spark.sql.GraftColumns
    val dim = 3
    val data = Seq(
      Array(1f, 2f, 3f), Array(4f, 5f, 6f), Array(-1f, 0f, 2f),
      Array(0.5f, -2f, 1f))
    def pad(a: Array[Float]) = a // dim 3 directly
    val df = vecs(data.map(pad))
    val g = df.select(GraftColumns.column(
        graft.functions.GramSum(
          GraftColumns.expression(col("embedding")), dim)
          .toAggregateExpression()).as("g"))
      .first().getSeq[Double](0).toArray
    val exactSums = Array.tabulate(dim)(i =>
      data.map(_(i).toDouble).sum)
    val exactGram = Array.tabulate(dim, dim)((i, j) =>
      data.map(v => v(i).toDouble * v(j).toDouble).sum)
    assert(g(dim * dim + dim) == data.size.toDouble)
    for (i <- 0 until dim) {
      assert(math.abs(g(dim * dim + i) - exactSums(i)) < 1e-12)
      for (j <- 0 until dim)
        assert(math.abs(g(i * dim + j) - exactGram(i)(j)) < 1e-12)
    }
  }

  test("GramSum: a null vector element fails loudly, not as silent 0") {
    import org.apache.spark.sql.GraftColumns
    import spark.implicits._
    val df = Seq(Seq[java.lang.Float](1f, null, 3f))
      .toDF("embedding")
    val e = intercept[Exception] {
      df.select(GraftColumns.column(
        graft.functions.GramSum(
          GraftColumns.expression(col("embedding")), 3)
          .toAggregateExpression()))
        .first()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => c.getMessage != null &&
        c.getMessage.contains("null element")), e.toString)
  }

  test("pcaTopComponent: recovers a planted dominant direction") {
    val dim = 64
    val rnd = new java.util.Random(7)
    // points spread along axis 5 with small noise elsewhere: the
    // principal direction must be ±e5
    val data = (1 to 300).map { _ =>
      val v = Array.fill(dim)((rnd.nextDouble() - 0.5).toFloat * 0.1f)
      v(5) = (rnd.nextDouble() * 20 - 10).toFloat
      v
    }
    val (v, mu) = Similarity.pcaTopComponent(vecs(data), "embedding", dim)
    assert(math.abs(math.abs(v(5)) - 1.0) < 1e-3,
      s"component should align with axis 5, got v(5)=${v(5)}")
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-12)
    assert(mu.length == dim)
    // Rayleigh residual: C·v is (near-)parallel to v — the iterate
    // genuinely converged on this well-separated spectrum
    val n = data.size.toDouble
    val means = Array.tabulate(dim)(i => data.map(_(i).toDouble).sum / n)
    val cov = Array.tabulate(dim, dim)((i, j) =>
      data.map(r => r(i).toDouble * r(j).toDouble).sum / n -
        means(i) * means(j))
    val cv = Array.tabulate(dim)(i =>
      (0 until dim).map(j => cov(i)(j) * v(j)).sum)
    val lambda = (0 until dim).map(i => v(i) * cv(i)).sum
    val residual = math.sqrt(
      (0 until dim).map(i => math.pow(cv(i) - lambda * v(i), 2)).sum)
    assert(residual / lambda < 1e-6, s"residual=$residual lambda=$lambda")
  }

  test("pcaProject: projection variance equals the dominant eigenvalue") {
    val dim = 64
    val rnd = new java.util.Random(11)
    val data = (1 to 200).map { _ =>
      val v = Array.fill(dim)((rnd.nextDouble() - 0.5).toFloat * 0.05f)
      v(9) = (rnd.nextDouble() * 6 - 3).toFloat
      v
    }
    val df = vecs(data)
    val proj = Similarity.pcaProject(df, "vec_id", "embedding", dim)
      .collect().map(_.getDouble(1))
    val mean = proj.sum / proj.length
    val variance = proj.map(p => (p - mean) * (p - mean)).sum / proj.length
    // axis-9 sample variance is the dominant eigenvalue; the
    // projection must capture it (within the small off-axis noise)
    val axis = data.map(_(9).toDouble)
    val am = axis.sum / axis.length
    val av = axis.map(x => (x - am) * (x - am)).sum / axis.length
    assert(math.abs(variance - av) / av < 0.01,
      s"proj var $variance vs axis var $av")
  }

  test("pcaResidual: Pythagoras — proj² + rnorm² == ‖x − μ‖²") {
    val dim = 64
    val rnd = new java.util.Random(23)
    val data = (1 to 150).map { _ =>
      val v = Array.fill(dim)((rnd.nextDouble() - 0.5).toFloat)
      v(3) = (rnd.nextDouble() * 8 - 4).toFloat
      v
    }
    val df = vecs(data)
    val (_, mu) = Similarity.pcaTopComponent(df, "embedding", dim)
    val rows = Similarity.pcaResidual(df, "vec_id", "embedding", dim)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    rows.foreach { case (id, proj, rnorm) =>
      val x = data(id.toInt)
      val c2 = (0 until dim)
        .map(k => math.pow(x(k).toDouble - mu(k), 2)).sum
      assert(math.abs(proj * proj + rnorm * rnorm - c2) < 1e-9,
        s"id=$id proj=$proj rnorm=$rnorm centered²=$c2")
    }
    // removing the dominant direction shrinks every vector that has
    // any spread on it: total residual energy < total centered energy
    val totR = rows.map(r => r._3 * r._3).sum
    val totC = rows.map { case (id, _, _) =>
      val x = data(id.toInt)
      (0 until dim).map(k => math.pow(x(k).toDouble - mu(k), 2)).sum
    }.sum
    assert(totR < totC * 0.5, s"residual energy $totR vs $totC")
  }
}
