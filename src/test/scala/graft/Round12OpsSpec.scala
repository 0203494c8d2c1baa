package graft

import org.apache.spark.sql.functions._

import graft.ops.Sim

/** Round-12 additions: top-r PCA by Hotelling deflation over the single
  * covariance moment pass.
  */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  /** Cyclic Jacobi eigensolve of a symmetric matrix — the in-memory
    * reference the deflation engine is measured against. Returns
    * (eigenvalues desc, eigenvectors as columns in the same order).
    */
  private def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 1 to 100) {
      var off = 0.0
      for (p <- 0 until d; q <- p + 1 until d) off += a(p)(q) * a(p)(q)
      if (off > 1e-24) {
        for (p <- 0 until d; q <- p + 1 until d) {
          if (math.abs(a(p)(q)) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            for (i <- 0 until d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
            }
            for (j <- 0 until d) {
              val apj = a(p)(j); val aqj = a(q)(j)
              a(p)(j) = c * apj - s * aqj
              a(q)(j) = s * apj + c * aqj
            }
            for (i <- 0 until d) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
            }
          }
        }
      }
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => (0 until d).map(j => v(j)(i)).toArray).toArray)
  }

  test("pcaTopComponents recovers a PLANTED well-gapped spectrum: " +
      "loadings and eigenvalues match an in-memory Jacobi eigensolve " +
      "of the empirical covariance") {
    val d = 8
    val n = 400
    // planted spectrum with ratio->=2 gaps, rotated off the axes by a
    // Householder reflection so the eigenbasis is non-trivial
    val scales = Array(16.0, 8.0, 4.0, 2.0, 1.0, 0.5, 0.25, 0.125)
    val hv = {
      val raw = Array.tabulate(d)(i => 1.0 + 0.3 * i)
      val nm = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / nm)
    }
    def reflect(x: Array[Double]): Array[Double] = {
      var dot = 0.0
      for (i <- 0 until d) dot += hv(i) * x(i)
      Array.tabulate(d)(i => x(i) - 2.0 * dot * hv(i))
    }
    val rnd = new scala.util.Random(12)
    val rows = (0 until n).map { id =>
      val g = Array.tabulate(d)(k => math.sqrt(scales(k)) * rnd.nextGaussian())
      (id.toLong, reflect(g).map(_.toFloat).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")

    val r = 3
    val got = Sim.pcaTopComponents(df, r = r, iters = 40)
      .orderBy("comp", "dim_pos").collect()
      .groupBy(_.getInt(0)).view.mapValues { rs =>
        val sorted = rs.sortBy(_.getInt(1))
        (sorted.map(_.getDouble(2)), sorted.head.getDouble(3),
          sorted.head.getDouble(4))
      }.toMap

    // in-memory empirical covariance over the SAME float-truncated data
    val xs = rows.map(_._2.map(_.toDouble).toArray)
    val mu = Array.tabulate(d)(j => xs.map(_(j)).sum / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      xs.map(x => x(i) * x(j)).sum / n - mu(i) * mu(j)
    }
    val (ev, evec) = jacobiEigen(cov)
    var trace = 0.0
    (0 until d).foreach(i => trace += cov(i)(i))

    (1 to r).foreach { k =>
      val (loadings, lambda, explained) = got(k)
      val rel = math.abs(lambda - ev(k - 1)) / ev(k - 1)
      assert(rel < 1e-6,
        s"comp $k lambda $lambda vs jacobi ${ev(k - 1)} (rel $rel)")
      var dot = 0.0
      (0 until d).foreach(i => dot += loadings(i) * evec(k - 1)(i))
      assert(math.abs(math.abs(dot) - 1.0) < 1e-6,
        s"comp $k |cos| ${math.abs(dot)}")
      assert(math.abs(explained - lambda / trace) < 1e-8)
    }
    // with real convergence the estimates are ordered like the spectrum
    assert(got(1)._2 > got(2)._2 && got(2)._2 > got(3)._2)
  }

  test("pcaTopComponents component 1 is bit-identical to " +
      "pcaTopComponent on the fixture, every loading vector is " +
      "unit-norm, and one moment pass serves all r components") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, dir, "embeddings")
    val topr = Sim.pcaTopComponents(emb, r = 4).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(topr.length === 4 * 64)
    val top1 = Sim.pcaTopComponent(emb).collect()
      .map(r => (1, r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(topr.filter(_._1 == 1).sortBy(_._2).toSeq ===
      top1.sortBy(_._2).toSeq)
    (1 to 4).foreach { k =>
      val norm2 = topr.filter(_._1 == k).map(t => t._3 * t._3).sum
      // loadings are floored at 9 dp AFTER normalization
      assert(math.abs(norm2 - 1.0) < 1e-6, s"comp $k norm^2 $norm2")
    }
  }
}
