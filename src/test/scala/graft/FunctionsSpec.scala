package graft

import org.apache.spark.sql.functions._

import graft.ops.Sim

/** Native DotProductF32 expression: parity with the HOF formulation,
  * null semantics, codegen + interpreted paths, SQL registration.
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)),          // 4+10+18 = 32
    (2L, Seq(0.5f, -0.5f), Seq(2f, 2f)),             // 1 - 1 = 0
    (3L, Seq.empty[Float], Seq.empty[Float]),        // 0.0
    (4L, Seq(1f, 2f), Seq(1f, 2f, 3f))               // length mismatch → null
  ).toDF("id", "a", "b")

  test("dot matches the HOF formulation on every row (incl. nulls)") {
    val got = vecs.select(col("id"), Sim.dot(col("a"), col("b")).as("d"),
        Sim.dotHof(col("a"), col("b")).as("h"))
      .as[(Long, Option[Double], Option[Double])].collect()
    got.foreach { case (id, d, h) => assert(d === h, s"row $id") }
    val m = got.map(r => r._1 -> r._2).toMap
    assert(m === Map(1L -> Some(32.0), 2L -> Some(0.0), 3L -> Some(0.0),
      4L -> None))
  }

  test("dot on null array is null") {
    val df = Seq((1L, Option(Seq(1f)), Option.empty[Seq[Float]]))
      .toDF("id", "a", "b")
    val got = df.select(Sim.dot(col("a"), col("b")))
      .as[Option[Double]].head()
    assert(got === None)
  }

  test("interpreted path (codegen off) agrees with codegen path") {
    val expected = Map(1L -> Some(32.0), 2L -> Some(0.0), 3L -> Some(0.0),
      4L -> None)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val got = vecs.select(col("id"), Sim.dot(col("a"), col("b")).as("d"))
        .as[(Long, Option[Double])].collect().toMap
      assert(got === expected)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("registered as SQL function dot_f32") {
    vecs.createOrReplaceTempView("vecs")
    val got = spark.sql(
        "SELECT id, dot_f32(a, b) AS d FROM vecs WHERE id = 1")
      .as[(Long, Double)].head()
    assert(got === ((1L, 32.0)))
  }
}
