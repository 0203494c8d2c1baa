package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Text}

/** Dev probe: decompose q224's cost — explode alone, phrase-only agg,
  * (phrase,doc) agg — to pick the cheapest two-branch shape.
  */
object Probe224 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.load(spark, dir, "documents")
    docs.count()
    val shing = docs.select(col("doc_id"),
      explode(Dedup.shingles(Text.cleanTokens(col("text")), 3))
        .as("phrase"))
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s ${ts.min}%.2f s (min of 2)")
    }
    time("explode only") {
      shing.write.format("noop").mode("overwrite").save()
    }
    time("explode+count") {
      shing.groupBy().count().write.format("noop").mode("overwrite").save()
    }
    time("groupBy(phrase)") {
      shing.groupBy("phrase").agg(count(lit(1)).as("total"))
        .write.format("noop").mode("overwrite").save()
    }
    time("groupBy(phrase,doc)") {
      shing.groupBy("phrase", "doc_id").agg(count(lit(1)).as("n_occ"))
        .write.format("noop").mode("overwrite").save()
    }
    time("gb(phrase,doc)->gb(phrase)") {
      shing.groupBy("phrase", "doc_id").agg(count(lit(1)).as("n_occ"))
        .groupBy("phrase").agg(sum(col("n_occ")).as("total"))
        .write.format("noop").mode("overwrite").save()
    }
    time("tokens only") {
      docs.select(col("doc_id"),
          Text.cleanTokens(col("text")).as("t"))
        .write.format("noop").mode("overwrite").save()
    }
    val shingH = docs.select(col("doc_id"),
      explode(Dedup.hashedShingles(Text.cleanTokens(col("text")), 3))
        .as("ph"))
    time("explode(hash) only") {
      shingH.write.format("noop").mode("overwrite").save()
    }
    time("gbH(ph,doc)") {
      shingH.groupBy("ph", "doc_id").agg(count(lit(1)).as("n_occ"))
        .write.format("noop").mode("overwrite").save()
    }
    time("occH ckpt both branches") {
      val occ = shingH.groupBy("ph", "doc_id")
        .agg(count(lit(1)).as("n_occ")).localCheckpoint()
      val top = occ.groupBy("ph").agg(sum(col("n_occ")).as("total"))
        .orderBy(desc("total"), col("ph")).limit(3)
      occ.join(broadcast(top), Seq("ph"))
        .write.format("noop").mode("overwrite").save()
      occ.unpersist(blocking = true)
    }
    time("explode(tokens) only") {
      docs.select(col("doc_id"),
          explode(Text.cleanTokens(col("text"))).as("tok"))
        .write.format("noop").mode("overwrite").save()
    }
    println("shingle rows: " + shing.count())
    println("docs rows: " + docs.count())
    
    time("occ(str) parquet both branches") {
      val p = "/tmp/probe224_occ"
      shing.groupBy("phrase", "doc_id").agg(count(lit(1)).as("n_occ"))
        .write.mode("overwrite").parquet(p)
      val occ = spark.read.parquet(p)
      val top = occ.groupBy("phrase").agg(sum(col("n_occ")).as("total"))
        .orderBy(desc("total"), col("phrase")).limit(3)
      occ.join(broadcast(top), Seq("phrase"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
