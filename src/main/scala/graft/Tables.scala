package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Declared schemas + loaders for the driver fixtures at
  * `/root/testdata/sf*` (see /root/repo/FIXTURES.md §2).
  *
  * Schemas are declared rather than inferred: at 100 TB an inference pass is
  * a full extra scan, and a declared schema also lets the parquet reader
  * prune columns/row-groups without consulting merged footers
  * (reference contrast: `reddit_etl_proj/etl_pipeline.py:66` infers its
  * schema dynamically from Python dicts).
  */
object Tables {

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** `events.ts` has shipped as BOTH parquet TIMESTAMP(NANOS) (rounds
    * 1–6) and TIMESTAMP(MICROS) (round 7 fixtures) — and the two MUST
    * be told apart, because the nanos path reads the raw BIGINT and
    * divides by 1000: applied to a micros file it silently produces
    * timestamps 1000× too small (caught by the round-7 oracle gate,
    * 17 queries). [[load]] sniffs the footer's logical type once per
    * directory (under `nanosAsLong` a NANOS column surfaces as
    * LongType, MICROS as TimestampType — Spark cannot read NANOS as
    * its microsecond TimestampType at all) and picks the schema:
    * nanos → BIGINT read + `div 1000` + timestamp_micros; micros →
    * plain TimestampType read. Downstream operators see a normal
    * timestamp column either way.
    */
  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The micros-fixture variant: ts is Spark's native TimestampType. */
  val eventsMicros: StructType = StructType(
    events.fields.map(f =>
      if (f.name == "ts") StructField("ts", TimestampType) else f))

  /** Footer-sniff memo: one schema read per events path per JVM. */
  private val eventsIsNanos =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  val schemas: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events, "documents" -> documents,
    "embeddings" -> embeddings)

  /** Load one fixture table with its declared schema. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    if (name != "events")
      return spark.read.schema(schemas(name)).parquet(path)
    // defensive: the flag is required to read TIMESTAMP(NANOS); set it
    // here too so a caller-supplied session (e.g. the driver's) works
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val isNanos = eventsIsNanos.computeIfAbsent(path, _ =>
      spark.read.parquet(path).schema("ts").dataType == LongType)
    if (isNanos)
      // ns → µs with integer `div` (a double round-trip would lose
      // precision above 2^53 ns); truncation matches DuckDB's ns→µs cast
      spark.read.schema(events).parquet(path).withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else
      spark.read.schema(eventsMicros).parquet(path)
  }
}
