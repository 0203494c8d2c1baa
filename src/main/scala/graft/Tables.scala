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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark cannot read as its
    * microsecond TimestampType (FAILED_READ_FILE.PARQUET_COLUMN_DATA_TYPE_
    * MISMATCH). We read it as a nanos BIGINT (requires
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set in [[Sessions.config]])
    * and convert to TimestampType in [[load]], so downstream operators see a
    * normal timestamp column.
    */
  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

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
    if (name == "events")
      // defensive: the flag is required to read TIMESTAMP(NANOS); set it
      // here too so a caller-supplied session (e.g. the driver's) works
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.schema(schemas(name)).parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      // ns → µs with integer `div` (a double round-trip would lose precision
      // above 2^53 ns); truncation matches DuckDB's ns→µs cast.
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }
}
