package graft
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (q <- args) {
      println(s"==== $q ====")
      println(SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
