package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared one-JVM test session (creating a SparkSession per suite costs
  * ~10 s each; sbt forks one test JVM, so a single lazy session is safe).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Sessions.local("4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}
