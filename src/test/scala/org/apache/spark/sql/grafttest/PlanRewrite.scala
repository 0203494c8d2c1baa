package org.apache.spark.sql.grafttest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.Sort
import org.apache.spark.sql.classic.{Dataset, SparkSession => CSpark}
import org.apache.spark.sql.graftbridge.Bridge

/** Test-only rewrites of a built DataFrame's ROOT logical node — the
  * measurement instrument for the round-17 fixed-cost decomposition:
  * how much of a harness query's per-rep cost is the final
  * presentation ORDER BY (a global range sort = an extra sampling job
  * + a range exchange on every action)?
  */
object PlanRewrite {

  /** The query with its root global Sort REMOVED (identical row
    * multiset — the driver's compare sorts rows before hashing, so a
    * root sort is pure presentation). Returns None when the root is
    * not a global Sort. */
  def dropRootSort(df: DataFrame): Option[DataFrame] =
    df.queryExecution.logical match {
      case s: Sort if s.global =>
        Some(Dataset.ofRows(
          df.sparkSession.asInstanceOf[CSpark], s.child))
      case _ => None
    }

  /** The root global Sort's child frame plus its sort-KEY expressions
    * (order direction stripped) — for the key-totality audit. */
  def rootSortChildKeys(df: DataFrame): Option[(DataFrame, Seq[Column])] =
    df.queryExecution.logical match {
      case s: Sort if s.global =>
        Some((Dataset.ofRows(
          df.sparkSession.asInstanceOf[CSpark], s.child),
          s.order.map(o => Bridge.column(o.child))))
      case _ => None
    }

  /** The query with its root global Sort replaced by
    * repartition(1) + the SAME sort run locally — total order
    * preserved, but no range-partitioning sampling job. */
  def rootSortToLocal(df: DataFrame): Option[DataFrame] =
    df.queryExecution.logical match {
      case s: Sort if s.global =>
        val child = Dataset.ofRows(
          df.sparkSession.asInstanceOf[CSpark], s.child)
        val orders: Seq[Column] = s.order.map(Bridge.column)
        Some(child.repartition(1).sortWithinPartitions(orders: _*))
      case _ => None
    }
}
