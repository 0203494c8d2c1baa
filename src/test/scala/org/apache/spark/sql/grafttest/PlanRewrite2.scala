package org.apache.spark.sql.grafttest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.{Repartition, Sort}
import org.apache.spark.sql.classic.{Dataset, SparkSession => CSpark}

/** Round-18 measurement rewrites: variants of a presentBy-shaped root
  * (local Sort over repartition(1)) for the corpus-sized presentation
  * audit — the r17 conversion funnels the whole result through ONE
  * task, which is wrong at scale for per-row outputs (VERDICT r17 #1).
  */
object PlanRewrite2 {

  private def rootPresent(df: DataFrame)
      : Option[(DataFrame, Seq[Column])] =
    df.queryExecution.logical match {
      case Sort(order, false, Repartition(1, true, child), _) =>
        Some((Dataset.ofRows(
          df.sparkSession.asInstanceOf[CSpark], child),
          order.map(org.apache.spark.sql.graftbridge.Bridge.column)))
      case _ => None
    }

  /** presentBy root -> plain global orderBy (the pre-r17 shape: range
    * sort whose sampling pass recomputes the child). */
  def presentToRange(df: DataFrame): Option[DataFrame] =
    rootPresent(df).map { case (child, orders) => child.orderBy(orders: _*) }

  /** presentBy root -> lazy localCheckpoint + global orderBy (child
    * computed ONCE, persisted; the range sampling reads the persisted
    * blocks — scale-safe range sort without the recompute). */
  def presentToCkptRange(df: DataFrame): Option[DataFrame] =
    rootPresent(df).map { case (child, orders) =>
      child.localCheckpoint(eager = false).orderBy(orders: _*) }
}
