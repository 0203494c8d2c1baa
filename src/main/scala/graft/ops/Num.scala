package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Cross-engine numeric stabilization.
  *
  * `round()` is NOT portable between Spark and DuckDB on doubles: Spark
  * rounds the shortest decimal representation (BigDecimal HALF_UP) while
  * DuckDB rounds the binary value (std::round(x*10^dp)/10^dp), and they
  * disagree whenever the true value sits on a .5 tie whose double is just
  * below it (e.g. interpolated 2dp money at f=0.5 — found via q29).
  * floor(x*10^dp)/10^dp runs the identical IEEE ops on identical doubles
  * in both engines, so results are bit-equal by construction.
  */
object Num {
  def floorAt(c: Column, dp: Int): Column = {
    require(dp >= 0, s"floorAt requires dp >= 0, got $dp")
    val p = math.pow(10, dp)
    floor(c * p) / p
  }

  /** [[floorAt]] for a plain JVM double (typed-Dataset code paths run
    * outside Catalyst) — the identical IEEE multiply/floor/divide.
    */
  def floorDouble(x: Double, dp: Int): Double = {
    require(dp >= 0, s"floorDouble requires dp >= 0, got $dp")
    val p = math.pow(10, dp)
    math.floor(x * p) / p
  }

  /** The DuckDB expression mirroring [[floorAt]]. */
  def floorAtSql(expr: String, dp: Int): String = {
    require(dp >= 0, s"floorAtSql requires dp >= 0, got $dp")
    val p = BigDecimal(math.pow(10, dp)).toBigInt
    s"floor(($expr) * $p) / $p"
  }
}
