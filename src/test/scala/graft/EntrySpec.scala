package graft

/** Driver-contract smoke: entry() must work on a plain session (the
  * driver supplies its own), and every query name must have either an
  * oracle or be a deliberate rows-only entry.
  */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001 from a fresh session") {
    val fresh = spark.newSession()
    assert(SparkEntry.entry(fresh).count() > 0)
  }

  test("oracle keys are a subset of query names; rows-only set is known") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without queries: ${os -- qs}")
    // every query carries an oracle except the approx-sketch profile,
    // whose estimates are estimator-specific by design (the driver records
    // a rows-only check; SketchSpec bounds the estimates against exact)
    assert((qs -- os) === Set("q90_approx_profile"), (qs -- os).toString)
  }

  test("query names are well-formed and oracle SQL non-empty") {
    SparkEntry.queries.keys.foreach(k =>
      assert(k.matches("q\\d+_\\w+"), k))
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty, k)
    }
  }
}
