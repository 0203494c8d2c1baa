package graft

import org.apache.spark.sql.functions._

/** Approximate/sketch aggregates (HyperLogLog++, quantile summaries).
  * These have no DuckDB oracle — sketch internals differ per engine — so
  * their contract is verified here against exact results with error
  * bounds instead of hash equality.
  */
class SketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct (HLL++) is within 3x rsd of exact") {
    val orders = Tables.load(spark, dir, "orders")
    val rsd = 0.05
    val row = orders.agg(
      approx_count_distinct(col("o_custkey"), rsd).as("approx"),
      count_distinct(col("o_custkey")).as("exact")).head()
    val (a, e) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(a - e) / e <= 3 * rsd, s"approx=$a exact=$e")
  }

  test("approxQuantile(relErr=0) equals an exact rank element; " +
    "relErr>0 brackets it") {
    val li = Tables.load(spark, dir, "lineitem")
    val exact = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0)(0)
    val sketch = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.01)(0)
    val n = li.count()
    val below = li.where(col("l_extendedprice") <= lit(sketch)).count()
    val rank = below.toDouble / n
    assert(math.abs(rank - 0.5) <= 0.02, s"sketch p50 at rank $rank")
    assert(li.where(col("l_extendedprice") === exact).count() > 0,
      "exact-mode quantile must be an actual data element")
  }

  test("q90_approx_profile (the rows-only query) stays within sketch " +
    "bounds of exact per-group values") {
    val got = SparkEntry.queries("q90_approx_profile")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    val events = Tables.load(spark, dir, "events")
    val exact = events.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("du"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got.keySet === exact.keySet)
    got.foreach { case (et, (approxUsers, p50, n)) =>
      val (du, en) = exact(et)
      assert(n === en, s"$et: count must be exact")
      // default HLL++ rsd is 0.05; allow 3x
      assert(math.abs(approxUsers - du).toDouble / du <= 0.15,
        s"$et: approx=$approxUsers exact=$du")
      // accuracy=1000 => rank error <= n/1000; assert the estimate's
      // actual rank is within 5% of the median
      val below = events.where(col("event_type") === et &&
        col("value") <= p50).count()
      assert(math.abs(below.toDouble / en - 0.5) <= 0.05,
        s"$et: p50 estimate at rank ${below.toDouble / en}")
    }
  }

  test("CMS estimates never undercount, and merged shard counters are " +
      "cell-identical to the one-shot matrix") {
    import graft.ops.Sketch
    val ev = Tables.load(spark, dir, "events")
    val (d, w) = (4, 64)
    val full = Sketch.cmsCounters(ev, "user_id", d, w)
    val merged = Sketch.mergeCounters(Seq(
      Sketch.cmsCounters(ev.where(col("event_id") % 2 === 0),
        "user_id", d, w),
      Sketch.cmsCounters(ev.where(col("event_id") % 2 =!= 0),
        "user_id", d, w)))
    val fullCells = full.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val mergedCells = merged.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(mergedCells === fullCells)
    assert(fullCells.size <= d * w)

    // one-sided guarantee over EVERY key: collisions only add
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("exact_cnt"))
    val est = Sketch.cmsEstimate(full, exact.select("user_id"),
      "user_id", d, w)
    val under = est.join(exact, "user_id")
      .where(col("cms_est") < col("exact_cnt")).count()
    assert(under === 0L, "CMS must never undercount")
  }

  test("approxMedianVerified: exact p50 matches rank selection and the " +
      "GK bound holds, down to a coarse sketch") {
    import graft.ops.Agg
    import spark.implicits._
    val ev = Tables.load(spark, dir, "events")
    for (acc <- Seq(10000, 100, 10)) {
      val got = Agg.approxMedianVerified(ev, "event_type", "value", acc)
        .orderBy("event_type")
        .as[(String, Double, Long, Boolean)].collect()
      assert(got.nonEmpty)
      got.foreach { case (et, p50, n, ok) =>
        assert(ok, s"$et: rank bound violated at accuracy=$acc")
        // the emitted median is the exact one: its rank brackets n/2
        val below = ev.where(col("event_type") === et &&
          col("value") <= p50).count()
        assert(math.abs(below.toDouble / n - 0.5) <= 0.01,
          s"$et: exact p50 at rank ${below.toDouble / n}")
      }
    }

    // odd-n fixture with a known middle element
    val fix = (1 to 101).map(i => ("g", i.toDouble)).toDF("k", "x")
    val row = Agg.approxMedianVerified(fix, "k", "x", 100)
      .as[(String, Double, Long, Boolean)].head()
    assert(row === (("g", 51.0, 101L, true)))
  }

  test("hllRegisters: rank is the exact leading-zero count (hand-check " +
      "vs BigInt bit math); shard merge == one-shot; estimate within " +
      "the m=256 error regime of exact") {
    import graft.ops.Sketch
    import spark.implicits._
    // hand-check the string-computed rank against integer bit math on
    // the same md5 tail for a spread of items
    val items = (1L to 200L).toDF("x")
    val got = items.select(col("x"))
      .withColumn("h", md5(col("x").cast("string")))
      .withColumn("tail", expr("conv(substring(h, 3, 13), 16, 10)")
        .cast("long"))
      .join(Sketch.hllRegisters(items, "x", "x"),
        col("x") === col("key"))
      .select(col("x"), col("tail"), col("mx")).as[(Long, Long, Int)]
      .collect()
    got.foreach { case (x, tail, mx) =>
      val expected =
        if (tail == 0L) 53 else 52 - (63 - java.lang.Long.numberOfLeadingZeros(tail)) // 52 - bitlength + 1
      assert(mx === expected, s"item $x tail $tail")
    }

    val ev = Tables.load(spark, dir, "events")
    val merged = Sketch.hllMerge(Seq(
      Sketch.hllRegisters(ev.where(col("event_id") % 2 === 0),
        "event_type", "user_id"),
      Sketch.hllRegisters(ev.where(col("event_id") % 2 =!= 0),
        "event_type", "user_id")))
    val full = Sketch.hllRegisters(ev, "event_type", "user_id")
    assert(merged.unionByName(full).distinct().count() === full.count(),
      "shard-merged registers must equal the one-shot registers")

    val est = Sketch.hllEstimate(full)
      .join(ev.groupBy(col("event_type").as("key"))
        .agg(count_distinct(col("user_id")).as("exact")), "key")
      .select(col("hll_estimate"), col("exact"))
      .as[(Long, Long)].collect()
    est.foreach { case (h, e) =>
      // m=256 -> rsd ~ 1.04/16 = 6.5%; allow 4x for the small-range
      // linear-counting regime the 150-user fixture lands in
      assert(math.abs(h - e) <= math.max(4, 0.26 * e),
        s"estimate $h vs exact $e out of regime")
    }
  }

  test("mgCandidates: superset guarantee holds on an adversarial skewed " +
    "fixture that forces decrements, across capacities and layouts") {
    import graft.ops.Sketch
    import spark.implicits._
    // 3 heavy keys (weights 40/30/20) drowned in 180 distinct singletons:
    // capacity << 183 distinct keys, so every partition's summary
    // decrements constantly. n = 270; c = 4 -> threshold n/5 = 54: no
    // heavy key; c = 8 -> threshold 30: h0 (40); the guarantee is about
    // SUPERSET, so we assert containment for several capacities.
    val rows = Seq.fill(40)("h0") ++ Seq.fill(30)("h1") ++
      Seq.fill(20)("h2") ++ (0 until 180).map(i => s"tail$i")
    for (nPart <- Seq(1, 3, 7); shift <- Seq(0, 97)) {
      // rotate the layout so heavies hit partitions in different orders
      val laid = (rows.drop(shift) ++ rows.take(shift)).toDF("k")
        .repartition(nPart)
      val n = rows.size
      for (c <- Seq(2, 4, 8, 16)) {
        val cands = Sketch.mgCandidates(laid, "k", c)
          .as[String].collect().toSet
        val heavy = rows.groupBy(identity).collect {
          case (k, vs) if vs.size * (c + 1) > n => k
        }.toSet
        assert(heavy.subsetOf(cands),
          s"nPart=$nPart shift=$shift c=$c: missing ${heavy -- cands}")
      }
    }
  }

  test("mgHeavyHitters equals the plain filtered groupBy (exactness of " +
    "the two-pass shape) on events and on the skewed fixture") {
    import graft.ops.Sketch
    import spark.implicits._
    val ev = Tables.load(spark, dir, "events")
    for (c <- Seq(2, 4)) {
      val got = Sketch.mgHeavyHitters(ev, "event_type", c)
        .orderBy("event_type")
        .select("event_type", "exact_cnt").as[(String, Long)].collect()
      val n = ev.count()
      val want = ev.groupBy("event_type").count()
        .where(col("count") * (c + 1) > n).orderBy("event_type")
        .as[(String, Long)].collect()
      assert(got.toSeq === want.toSeq, s"capacity $c diverged")
    }
    val skewed = (Seq.fill(60)("a") ++ Seq.fill(25)("b") ++
      (0 until 15).map(i => s"t$i")).toDF("k").repartition(5)
    val got = Sketch.mgHeavyHitters(skewed, "k", 3)
      .select("k", "exact_cnt", "n_total")
      .as[(String, Long, Long)].collect().toSet
    // threshold is STRICT: b has 25*4 == 100 == n, not > n, so only a
    // passes — the boundary case pins the > (not >=) contract
    assert(got === Set(("a", 60L, 100L)))
  }
}
