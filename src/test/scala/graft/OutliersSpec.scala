package graft

import org.apache.spark.sql.functions._

import graft.operators.Outliers

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  // group g: values 1..10 (plus an extreme 1000 in the 'h' group)
  private val df = ((1 to 10).map(i => ("g", i.toDouble)) ++
    Seq(("h", 1.0), ("h", 2.0), ("h", 3.0), ("h", 1000.0))).toDF("grp", "v")

  test("winsorize clamps the tails and counts them") {
    val r = Outliers.winsorize(df, col("grp"), col("v"), 0.1, 0.9)
      .orderBy("__g").as[(String, Long, Long, Long, Double)].collect()
    val g = r(0); val h = r(1)
    // g: p10 = 1.9, p90 = 9.1 -> one row clamped on each side;
    // winsorized mean = (1.9 + 2..9 sum(44) + 9.1)/10 = 5.5
    assert(g == ("g", 10L, 1L, 1L, 5.5))
    // h: p10 of (1,2,3,1000) = 1.3, p90 = 700.9 ->
    // mean = (1.3 + 2 + 3 + 700.9)/4 = 176.8
    assert(h == ("h", 4L, 1L, 1L, 176.8))
  }

  test("tukeyFences flags the extreme value only") {
    val r = Outliers.tukeyFences(df, col("grp"), col("v"))
      .orderBy("__g").as[(String, Long, Long, Long, Double, Double)].collect()
    // g: q1 = 3.25, q3 = 7.75, iqr = 4.5 -> fences [-3.5, 14.5]
    assert(r(0) == ("g", 10L, 0L, 0L, -3.5, 14.5))
    // h: q1 = 1.75, q3 = 252.25, iqr = 250.5 -> hi fence 628 < 1000
    assert(r(1)._4 == 1L)
  }

  test("winsorized mean is deterministic under repartitioning (fixed-point agg)") {
    val big = (1 to 5000).map(i => ("g", (i % 997).toDouble * 1.000001)).toDF("grp", "v")
    val a = Outliers.winsorize(big, col("grp"), col("v"), 0.05, 0.95).collect().toSeq
    val b = Outliers.winsorize(big.repartition(17), col("grp"), col("v"), 0.05, 0.95)
      .collect().toSeq
    assert(a == b)
  }

  test("madProfile: hand-computed lower medians and outlier counts") {
    // g1 sorted: [1,2,3,4,100] → med = 3 (lower median, rank (5+1)/2);
    // deviations [2,1,0,1,97] sorted [0,1,1,2,97] → mad = 1;
    // outliers |v-3| > 3: only 100. g2 even count: [10,20,30,40] →
    // lower median rank (4+1) div 2 = 2 → med 20; dev [10,0,10,20]
    // sorted [0,10,10,20] → mad = 10; outliers |v-20| > 30: none.
    val df = Seq(("g1", 1L), ("g1", 2L), ("g1", 3L), ("g1", 4L), ("g1", 100L),
      ("g2", 10L), ("g2", 20L), ("g2", 30L), ("g2", 40L)).toDF("grp", "v")
    val out = Outliers.madProfile(df, col("grp"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("g1") == ((5L, 3L, 1L, 1L)))
    assert(out("g2") == ((4L, 20L, 10L, 0L)))
  }

  test("madProfile excludes NULL values from the population") {
    // nulls are not population: they must not shift the rank-selected
    // medians (a null sorts first under the windows) nor count into n.
    // g1 = the hand-computed case above plus two null rows — the
    // profile must be identical to the null-free one.
    val df = Seq(("g1", Some(1L)), ("g1", Some(2L)), ("g1", Some(3L)),
      ("g1", Some(4L)), ("g1", Some(100L)), ("g1", None), ("g1", None))
      .toDF("grp", "v")
    val out = Outliers.madProfile(df, col("grp"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("g1") == ((5L, 3L, 1L, 1L)))
  }

  test("madProfile equals a driver-side reference on a pseudo-random group") {
    val df = spark.range(0, 999).select(
      concat(lit("g"), pmod(col("id"), lit(2))).as("grp"),
      pmod(xxhash64(col("id")), lit(1000)).as("v"))
    val rows = df.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    def ref(vs: Seq[Long], k: Int) = {
      val sorted = vs.sorted
      val med = sorted((sorted.size + 1) / 2 - 1)
      val dev = vs.map(x => math.abs(x - med)).sorted
      val mad = dev((dev.size + 1) / 2 - 1)
      (vs.size.toLong, med, mad, vs.count(x => math.abs(x - med) > k * mad).toLong)
    }
    val want = rows.groupBy(_._1).view.mapValues(g => ref(g.map(_._2), 3)).toMap
    val got = Outliers.madProfile(df, col("grp"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == want)
  }
}
