package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded range join — pairs an anchor row with every probe row of
  * the same key whose value lies in `[anchor - width, anchor]` (e.g.
  * "all clicks in the 5 minutes before each error").
  *
  * Spark plans a raw inequality join as BroadcastNestedLoopJoin —
  * O(n·m) comparisons, the classic range-join scale-killer. The
  * scalable encoding is interval BINNING: quantize values into
  * fixed-width bins, equi-join on (key, bin), and re-check the exact
  * range on the (small) candidate set. A window of width `w` with bin
  * size `w` overlaps at most two bins, so each anchor row expands to
  * exactly 2 join keys — the shuffle is hash-partitioned, linear in
  * input size, and AQE-handles skew like any other equi-join. This is
  * the standard trick range-join-capable engines apply internally;
  * here it is declared with the DataFrame API so Catalyst still sees
  * an ordinary shuffled equi-join.
  */
object RangeJoin {

  /** @param anchor rows whose trailing window is probed
    * @param probe  rows looked up inside each anchor's window
    * @param key    equi-join key column name (both sides)
    * @param anchorV/probeV numeric (double) value column names
    * @param width  window width in value units; pairs satisfy
    *               `anchorV - width <= probeV <= anchorV`
    * @return anchor columns + probe payload columns prefixed `probe_`
    */
  def trailingWindowJoin(anchor: DataFrame, probe: DataFrame, key: String,
                         anchorV: String, probeV: String, width: Double,
                         probeCols: Seq[String]): DataFrame = {
    require(width > 0, s"window width $width must be positive")
    val bin = (c: Column) => floor(c / lit(width)).cast("long")
    val a = anchor
      .withColumn("__bin", explode(array_distinct(array(
        bin(col(anchorV) - lit(width)), bin(col(anchorV))))))
    val p = probe
      .select(col(key).as("__pk") +: bin(col(probeV)).as("__bin") +:
        col(probeV).as("__pv") +: probeCols.map(c => col(c).as(s"probe_$c")): _*)
    a.join(p, a(key) === p("__pk") && a("__bin") === p("__bin"))
      .filter(col("__pv") >= col(anchorV) - lit(width) &&
        col("__pv") <= col(anchorV))
      .drop("__bin", "__pk", "__pv")
  }
}
