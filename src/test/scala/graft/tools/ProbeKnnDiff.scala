package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VecFns
import graft.operators.Similarity

/** Scratch diff: contracted knnJoin vs the uncontracted reference on a
  * cloned corpus — prints the symmetric difference with context.
  */
object ProbeKnnDiff {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = emb.orderBy("vec_id").limit(200)
      .select(col("vec_id"), col("embedding")).cache()
    base.count()
    val emb3 = base
      .unionByName(base.select((col("vec_id") + 1000000).as("vec_id"), col("embedding")))
      .unionByName(base.select((col("vec_id") + 2000000).as("vec_id"), col("embedding")))
      .cache()
    emb3.count()
    val k = 3; val numBits = 16; val bands = 4; val seed = 42L
    val w = numBits / bands
    val mask = (1L << w) - 1L
    val sigged = emb3.select(col("vec_id").as("id"), col("embedding").as("v"),
      VecFns.hyperplaneSig(col("embedding"), numBits, seed).as("sig"))
    val banded = sigged.select(col("id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * w).bitwiseAND(lit(mask)).as("bh"))
      }: _*)).as("b"))
      .select(col("id"), col("b.band"), col("b.bh"))
    val vecs = sigged.select(col("id"), col("v"))
    val pairs = banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.id") =!= col("r.id"))
      .select(col("l.id").as("id"), col("r.id").as("nn_id"))
      .distinct()
      .join(vecs.select(col("id"), col("v").as("va")), "id")
      .join(vecs.select(col("id").as("nn_id"), col("v").as("vb")), "nn_id")
      .withColumn("cosine", round(VecFns.cosine(col("va"), col("vb")), 6))
      .drop("va", "vb")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("cosine").desc, col("nn_id").asc)
    val reference = pairs.withColumn("__rn", row_number().over(win))
      .filter(col("__rn") <= k).drop("__rn")
      .as[(Long, Long, Double)].collect().toSet
    val contracted = Similarity.knnJoin(emb3, "vec_id", "embedding", k,
        numBits, bands, seed)
      .as[(Long, Long, Double)].collect().toSet
    pairs.filter(col("id") === 0).withColumn("__rn", row_number().over(win))
      .orderBy("__rn").collect()
      .foreach(r => println(s"[probe] id0 pair $r"))
    val perId = reference.groupBy(_._1).map(_._2.size)
    println(s"[probe] ref ids=${reference.map(_._1).size} " +
      s"rowsPerId min=${perId.min} max=${perId.max} " +
      s"distinctIds=${reference.map(_._1).toSeq.distinct.size}")
    val refOnly = (reference diff contracted).toSeq.sortBy(x => (x._1, x._2))
    val conOnly = (contracted diff reference).toSeq.sortBy(x => (x._1, x._2))
    println(s"[probe] ref=${reference.size} con=${contracted.size} " +
      s"refOnly=${refOnly.size} conOnly=${conOnly.size}")
    refOnly.take(10).foreach(x => println(s"[probe] refOnly $x"))
    conOnly.take(10).foreach(x => println(s"[probe] conOnly $x"))
    // context for the first diverging id
    (refOnly.headOption orElse conOnly.headOption).foreach { case (id0, _, _) =>
      println(s"[probe] window for id=$id0:")
      reference.filter(_._1 == id0).toSeq.sortBy(_._2)
        .foreach(x => println(s"[probe]   ref $x"))
      contracted.filter(_._1 == id0).toSeq.sortBy(_._2)
        .foreach(x => println(s"[probe]   con $x"))
    }
    spark.stop()
  }
}
