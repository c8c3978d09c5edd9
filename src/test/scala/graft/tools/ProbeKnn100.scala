package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VecFns
import graft.operators.Similarity

/** m=100 clone-cluster check: contracted knnJoin must emit k rows per
  * member (clone candidates guarantee ≥k at cosine 1.0) and equal the
  * uncontracted reference.
  */
object ProbeKnn100 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = emb.orderBy("vec_id").limit(50)
      .select(col("vec_id"), col("embedding")).cache()
    base.count()
    val m = 100
    val copies = spark.range(m).select(col("id").as("__copy"))
    val embM = base.crossJoin(copies)
      .select((col("vec_id") + col("__copy") * 1000L).as("vec_id"), col("embedding"))
      .cache()
    println(s"[probe] corpus rows=${embM.count()}")
    val k = 3; val numBits = 16; val bands = 4; val seed = 42L
    val contracted = Similarity.knnJoin(embM, "vec_id", "embedding", k,
      numBits, bands, seed)
    val n = contracted.count()
    println(s"[probe] contracted rows=$n expected=${50 * m * k}")
    val perId = contracted.groupBy("id").agg(count(lit(1)).as("c"))
    println(s"[probe] ids=${perId.count()} minPerId=" +
      perId.agg(min(col("c")), max(col("c"))).head())
    // uncontracted reference
    val w = numBits / bands
    val mask = (1L << w) - 1L
    val sigged = embM.select(col("vec_id").as("id"), col("embedding").as("v"),
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
      .filter(col("__rn") <= k)
      .select(col("id"), col("nn_id"), col("cosine"))
      .as[(Long, Long, Double)].collect().toSet
    val con = contracted.select(col("id"), col("nn_id"), col("cosine"))
      .as[(Long, Long, Double)].collect().toSet
    println(s"[probe] ref=${reference.size} con=${con.size} " +
      s"refOnly=${(reference diff con).size} conOnly=${(con diff reference).size}")
    (reference diff con).take(5).foreach(x => println(s"[probe] refOnly $x"))
    (con diff reference).take(5).foreach(x => println(s"[probe] conOnly $x"))
    spark.stop()
  }
}
