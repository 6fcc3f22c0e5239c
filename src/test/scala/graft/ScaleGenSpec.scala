package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.text.TextOps

/** The scale-curve fixture generator's invariants — what makes the 10×
  * bench measure the ENGINE and not the fixture: replica 0 is the
  * original data verbatim, totals scale by exactly the factor, and
  * cross-replica rows can never pair up (disjoint token sets / offset
  * block labels), so pair densities stay linear in the factor.
  */
class ScaleGenSpec extends SparkSpec {

  private lazy val out: String = {
    val dir = Files.createTempDirectory("graft_scalegen").toString
    ScaleGen.generate(spark, "/root/testdata/sf0.001", dir, 3)
    dir
  }

  test("fact tables scale by the factor; dimensions stay fixed") {
    for (t <- Seq("orders", "lineitem", "documents", "embeddings")) {
      val src = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet").count()
      val rep = spark.read.parquet(s"$out/$t.parquet").count()
      assert(rep === 3 * src, s"$t: $rep != 3 * $src")
    }
    for (t <- Seq("region", "nation", "customer", "supplier", "part")) {
      assert(spark.read.parquet(s"$out/$t.parquet").count() ===
        spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet").count())
    }
  }

  test("replica 0 preserves the original rows verbatim (documents)") {
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val maxId = src.agg(max("doc_id")).head().getLong(0)
    val rep0 = spark.read.parquet(s"$out/documents.parquet")
      .filter(col("doc_id") <= maxId)
    assert(rep0.exceptAll(src).isEmpty && src.exceptAll(rep0).isEmpty)
  }

  test("cross-replica documents share no tokens; embedding labels never collide") {
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val maxId = src.agg(max("doc_id")).head().getLong(0)
    val docs = spark.read.parquet(s"$out/documents.parquet")
      .withColumn("rep", floor(col("doc_id") / (maxId + 1)).cast("int"))
    val tokReps = docs
      .select(col("rep"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(countDistinct(col("rep")).as("n_reps"))
    assert(tokReps.agg(max("n_reps")).head().getLong(0) === 1L,
      "a token appears in more than one replica — pair density would go quadratic")
    // joins on lineitem-orders keys stay within a replica too
    val lo = spark.read.parquet(s"$out/lineitem.parquet")
      .select(col("l_orderkey")).distinct()
      .join(spark.read.parquet(s"$out/orders.parquet"), col("l_orderkey") === col("o_orderkey"))
    assert(lo.count() === spark.read.parquet(s"$out/lineitem.parquet")
      .select("l_orderkey").distinct().count(), "dangling order keys after offset")
  }
}
