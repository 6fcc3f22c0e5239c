package graft

import org.apache.spark.sql.functions._

import graft.model.Tables

/** Dev utility: dump the co-purchase edge-derivation physical plan in
  * both forms (plain scan self-join vs the basketItems repartition) —
  * the plan evidence for the r11 graph-family fan-out fix, since the
  * graph cells' final explain only shows the post-kernel tail. */
object EdgePlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-edgeplan")
    def liPlain = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey"))
    def edgesOf(li: org.apache.spark.sql.DataFrame) =
      li.select(col("ok"), col("l_partkey").as("src"))
        .join(li.select(col("ok"), col("l_partkey").as("dst")), "ok")
        .filter(col("src") =!= col("dst"))
    println("=== BEFORE: plain scan self-join ===")
    edgesOf(liPlain).explain("formatted")
    println("=== AFTER: repartition(ok) self-join (basketItems) ===")
    edgesOf(liPlain.repartition(col("ok"))).explain("formatted")
    spark.stop()
  }
}
