package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.Relational

/** The two shuffle-shaping techniques SURVEY.md §4 calls out for the
  * 100 TB design point, each proven on the fixtures:
  *  - salting: identical result set to the plain join, hot keys split
  *  - bucketing: a bucketed-by-join-key table pair joins with NO
  *    shuffle exchange on either side (co-located sort-merge join)
  */
class ScaleTechniquesSpec extends SparkSpec {

  test("saltedJoin returns exactly the plain inner join's rows") {
    val orders = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val lineitem = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_linenumber")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    val plain = lineitem.join(orders, Seq("o_orderkey"))
      .select("o_orderkey", "l_linenumber", "o_custkey")
    val salted = Relational.saltedJoin(lineitem, orders, "o_orderkey",
        bigSaltSource = col("l_linenumber"), saltFactor = 4)
      .select("o_orderkey", "l_linenumber", "o_custkey")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = "/tmp/graft-bucketed"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_orders").mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_lineitem").mode("overwrite").saveAsTable("b_lineitem")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("b_lineitem").join(spark.table("b_orders"), Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle either side:\n$plan")
      assert(joined.count() === Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir),
          col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
