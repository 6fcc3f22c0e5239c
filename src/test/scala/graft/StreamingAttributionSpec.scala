package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.streaming.StreamingAttribution

/** Streaming last-touch attribution: the per-user latest-click registry
  * must make ts-ordered installments concatenate EXACTLY to the batch
  * as-of on the union, survive micro-batch replays byte-identically,
  * and compact to |users| rows without changing any attribution.
  */
class StreamingAttributionSpec extends SparkSpec {

  private val WindowUs = 86400000000L

  private def outRows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.select("event_id", "channel").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  /** Batch twin: attribute ALL purchases in `ev` against ALL clicks. */
  private def batchTwin(ev: org.apache.spark.sql.DataFrame) = {
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    StreamingAttribution.attribute(purchases, clicks, WindowUs)
  }

  test("ts-ordered installments concatenate to the batch as-of; replay is byte-identical") {
    val ev = Tables.events(spark, sfDir).localCheckpoint()
    val splits = Seq("2024-01-08 00:00:00", "2024-01-20 00:00:00")
      .map(s => lit(s).cast("timestamp"))
    val batches = Seq(
      ev.filter(col("ts") < splits(0)),
      ev.filter(col("ts") >= splits(0) && col("ts") < splits(1)),
      ev.filter(col("ts") >= splits(1)))
    val dir = Files.createTempDirectory("graft_attrib").toString
    val (reg, out) = (s"$dir/registry", s"$dir/out")
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingAttribution.batchStep(spark, reg, out, WindowUs)(b, i.toLong)
    }
    val streamed = spark.read.option("basePath", out).parquet(out)
    assert(outRows(streamed) === outRows(batchTwin(ev)),
      "concatenated installments diverge from the batch as-of")
    assert(streamed.count() ===
      ev.filter(col("event_type") === "purchase").count())

    // replay batch 1 (the crash-restart path): strictly-earlier registry
    // read means it cannot see batch 2's claims; both partitions rewrite
    // to the same content
    val before = outRows(spark.read.parquet(s"$out/batch_id=1"))
    StreamingAttribution.batchStep(spark, reg, out, WindowUs)(batches(1), 1L)
    assert(outRows(spark.read.parquet(s"$out/batch_id=1")) === before,
      "replayed batch changed its attribution partition")
    assert(outRows(spark.read.option("basePath", out).parquet(out)) ===
      outRows(batchTwin(ev)))
  }

  test("registry compaction: one row per user, attributions unchanged, fewer files") {
    val ev = Tables.events(spark, sfDir).localCheckpoint()
    val split = lit("2024-01-20 00:00:00").cast("timestamp")
    val dir = Files.createTempDirectory("graft_attrib_cmp").toString
    val reg = s"$dir/registry"
    // four installments fill the registry with four batch partitions
    val pre = ev.filter(col("ts") < split)
    val week = expr("unix_micros(cast(ts as timestamp)) div 604800000000")
    Seq(0L, 1L, 2L, 3L).foreach { i =>
      StreamingAttribution.batchStep(spark, reg, s"$dir/out", WindowUs)(
        pre.filter(week % 4 === i), i)
    }
    val raw = StreamingAttribution.readRegistry(spark, reg)
    spark.sql("DROP TABLE IF EXISTS t_attrib_reg")
    val compacted = StreamingAttribution.compactRegistry(
      spark, reg, s"$dir/reg_compact", "t_attrib_reg", buckets = 8)
    try {
      // exactly one row per user, and it is the global latest click
      assert(compacted.groupBy("user_id").count().filter(col("count") > 1).isEmpty)
      assert(compacted.count() === raw.select("user_id").distinct().count())
      // attributing the tail against compacted == against the raw registry
      val tailP = ev.filter(col("event_type") === "purchase" && col("ts") >= split)
        .select("user_id", "ts", "event_id", "value")
      def latest(r: org.apache.spark.sql.DataFrame) =
        r.groupBy("user_id")
          .agg(max(struct(col("ts"), col("event_id"), col("k"))).as("__m"))
          .select(col("user_id"), col("__m.ts").as("ts"),
            col("__m.event_id").as("event_id"), col("__m.k").as("k"))
      val viaRaw = StreamingAttribution.attribute(tailP,
        latest(raw.select("user_id", "ts", "event_id", "k")), WindowUs)
      val viaCompact = StreamingAttribution.attribute(tailP,
        compacted.select("user_id", "ts", "event_id", "k"), WindowUs)
      assert(outRows(viaCompact) === outRows(viaRaw))
      // user-keyed aggregate over the compacted base needs no exchange
      val agg = spark.table("t_attrib_reg").groupBy("user_id").count()
      val plan = agg.queryExecution.executedPlan.toString
      agg.collect()
      assert(!plan.contains("Exchange"),
        s"bucketed registry aggregate should not shuffle:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS t_attrib_reg")
  }
}
