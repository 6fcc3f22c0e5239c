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

  test("registry compaction folds in place; post-compaction batches attribute identically") {
    val ev = Tables.events(spark, sfDir).localCheckpoint()
    val split = lit("2024-01-20 00:00:00").cast("timestamp")
    val dir = Files.createTempDirectory("graft_attrib_cmp").toString
    val cmpDir = Files.createTempDirectory("graft_attrib_ref").toString
    // four installments fill the registry with four batch partitions;
    // the tail arrives as batch 4 AFTER compaction on one side and with
    // the registry untouched on the other — attributions must agree
    val pre = ev.filter(col("ts") < split)
    val tail = ev.filter(col("ts") >= split)
    val week = expr("unix_micros(cast(ts as timestamp)) div 604800000000")
    Seq(dir, cmpDir).foreach { d =>
      Seq(0L, 1L, 2L, 3L).foreach { i =>
        StreamingAttribution.batchStep(spark, s"$d/registry", s"$d/out",
          WindowUs)(pre.filter(week % 4 === i), i)
      }
    }
    val rawUsers = StreamingAttribution.readRegistry(spark, s"$dir/registry")
      .select("user_id").distinct().count()
    StreamingAttribution.compactRegistry(spark, s"$dir/registry",
      upToBatchId = 4L)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the folded partitions are GONE; only the batch_id=-1 base remains
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/registry"))
      .map(_.getPath.getName).filter(_.startsWith("batch_id=")).sorted
    assert(parts.toSeq === Seq("batch_id=-1"),
      s"expected only the compacted base, got ${parts.mkString(",")}")
    // exactly one row per user — the global latest click — and the
    // strictly-earlier read of the NEXT batch includes it with no wiring
    val base = StreamingAttribution.readRegistry(spark, s"$dir/registry")
    assert(base.groupBy("user_id").count().filter(col("count") > 1).isEmpty)
    assert(base.count() === rawUsers)
    // the advisor's scenario: batchStep AFTER compact+prune must not
    // lose click history — parity with the never-compacted registry
    StreamingAttribution.batchStep(spark, s"$dir/registry", s"$dir/out",
      WindowUs)(tail, 4L)
    StreamingAttribution.batchStep(spark, s"$cmpDir/registry", s"$cmpDir/out",
      WindowUs)(tail, 4L)
    assert(outRows(spark.read.parquet(s"$dir/out/batch_id=4")) ===
      outRows(spark.read.parquet(s"$cmpDir/out/batch_id=4")),
      "post-compaction attribution diverges from the uncompacted registry")
    // and the full concatenated outputs of the two sides agree (the
    // week-sliced installments are deliberately NOT ts-ordered, so the
    // all-history batch twin does not apply here — ts-ordered
    // equivalence is test 1's claim)
    assert(outRows(spark.read.option("basePath", s"$dir/out")
      .parquet(s"$dir/out")) ===
      outRows(spark.read.option("basePath", s"$cmpDir/out")
        .parquet(s"$cmpDir/out")))
    // compaction is idempotent: folding again (base only) is a no-op fold
    StreamingAttribution.compactRegistry(spark, s"$dir/registry",
      upToBatchId = 5L)
    assert(outRows(spark.read.parquet(s"$dir/out/batch_id=4")).nonEmpty)
  }
}
