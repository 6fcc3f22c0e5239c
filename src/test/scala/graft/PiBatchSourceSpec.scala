package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ingest.Ingest

class PiBatchSourceSpec extends SparkSpec {

  private val tagTemp = "\\\\AF\\Plant\\U1|temp"
  private val tagPress = "\\\\AF\\Plant\\U1|press"

  private def readPi(endTicks: Long, maxPerBatch: Long) =
    spark.readStream.format("graft.sources.PiBatchSource")
      .option("tags", s"$tagTemp,$tagPress")
      .option("baseTime", "2024-01-01T00:00:00")
      .option("intervalSeconds", "60")
      .option("endTicks", endTicks.toString)
      .option("maxTicksPerBatch", maxPerBatch.toString)
      .load()

  test("emits the interpolation grid per tag with the reference's dirty shapes") {
    val dir = Files.createTempDirectory("graft_pi1").toString
    val q = readPi(endTicks = 20, maxPerBatch = 100)
      .writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() === 40) // 2 tags x 20 ticks
    // 1-minute grid from baseTime
    val times = out.filter(col("lookup_key") === tagTemp)
      .select("timestamp").collect().map(_.getString(0)).sorted
    assert(times.head === "2024-01-01T00:00:00" && times.last === "2024-01-01T00:19:00")
    // dirty schedule: tick 13 -> boolean, tick 17 -> PI error-dict garbage
    val byTick = out.filter(col("lookup_key") === tagTemp).collect()
      .map(r => r.getString(1) -> r.getString(2)).toMap
    assert(byTick("2024-01-01T00:13:00") === "false")
    assert(byTick("2024-01-01T00:17:00").startsWith("{\"Errors\""))
  }

  test("T1 restart resume: checkpointed offsets continue, no re-emission") {
    val dir = Files.createTempDirectory("graft_pi2").toString
    def run(endTicks: Long): Unit = {
      val q = readPi(endTicks, maxPerBatch = 2)
        .writeStream.format("parquet")
        .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    run(endTicks = 4)
    assert(spark.read.parquet(s"$dir/out").count() === 8) // 2 tags x 4 ticks
    run(endTicks = 8) // stream "grew": only ticks 4..7 are new
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() === 16)
    assert(out.select("lookup_key", "timestamp").distinct().count() === 16) // no dups
  }

  test("ProcessingTime trigger: admission control paces maxTicksPerBatch per batch") {
    val dir = Files.createTempDirectory("graft_pi4").toString
    val q = readPi(endTicks = 12, maxPerBatch = 3)
      .writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime(0L)) // continuous polling path
      .start()
    try {
      // the live-stream path: the engine repeatedly calls
      // latestOffset(start, limit) (SupportsAdmissionControl) instead of
      // AvailableNow's prepared end; processAllAvailable drains to endTicks
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dir/out")
      assert(out.count() === 24) // 2 tags x 12 ticks
      assert(out.select("lookup_key", "timestamp").distinct().count() === 24)
      // paced: 12 ticks at 3/batch needs >= 4 committed micro-batches
      assert(q.recentProgress.count(_.numInputRows > 0) >= 4)
    } finally q.stop()
  }

  test("feeds the coercion pipeline end-to-end (booleans, garbage, mapping)") {
    val dir = Files.createTempDirectory("graft_pi3").toString
    val q = readPi(endTicks = 20, maxPerBatch = 100)
      .writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val sess = spark
    import sess.implicits._
    val mapping = Seq((tagTemp, 1)).toDF("lookup_key", "attribute_id") // press unmapped
    val coerced = Ingest.coerceBatch(spark.read.parquet(s"$dir/out"), mapping)
    assert(coerced.select("attribute_id").distinct().collect()
      .map(_.getInt(0)).toSeq === Seq(1)) // unmapped tag dropped (P8)
    val byTs = coerced.collect().map(r => r.get(1).toString -> r).toMap
    // +7h shift applied; boolean tick 13 -> 0.0 ("false"); garbage tick 17 -> null
    assert(byTs.keys.forall(_.startsWith("2024-01-01T07")))
    assert(byTs("2024-01-01T07:13").getDouble(2) === 0.0)
    assert(byTs("2024-01-01T07:17").isNullAt(2))
  }
}
