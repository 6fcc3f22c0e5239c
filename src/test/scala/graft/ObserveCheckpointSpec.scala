package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.concurrent.TimeLimits.failAfter
import org.scalatest.time.{Seconds, Span}

/** Pins the mechanism the convergence loops rely on: an `observe`d
  * metric is populated by the EAGER localCheckpoint's own
  * materialization job, so a loop round costs one job (checkpoint)
  * instead of two (checkpoint + separate count). */
class ObserveCheckpointSpec extends SparkSpec {

  test("observe metric is available after an eager localCheckpoint") {
    val obs = Observation()
    val df = spark.range(100)
      .withColumn("flag", (col("id") % 3 === 0).cast("int"))
      .observe(obs, sum(col("flag")).as("moved"))
      .localCheckpoint()
    // obs.get blocks until a listener delivers the metric; the failAfter
    // bound proves the checkpoint action itself delivered it (nothing
    // else acts on the frame before the assertion)
    val got = failAfter(Span(30, Seconds)) { obs.get }
    assert(got("moved") == 34L)
    // and the checkpointed frame is intact
    assert(df.count() == 100L)
  }
}
