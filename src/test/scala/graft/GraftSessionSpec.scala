package graft

class GraftSessionSpec extends SparkSpec {

  test("GraftSession.local applies the recommended runtime configuration") {
    // getOrCreate reuses the shared test session and applies the RUNTIME
    // confs to it — assert them, then restore the suite's defaults so no
    // other spec sees a drifted session
    val s = GraftSession.local(4, "graft-session-spec")
    try {
      assert(s.conf.get("spark.sql.shuffle.partitions") === "4")
      assert(s.conf.get(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum") === "32")
      assert(s.conf.get("spark.sql.session.timeZone") === "UTC")
    } finally {
      s.conf.unset("spark.sql.adaptive.coalescePartitions.initialPartitionNum")
      s.conf.set("spark.sql.shuffle.partitions", "4")
    }
  }
}
