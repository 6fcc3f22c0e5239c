package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Relational

/** Batch-ingest pipeline (SURVEY.md §2.9, §3.3): the reference pulls
  * interpolated PI Web API batches, coerces values in pandas, and COPYs
  * into PostgreSQL (reference `src/pi/extraction/ingest.py:91-188`).
  * Here the same semantics are one declarative DataFrame pipeline:
  * coercions are Column expressions, the path→id lookup is a broadcast
  * join, dedup is a keyed window — all partition-parallel.
  */
object Ingest {

  /** F7 — ISO8601 parse + the reference's fixed +7h shift to plant-local
    * time (`ingest.py:146`). The shift stays an explicit ingest-boundary
    * transform, never a session timezone (SURVEY.md §7.4 item 5). */
  def parseTimestamp(raw: Column): Column =
    (to_timestamp(raw) + expr("INTERVAL 7 HOURS")).cast("timestamp_ntz")

  /** F8/F9 — value coercion matching `pd.to_numeric(errors='coerce')`
    * plus bool→1/0 (`ingest.py:147-148`): non-numeric strings → NULL. */
  def coerceValue(colName: String): Column =
    when(lower(col(colName)) === "true", 1.0)
      .when(lower(col(colName)) === "false", 0.0)
      .otherwise(expr(s"try_cast($colName AS double)"))

  /** The full micro-batch transform: raw (lookup_key, timestamp, value)
    * strings → archive rows (attribute_id, timestamp, value).
    *  - J3: broadcast join against the path→attribute_id mapping
    *  - P8: drop unmapped keys (`ingest.py:149`)
    *  - A7: keep-first dedup on the archive key (`ingest.py:155-159`,
    *    pandas `keep='first'` = ARRIVAL order). The arrival rank is
    *    stamped on the raw rows before any transform:
    *    `monotonically_increasing_id` encodes (partition, offset), which
    *    reproduces the reference's concatenated-fetch order for each
    *    source split — not a value-based tiebreak.
    */
  def coerceBatch(raw: DataFrame, mapping: DataFrame): DataFrame = {
    val joined = raw
      .withColumn("__arrival", monotonically_increasing_id())
      .withColumn("timestamp", parseTimestamp(col("timestamp")))
      .withColumn("value", coerceValue("value"))
      .join(broadcast(mapping.select(col("lookup_key"), col("attribute_id"))),
        Seq("lookup_key"), "left")
      .filter(col("attribute_id").isNotNull) // P8
      // a null timestamp has no archive key and no date partition: it
      // would land in the HIVE_DEFAULT partition where upsert's
      // null-key joins can silently drop prior rows — reject at ingest
      .filter(col("timestamp").isNotNull)
      .select(col("attribute_id").cast("int"), col("timestamp"), col("value"),
        col("__arrival"))
    Relational.dedupFirst(joined, Seq("attribute_id", "timestamp"), Seq(col("__arrival")))
      .drop("__arrival")
  }

  /** T1 — incremental watermark: next pull window starts one interval
    * after the stored max timestamp (`ingest.py:217-221`). Returns None
    * on an empty archive (reference falls back to a full backfill). */
  def incrementalStart(archive: DataFrame, intervalMinutes: Int = 1): Option[Timestamp] = {
    val row = archive.agg(max(col("timestamp")).as("wm")).head()
    if (row.isNullAt(0)) None
    else {
      val ts = row.get(0) match {
        case t: Timestamp => t
        case ldt: java.time.LocalDateTime => Timestamp.valueOf(ldt)
      }
      Some(Timestamp.from(ts.toInstant.plusSeconds(intervalMinutes * 60L)))
    }
  }

  /** A9/T2 — density gate: a pull of `minutes` minutes is complete when
    * it yields at least `minutes × expectedRowsPerMinute` rows
    * (`ingest.py:232-239`; 5000/min is the reference's constant). */
  def densityOk(rowCount: Long, minutes: Long, expectedRowsPerMinute: Long = 5000L): Boolean =
    rowCount >= minutes * expectedRowsPerMinute

  /** T2 — bounded recovery: split a failed window into 1-hour chunks
    * (59-minute inclusive windows, `ingest.py:260-269`). */
  def hourlyChunks(start: Timestamp, end: Timestamp): Seq[(Timestamp, Timestamp)] = {
    val out = Seq.newBuilder[(Timestamp, Timestamp)]
    var cur = start.toInstant
    val stop = end.toInstant
    while (!cur.isAfter(stop)) {
      val chunkEnd = cur.plusSeconds(59 * 60L)
      out += ((Timestamp.from(cur), Timestamp.from(if (chunkEnd.isAfter(stop)) stop else chunkEnd)))
      cur = cur.plusSeconds(3600L)
    }
    out.result()
  }
}
