package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-curve fixture generator: replicate the sf0.1 tables `factor`×
  * with key offsets, so per-key structure (join fan-out, session shape,
  * near-dup group size) is preserved while totals scale linearly — the
  * honest way to measure the engine's scaling curve without inventing a
  * new data distribution. Design choices that keep the curve meaningful:
  *
  *  - Dimensions (region/nation/customer/supplier/part) stay fixed —
  *    realistic (dims grow far slower than facts) and it keeps the
  *    broadcast-join side constant across scale points.
  *  - Fact keys (order key, event id, user id, doc id, vec id) are
  *    offset per replica, so each replica carries the original key
  *    structure and cross-replica keys never collide.
  *  - Document tokens are replica-tagged (every token prefixed) for
  *    replicas > 0: token sets of different replicas are DISJOINT, so
  *    near-dup pair density stays linear in the factor. Tagging whole
  *    texts instead would leave cross-replica jaccard ≈ 1 and inflate
  *    pairs quadratically — that would measure the fixture, not the
  *    engine.
  *  - Embedding block labels are offset per replica for the same
  *    reason (the near-dup operator blocks on label); vectors are kept
  *    bit-identical, which ANN handles fine (bucket population scales
  *    linearly).
  *  - events.ts inherits whichever physical layout the source fixture
  *    has (the adaptive loader reads either; current testdata is native
  *    TIMESTAMP(MICROS), older fixtures were int64 nanos), so the
  *    scaled fixture exercises the same loader path as its source.
  *
  * Usage: runMain graft.ScaleGen <srcSfDir> <outDir> <factor>
  */
object ScaleGen {

  private def rep(df: DataFrame, factor: Int): DataFrame =
    // repartition on the replica id AFTER the explode: without it the
    // output keeps the source's partitioning (sf0.1 tables are 1-2
    // files), so a 100× fact table funnels through 1-2 write tasks —
    // at that factor the generator itself becomes the bottleneck
    df.withColumn("__rep", explode(sequence(lit(0L), lit(factor - 1L))))
      .repartition(col("__rep"))

  /** max(key)+1 as Long — cast-safe for any integral key type, 0 for an
    * empty or all-null table (replication of nothing is nothing). */
  private def span(df: DataFrame, k: String): Long =
    Option(df.agg(max(col(k).cast("long"))).head().get(0))
      .fold(0L)(_.asInstanceOf[Long] + 1L)

  /** key + rep * (max(key)+1): replica 0 keeps original keys. */
  private def offsetBySpan(df: DataFrame, keys: Seq[String]): DataFrame = {
    val spans = keys.map(k => k -> span(df, k)).toMap
    keys.foldLeft(df)((d, k) =>
      d.withColumn(k, (col(k).cast("long") + col("__rep") * spans(k))
        .cast(d.schema(k).dataType)))
  }

  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS) = args.take(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, out, factorS.toInt)
    println(s"""{"scalegen":"done","out":"$out","factor":$factorS}""")
    spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    def write(df: DataFrame, name: String): Unit =
      df.drop("__rep").write.mode("overwrite").parquet(s"$out/$name.parquet")

    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      write(spark.read.parquet(s"$src/$t.parquet"), t)

    write(offsetBySpan(rep(spark.read.parquet(s"$src/orders.parquet"), factor),
      Seq("o_orderkey")), "orders")
    write(offsetBySpan(rep(spark.read.parquet(s"$src/lineitem.parquet"), factor),
      Seq("l_orderkey")), "lineitem")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    write(offsetBySpan(rep(spark.read.parquet(s"$src/events.parquet"), factor),
      Seq("event_id", "user_id")), "events")

    val docs = offsetBySpan(rep(spark.read.parquet(s"$src/documents.parquet"), factor),
      Seq("doc_id"))
    write(docs.withColumn("text",
      when(col("__rep") === 0, col("text")).otherwise(
        array_join(transform(split(col("text"), "\\s+"),
          t => concat(lit("q"), col("__rep"), t)), " "))), "documents")

    val emb = offsetBySpan(rep(spark.read.parquet(s"$src/embeddings.parquet"), factor),
      Seq("vec_id"))
    val labelSpan = span(spark.read.parquet(s"$src/embeddings.parquet"), "label")
    write(emb.withColumn("label",
      (col("label") + col("__rep") * labelSpan).cast("int")), "embeddings")
  }
}
