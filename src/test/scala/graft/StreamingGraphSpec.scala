package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.GraphOps
import graft.streaming.{RegistryMaintenance, StreamingGraph}

/** Incremental PageRank maintenance: after EVERY batch of edge appends,
  * the registry state equals the batch operator run from scratch on the
  * accumulated edge union — for the final scores AND every intermediate
  * iteration (the per-round columns are the state that makes the
  * affected-neighborhood recompute exact). Plus: replayed batches leave
  * the registry row-identical, untouched components are never
  * rewritten, and registry compaction through the shared maintenance
  * sweep changes nothing. */
class StreamingGraphSpec extends SparkSpec {

  private val Iters = 3

  private def edgeDf(pairs: Seq[(Long, Long)]): DataFrame = {
    val sess = spark
    import sess.implicits._
    pairs.toDF("src", "dst")
  }

  /** Crafted appends: a cycle with a dangling spur, a cross-batch
    * duplicate edge, a brand-new two-node component, a self-loop, and a
    * later batch that bridges the components — every structural case the
    * affected-closure logic must cover. Plus an isolated component in
    * batch 0 that nothing ever touches again. */
  private val batches: Seq[Seq[(Long, Long)]] = Seq(
    Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 2L), (100L, 101L), (101L, 100L)),
    Seq((1L, 2L), (5L, 6L), (6L, 5L), (2L, 4L)), // (1,2) is a duplicate
    Seq((7L, 1L), (3L, 7L), (4L, 4L), (6L, 3L)))

  private def rowSet(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def scoresOf(df: DataFrame): Set[(Long, Long, Long)] =
    df.select("id", "outdeg", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("batch parity after every append, at every iteration depth; replay-stable; " +
      "untouched components not rewritten") {
    val root = Files.createTempDirectory("graft_pr_inc").toString
    val (eDir, sDir) = (s"$root/edges", s"$root/scores")
    val step = StreamingGraph.batchStep(spark, eDir, sDir, "src", "dst", Iters) _

    for (b <- batches.indices) {
      step(edgeDf(batches(b)), b.toLong)
      val union = edgeDf(batches.take(b + 1).flatten)
      // final-score parity with the batch operator on the union
      assert(scoresOf(StreamingGraph.readScores(spark, sDir, Iters)) ===
        scoresOf(GraphOps.pageRank(union, "src", "dst", Iters)),
        s"final-score parity broke after batch $b")
      // every intermediate round is maintained exactly too: s_i equals a
      // fixed-(i)-iteration batch run
      for (i <- 1 until Iters) {
        val si = StreamingGraph.readScores(spark, sDir, Iters)
          .select(col("id"), col("outdeg"), col(s"s$i").as("score"))
        assert(scoresOf(si) ===
          scoresOf(GraphOps.pageRank(union, "src", "dst", i)),
          s"round-$i parity broke after batch $b")
      }
    }

    // the isolated 100↔101 component was written once (batch 0) and
    // never again — the incremental contract: write volume follows the
    // disturbed neighborhood, not |V|
    for (b <- 1 to 2) {
      val part = spark.read.parquet(s"$sDir/batch_id=$b")
      assert(part.filter(col("id") >= 100L).isEmpty,
        s"batch $b rewrote the untouched component")
    }
    // duplicate edge (1,2) in batch 1 contributed nothing to the log
    assert(spark.read.parquet(s"$eDir/batch_id=1")
      .filter(col("src") === 1L && col("dst") === 2L).isEmpty)

    // replay safety: redeliver the last batch; both registries unchanged
    val eBefore = rowSet(StreamingGraph.readEdges(spark, eDir))
    val sBefore = rowSet(spark.read.option("basePath", sDir).parquet(sDir))
    step(edgeDf(batches(2)), 2L)
    assert(rowSet(StreamingGraph.readEdges(spark, eDir)) === eBefore)
    assert(rowSet(spark.read.option("basePath", sDir).parquet(sDir)) === sBefore)

    // a no-new-edges batch: empty partitions, state unchanged
    step(edgeDf(Seq((1L, 2L), (2L, 3L))), 3L)
    assert(spark.read.parquet(s"$eDir/batch_id=3").isEmpty)
    assert(spark.read.parquet(s"$sDir/batch_id=3").isEmpty)
    assert(scoresOf(StreamingGraph.readScores(spark, sDir, Iters)) ===
      scoresOf(GraphOps.pageRank(edgeDf(batches.flatten), "src", "dst", Iters)))
  }

  test("registry compaction through maintainAll: state parity, next batch unaffected") {
    val root = Files.createTempDirectory("graft_pr_cmp").toString
    val (eDir, sDir) = (s"$root/edges", s"$root/scores")
    val step = StreamingGraph.batchStep(spark, eDir, sDir, "src", "dst", Iters) _
    for (b <- 0 to 2) step(edgeDf(batches(b)), b.toLong)
    val before = scoresOf(StreamingGraph.readScores(spark, sDir, Iters))

    // fold below the latest batch (the live-stream frontier shape)
    RegistryMaintenance.maintainAll(spark,
      Seq(RegistryMaintenance.PageRankState(eDir, sDir, Iters)), upToBatchId = 2L)
    assert(scoresOf(StreamingGraph.readScores(spark, sDir, Iters)) === before)
    // folded partitions pruned, base installed
    val parts = new java.io.File(sDir).listFiles().map(_.getName)
      .filter(_.startsWith("batch_id=")).toSet
    assert(parts === Set("batch_id=-1", "batch_id=2"))

    // post-compaction appends still reach exact batch parity
    val extra = Seq((8L, 1L), (4L, 8L), (9L, 9L))
    step(edgeDf(extra), 3L)
    assert(scoresOf(StreamingGraph.readScores(spark, sDir, Iters)) ===
      scoresOf(GraphOps.pageRank(edgeDf(batches.flatten ++ extra),
        "src", "dst", Iters)))
  }

  test("bucketed relayout: appends probe the tables exchange-free/pruned, " +
      "exact parity in both probe modes, replay-stable") {
    val root = Files.createTempDirectory("graft_pr_bkt").toString
    val (eDir, sDir) = (s"$root/edges", s"$root/scores")
    val step0 = StreamingGraph.batchStep(spark, eDir, sDir, "src", "dst", Iters) _
    for (b <- 0 to 1) step0(edgeDf(batches(b)), b.toLong)

    val base = StreamingGraph.compactRegistryBucketed(spark, eDir, sDir,
      Iters, upToBatchId = 2L, tablePath = s"$root/tables",
      tablePrefix = "t_pr_bkt", buckets = 4)

    // the in-edge probe (the dst-direction slice batchStep issues) over
    // the bucketed table with an append-sized key set: a pushed In
    // filter on a bare scan — NO exchange, NO join
    val probe = base.edgesDst.filter(col("dst").isInCollection(Seq(1L, 2L, 4L)))
    val plan = probe.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"in-edge probe shuffled:\n$plan")
    assert(!plan.contains("Join"), s"in-edge probe joined:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("In(dst"),
      s"dst In-filter not pushed to the scan:\n$plan")
    // bucket pruning: the scan reads fewer than all 4 bucket files
    assert(plan.contains("SelectedBucketsCount"),
      s"bucket pruning not applied:\n$plan")

    // appends THROUGH the base reach exact batch parity (literal-probe
    // mode) and replay identically
    val stepB = StreamingGraph.batchStep(spark, eDir, sDir, "src", "dst",
      Iters, base = Some(base)) _
    stepB(edgeDf(batches(2)), 2L)
    assert(scoresOf(StreamingGraph.readScores(spark, sDir, Iters)) ===
      scoresOf(GraphOps.pageRank(edgeDf(batches.flatten), "src", "dst", Iters)))
    val sBefore = rowSet(spark.read.option("basePath", sDir).parquet(sDir))
    stepB(edgeDf(batches(2)), 2L)
    assert(rowSet(spark.read.option("basePath", sDir).parquet(sDir)) === sBefore)

    // semi-join fallback mode (probeLiteralCap = 0) over the same base:
    // identical state
    val stepSemi = StreamingGraph.batchStep(spark, eDir, sDir, "src", "dst",
      Iters, base = Some(base), probeLiteralCap = 0) _
    val extra = Seq((8L, 1L), (4L, 8L), (9L, 9L))
    stepSemi(edgeDf(extra), 3L)
    assert(scoresOf(StreamingGraph.readScores(spark, sDir, Iters)) ===
      scoresOf(GraphOps.pageRank(edgeDf(batches.flatten ++ extra),
        "src", "dst", Iters)))
  }
}
