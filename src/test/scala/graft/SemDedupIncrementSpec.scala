package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.sim.Similarity

/** Incremental SemDeDup: new installments are gated against the frozen
  * centroids + kept representatives only — no rebuild, no rescan of past
  * non-representatives, history immutable.
  */
class SemDedupIncrementSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir).cache()

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long, Boolean)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3))).toSet

  test("two-installment increment equals the batch pipeline under the same index") {
    val a = emb.filter(col("vec_id") < 250)
    val b = emb.filter(col("vec_id") >= 250)
    val (s0, audit0) = Similarity.semDedupInit(a, 64, nCentroids = 8)
    val (s1, audit1) = Similarity.semDedupIncrement(s0, b, 64)
    val batch = Similarity.semDedupWithCents(emb, s0.centroids, 64)
    assert(rows(audit0) ++ rows(audit1) === rows(batch))
    // state bookkeeping: reps are exactly the kept ids, vectors attached
    val keptIds = (rows(audit0) ++ rows(audit1)).filter(_._4).map(_._1)
    assert(s1.reps.select("vec_id").collect().map(_.getLong(0)).toSet === keptIds)
  }

  test("three installments: first-writer-wins keeps a bounded superset of batch") {
    // with more installments, bridge chains appear on this fixture (a
    // later doc near-dup of TWO already-kept reps): batch merges both
    // groups under the smaller rep, the increment suppresses only the
    // bridge and keeps both reps — the documented rep-probe trade. Two
    // invariants hold regardless: (1) MONOTONICITY — the increment only
    // ever sees a SUBSET of batch's edges (reps, not all members), so
    // anything it suppresses, batch suppresses too: incremental kept is
    // a superset of batch kept; (2) the excess is only bridge-group
    // reps, a small fraction at any real duplicate density.
    val parts = Seq(
      emb.filter(col("vec_id") < 150),
      emb.filter(col("vec_id") >= 150 && col("vec_id") < 350),
      emb.filter(col("vec_id") >= 350))
    val (s0, a0) = Similarity.semDedupInit(parts.head, 64, nCentroids = 8)
    val (audit, _) = parts.tail.foldLeft((rows(a0), s0)) {
      case ((acc, st), part) =>
        val (st2, inc) = Similarity.semDedupIncrement(st, part, 64)
        (acc ++ rows(inc), st2)
    }
    val batch = rows(Similarity.semDedupWithCents(emb, s0.centroids, 64))
    val incKept = audit.filter(_._4).map(_._1)
    val batchKept = batch.filter(_._4).map(_._1)
    assert(batchKept.subsetOf(incKept),
      s"increment suppressed rows batch kept: ${(batchKept -- incKept).take(5)}")
    val excess = (incKept -- batchKept).size.toDouble / batchKept.size
    assert(excess <= 0.05, s"bridge-rep excess $excess")
  }

  test("incremental kept set agrees with semDedupAuto trained on the union") {
    // the auto policy retrains centroids on the union, so bucket ids may
    // differ — the decision that matters is WHICH documents survive
    val a = emb.filter(col("vec_id") < 250)
    val b = emb.filter(col("vec_id") >= 250)
    // k matched to the union's auto policy (ceil(500/63) = 8), but the
    // centroids trained on installment A only — the frozen-index reality
    val (s0, audit0) = Similarity.semDedupInit(a, 64, nCentroids = 8)
    val (_, audit1) = Similarity.semDedupIncrement(s0, b, 64)
    val incKept = (rows(audit0) ++ rows(audit1)).filter(_._4).map(_._1)
    val autoKept = Similarity.semDedupAuto(emb, 64, targetBucket = 63)
      .filter(col("kept")).select("vec_id").collect().map(_.getLong(0)).toSet
    val agree = (incKept & autoKept).size.toDouble / autoKept.size
    assert(agree >= 0.9, s"agreement $agree (inc=${incKept.size}, auto=${autoKept.size})")
  }

  test("increment plan: bucket equi-joins only, never a cartesian product") {
    val a = emb.filter(col("vec_id") < 250)
    val b = emb.filter(col("vec_id") >= 250)
    val (s0, _) = Similarity.semDedupInit(a, 64, nCentroids = 8)
    val (_, audit) = Similarity.semDedupIncrement(s0, b, 64)
    val p = audit.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"semDedupIncrement degenerated to a cross join:\n$p")
  }
}
