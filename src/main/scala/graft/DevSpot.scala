package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.sim.Similarity

/** Dev utility: parameter sweeps of the index-shaped ANN / semantic-dedup
  * operators at the scale fixtures. The SparkEntry entries pin ONE
  * parameterization (the oracle-gated one); the scale story in
  * BENCH_SCALE.md needs the lever positions too — probe fraction for
  * IVF-PQ, target bucket for the SemDeDup auto-k policy.
  *
  * {{{ sbt "runMain graft.DevSpot bench-data/sf10x ivfpq:8:3 ivfpq:32:3 pq semauto:2048 semk:32" }}}
  */
object DevSpot {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = GraftSession.local(32, "graft-devspot")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def emb = Tables.embeddings(spark, sfDir)
    args.drop(1).foreach { spec =>
      val t0 = System.nanoTime()
      val n = spec.split(":") match {
        case Array("ivfpq", nc, np) =>
          Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 5), 10, 64,
            nCentroids = nc.toInt, nProbe = np.toInt).count()
        case Array("pq") =>
          Similarity.pqTopK(emb, emb.filter(col("vec_id") < 5), 10, 64).count()
        case Array("ivf", nc, np) =>
          Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5), 10, 64,
            nCentroids = nc.toInt, nProbe = np.toInt).count()
        case Array("semauto", b) =>
          Similarity.semDedupAuto(emb, 64, targetBucket = b.toInt).count()
        case Array("semk", k) =>
          Similarity.semDedup(emb, 64, nCentroids = k.toInt).count()
        case Array("ivfpqsplit", nc, np, rest @ _*) =>
          // deployment shape: build+persist the index once, then time the
          // query batch alone (what repeats at 100 TB); optional 4th
          // field = trainMod for sample-trained build
          val tm = rest.headOption.map(_.toLong).getOrElse(1L)
          val tb0 = System.nanoTime()
          val corpus = emb
          val model = Similarity.ivfPqIndex(corpus, 64, nCentroids = nc.toInt,
            trainMod = tm)
          model.index.persist()
          val nIdx = model.index.count()
          val tb = (System.nanoTime() - tb0) / 1e9
          val tq0 = System.nanoTime()
          val nq = Similarity.ivfPqQuery(model, corpus, emb.filter(col("vec_id") < 5),
            10, 64, nProbe = np.toInt).count()
          val tq = (System.nanoTime() - tq0) / 1e9
          println(f"SPOTX ivfpqsplit:$nc:$np index_rows=$nIdx build=$tb%.2f query=$tq%.2f")
          model.index.unpersist()
          nq
        case Array("pqtrain") =>
          Similarity.collectCodebooks(Similarity.pqCodebooks(emb, 64, 8, 16)).length.toLong
        case Array("pqtrain", tm) =>
          Similarity.collectCodebooks(
            Similarity.pqCodebooks(emb, 64, 8, 16, trainMod = tm.toLong)).length.toLong
        case Array("ivftrain", nc) =>
          Similarity.collectCentroids(Similarity.ivfCentroids(emb, 64, nc.toInt, 1)).length.toLong
        case Array("pqencode") =>
          // index-build probe: train + encode (the agg consumes the code
          // column — count() would prune the projection away entirely)
          val model = Similarity.ivfPqIndex(emb, 64)
          model.index.agg(sum(element_at(col("__pos"), 1)))
            .collect()(0).getLong(0)
        case Array("bandfact") =>
          // fact-scale probe for bandJoin: o_band_join's SparkEntry form
          // reads fixed dims (flat at 100× by fixture design), so the
          // honest scale point is the same operator over the events fact
          // table — purchases vs clicks banded within a user, ±1 unit of
          // quantized value. Fan-out is bounded per user.
          val ev = Tables.events(spark, sfDir)
            .select(col("user_id"), col("event_type"),
              expr("cast(floor(value * 100) as bigint)").as("cents"))
          val l = ev.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("cents").as("l_cents"))
          val r = ev.filter(col("event_type") === "click")
            .select(col("user_id"), col("cents").as("r_cents"))
          graft.ops.Relational.bandJoin(l, r, "user_id",
            "l_cents", "r_cents", eps = 100L).count()
        case Array("cdcfact") =>
          // fact-scale probe for snapshotDiff: j_cdc's form diffs the
          // fixed customer dim; here the same operator diffs two derived
          // versions of the events fact (drop ~1%, relabel ~8%) — one
          // full-outer key join at fact cardinality.
          val v1 = Tables.events(spark, sfDir)
            .select(col("event_id"), col("event_type"), col("value"))
          val v2 = v1.filter(col("event_id") % 97 =!= 0)
            .withColumn("event_type",
              when(col("event_id") % 13 === 0, lit("MOVED"))
                .otherwise(col("event_type")))
          graft.ops.Relational.snapshotDiff(v1, v2, Seq("event_id"),
            Seq("event_type", "value")).count()
        case Array("phashvol", r) =>
          // pair volume + bucket skew of the hamming band join at a
          // given radius — the m_phash_cluster plan diagnosis
          val media = graft.multimodal.Multimodal.aHash(
            graft.multimodal.Multimodal.fromDocuments(Tables.documents(spark, sfDir)))
          println("  media=" + media.count())
          graft.dedup.Dedup.hammingPairs(media, "media_id", "ahash",
            r.toInt, 64).count()
        case Array("phashreps", r) =>
          // the collapsed generator: distinct hashes only
          val media = graft.multimodal.Multimodal.aHash(
            graft.multimodal.Multimodal.fromDocuments(Tables.documents(spark, sfDir)))
          val reps = media.groupBy(col("ahash"))
            .agg(min(col("media_id")).as("media_id"))
          println("  distinct_hashes=" + reps.count())
          graft.dedup.Dedup.hammingPairs(reps, "media_id", "ahash",
            r.toInt, 64).count()
        case other => sys.error(s"unknown spec ${other.mkString(":")}")
      }
      println(f"SPOT $spec rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
