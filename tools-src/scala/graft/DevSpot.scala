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
        case Array("lpstage", stage) =>
          // g_linkpred kernel breakdown: where do the 12 s at sf0.1 go?
          // Rebuilds the operator's internal frames stage by stage so
          // each boundary can be timed in isolation.
          val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey").as("ok"),
            col("l_partkey"))
          val edges = li.select(col("ok"), col("l_partkey").as("src"))
            .join(li.select(col("ok"), col("l_partkey").as("dst")), "ok")
            .filter(col("src") =!= col("dst"))
          val u = edges.select(least(col("src"), col("dst")).cast("long").as("a"),
              greatest(col("src"), col("dst")).cast("long").as("b"))
            .distinct()
          val adj = u.select(col("a").as("v"), col("b").as("n"))
            .union(u.select(col("b").as("v"), col("a").as("n")))
          val deg = adj.groupBy("v").agg(count(lit(1)).as("dg"))
          val small = adj.join(deg.filter(col("dg") <= 128), Seq("v"))
            .select("v", "n")
          stage match {
            case "u"      => u.count()
            case "adj"    => small.count()
            case "wedges" =>
              small.as("x").join(small.as("y"),
                col("x.v") === col("y.v") && col("x.n") < col("y.n")).count()
            case "agg" =>
              small.as("x").join(small.as("y"),
                  col("x.v") === col("y.v") && col("x.n") < col("y.n"))
                .select((shiftleft(col("x.n"), 32) + col("y.n")).as("p"))
                .groupBy("p").agg(count(lit(1)).as("common"))
                .filter(col("common") >= 2).count()
            case "aggconf" =>
              // same kernel under candidate aggregation configs; spec
              // lpstage:aggconf is preceded by lpconf:* specs that set them
              small.as("x").join(small.as("y"),
                  col("x.v") === col("y.v") && col("x.n") < col("y.n"))
                .select((shiftleft(col("x.n"), 32) + col("y.n")).as("p"))
                .groupBy("p").agg(count(lit(1)).as("common"))
                .filter(col("common") >= 2).count()
            case "aggrepart" =>
              // pre-shuffle the RAW wedge stream on p so the groupBy's
              // distribution is already satisfied: one shuffle, one
              // complete aggregation pass, no 60M-key partial map
              small.as("x").join(small.as("y"),
                  col("x.v") === col("y.v") && col("x.n") < col("y.n"))
                .select((shiftleft(col("x.n"), 32) + col("y.n")).as("p"))
                .repartition(256, col("p"))
                .groupBy("p").agg(count(lit(1)).as("common"))
                .filter(col("common") >= 2).count()
            case "arragg" =>
              // alternate kernel: per-center sorted neighbor array, pairs
              // generated by higher-order functions — kills the wedge
              // self-join shuffle AND feeds partial agg in the same stage
              small.groupBy("v").agg(sort_array(collect_list("n")).as("ns"))
                .select(explode(expr("flatten(transform(ns, (x, i) -> " +
                  "transform(slice(ns, i + 2, size(ns) - i - 1), " +
                  "y -> shiftleft(x, 32) + y)))")).as("p"))
                .groupBy("p").agg(count(lit(1)).as("common"))
                .filter(col("common") >= 2).count()
            case "full" =>
              graft.graph.GraphOps.linkPrediction(edges, "src", "dst",
                maxDeg = 128, k = 50, minCommon = 2, broadcastGraph = true).count()
            case "front" =>
              // the operator's front half: canonical edge set through the
              // checkpoint (what precedes the wedge kernel)
              u.localCheckpoint(false).count()
            case "front2" =>
              // alternate front: per-order sorted item set + in-row pair
              // lambda replaces the lineitem self-join
              li.groupBy("ok")
                .agg(sort_array(collect_set("l_partkey")).as("ps"))
                .select(explode(expr("flatten(transform(ps, (x, i) -> " +
                  "transform(slice(ps, i + 2, size(ps) - i - 1), " +
                  "y -> struct(x AS a, y AS b))))")).as("p"))
                .select(col("p.a").as("a"), col("p.b").as("b"))
                .distinct()
                .localCheckpoint(false).count()
            case "tail" =>
              // post-agg half: anti-join + degree joins + top-k over a
              // synthetic candidate table the size of the real one
              val cand = spark.range(11180214L)
                .select((col("id") % 200000).as("a"), ((col("id") * 7919) % 200000).as("b"),
                  lit(2L).as("common"))
              val dg = spark.range(200000L).select(col("id").as("v"),
                (col("id") % 64 + 64).as("dg"))
              cand.join(broadcast(dg.select(col("v").as("a"), col("dg").as("da"))), Seq("a"))
                .join(broadcast(dg.select(col("v").as("b"), col("dg").as("db"))), Seq("b"))
                .withColumn("jaccard", col("common").cast("double") /
                  (col("da") + col("db") - col("common")).cast("double"))
                .orderBy(col("jaccard").desc, col("a"), col("b")).limit(50).count()
          }
        case Array("lpiso", variant, reps) =>
          // isolate the candidate-count aggregation: materialize the
          // packed wedge stream once (localCheckpoint), then time ONLY
          // the groupBy(p).count >= 2 under each variant, reps times
          val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey").as("ok"),
            col("l_partkey"))
          val edges = li.select(col("ok"), col("l_partkey").as("src"))
            .join(li.select(col("ok"), col("l_partkey").as("dst")), "ok")
            .filter(col("src") =!= col("dst"))
          val u = edges.select(least(col("src"), col("dst")).cast("long").as("a"),
              greatest(col("src"), col("dst")).cast("long").as("b"))
            .distinct()
          val adj = u.select(col("a").as("v"), col("b").as("n"))
            .union(u.select(col("b").as("v"), col("a").as("n")))
          val deg = adj.groupBy("v").agg(count(lit(1)).as("dg"))
          val small = adj.join(deg.filter(col("dg") <= 128), Seq("v"))
            .select("v", "n")
          val wedges = small.as("x").join(small.as("y"),
              col("x.v") === col("y.v") && col("x.n") < col("y.n"))
            .select((shiftleft(col("x.n"), 32) + col("y.n")).as("p"))
            .localCheckpoint()
          var out = 0L
          (1 to reps.toInt).foreach { r =>
            val ti = System.nanoTime()
            out = (variant match {
              case "plain" =>
                wedges.groupBy("p").agg(count(lit(1)).as("common"))
                  .filter(col("common") >= 2)
              case "repart" =>
                wedges.repartition(256, col("p"))
                  .groupBy("p").agg(count(lit(1)).as("common"))
                  .filter(col("common") >= 2)
              case "repart64" =>
                wedges.repartition(64, col("p"))
                  .groupBy("p").agg(count(lit(1)).as("common"))
                  .filter(col("common") >= 2)
            }).count()
            println(f"  lpiso:$variant rep=$r t=${(System.nanoTime() - ti) / 1e9}%.2f")
          }
          out
        case Array("lpk", variant, reps) =>
          // wedge-gen + count kernel A/B over a checkpointed `small`
          // (center-capped adjacency): join vs array pair-gen, partial
          // agg vs pre-repartitioned complete agg
          val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey").as("ok"),
            col("l_partkey"))
          val edges = li.select(col("ok"), col("l_partkey").as("src"))
            .join(li.select(col("ok"), col("l_partkey").as("dst")), "ok")
            .filter(col("src") =!= col("dst"))
          val u = edges.select(least(col("src"), col("dst")).cast("long").as("a"),
              greatest(col("src"), col("dst")).cast("long").as("b"))
            .distinct()
          val adj = u.select(col("a").as("v"), col("b").as("n"))
            .union(u.select(col("b").as("v"), col("a").as("n")))
          val deg = adj.groupBy("v").agg(count(lit(1)).as("dg"))
          val small = adj.join(deg.filter(col("dg") <= 128), Seq("v"))
            .select("v", "n").localCheckpoint()
          def joinPairs = small.as("x").join(small.as("y"),
              col("x.v") === col("y.v") && col("x.n") < col("y.n"))
            .select((shiftleft(col("x.n"), 32) + col("y.n")).as("p"))
          def arrPairs = small.groupBy("v")
            .agg(sort_array(collect_list("n")).as("ns"))
            .select(explode(expr("flatten(transform(ns, (x, i) -> " +
              "transform(slice(ns, i + 2, size(ns) - i - 1), " +
              "y -> shiftleft(x, 32) + y)))")).as("p"))
          def agg(df: org.apache.spark.sql.DataFrame) =
            df.groupBy("p").agg(count(lit(1)).as("common"))
              .filter(col("common") >= 2)
          var out = 0L
          (1 to reps.toInt).foreach { r =>
            val ti = System.nanoTime()
            out = (variant match {
              case "joinplain"   => agg(joinPairs)
              case "joinrepart"  => agg(joinPairs.repartition(64, col("p")))
              case "joinshj" =>
                agg(small.as("x").hint("SHUFFLE_HASH").join(small.as("y"),
                    col("x.v") === col("y.v") && col("x.n") < col("y.n"))
                  .select((shiftleft(col("x.n"), 32) + col("y.n")).as("p"))
                  .repartition(256, col("p")))
              case "joinrep256"  => agg(joinPairs.repartition(256, col("p")))
              case "joinrepaqe"  => agg(joinPairs.repartition(col("p")))
              case "arrplain"    => agg(arrPairs)
              case "arrrepart"   => agg(arrPairs.repartition(64, col("p")))
            }).count()
            println(f"  lpk:$variant rep=$r t=${(System.nanoTime() - ti) / 1e9}%.2f")
          }
          out
        case Array("bpek", k, b) =>
          // batched BPE training depth probe: K merges at batch size b
          // over the documents corpus (the "train a real tokenizer"
          // path; b=1 is the sequential one-job-per-merge baseline)
          graft.text.TextOps.bpeTrain(
            Tables.documents(spark, sfDir), "text", k.toInt, b.toInt).count()
        case Array("princ", m) =>
          // incremental-PageRank scale probe: bootstrap the full
          // order→part bipartite graph as batch 0, then append m
          // synthetic new orders as batch 1 — the realistic append shape
          // (new orders arrive; parts are sinks, so the affected closure
          // is the appended neighborhood). Reports bootstrap, append,
          // and the from-scratch batch recompute for comparison.
          val li = Tables.lineitem(spark, sfDir)
            .select(col("l_orderkey").as("src"), col("l_partkey").as("dst"))
          val root = java.nio.file.Files.createTempDirectory("princ").toString
          sys.addShutdownHook {
            def rm(f: java.io.File): Unit = {
              Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
            }
            rm(new java.io.File(root))
          }
          val step = graft.streaming.StreamingGraph.batchStep(
            spark, s"$root/e", s"$root/s", "src", "dst", 3) _
          val tb0 = System.nanoTime()
          step(li, 0L)
          val tBoot = (System.nanoTime() - tb0) / 1e9
          val append = li.limit(m.toInt * 7)
            .select((col("src") + 10000000000L).as("src"), col("dst"))
          val ta0 = System.nanoTime()
          step(append, 1L)
          val tApp = (System.nanoTime() - ta0) / 1e9
          val append2 = li.limit(m.toInt * 7)
            .select((col("src") + 20000000000L).as("src"), col("dst"))
          val tb1 = System.nanoTime()
          step(append2, 2L)
          val tApp2 = (System.nanoTime() - tb1) / 1e9
          val tf0 = System.nanoTime()
          val full = graft.graph.GraphOps.pageRank(
            li.union(append).union(append2), "src", "dst", 3).count()
          val tFull = (System.nanoTime() - tf0) / 1e9
          println(f"SPOTX princ:$m boot=$tBoot%.2f append=$tApp%.2f " +
            f"append2=$tApp2%.2f fullRerun=$tFull%.2f nodes=$full")
          graft.streaming.StreamingGraph.readScores(spark, s"$root/s", 3).count()
        case Array("assoc", variant, reps) =>
          // a_assoc pair-count kernel A/B over a checkpointed distinct
          // (basket, item) set: self-join + partial agg (r9 shipped) vs
          // self-join + pre-repartitioned agg vs in-row pair-gen +
          // pre-repartitioned complete agg (the linkpred discipline)
          val b = Tables.lineitem(spark, sfDir)
            .select(col("l_orderkey").as("__bk"), col("l_partkey").as("__it"))
            .distinct().localCheckpoint()
          def joinP = b.select(col("__bk"), col("__it").as("item_a"))
            .join(b.select(col("__bk"), col("__it").as("item_b")), Seq("__bk"))
            .filter(col("item_a") =!= col("item_b"))
          def collP = b.groupBy("__bk").agg(collect_set(col("__it")).as("__is"))
            .select(explode(col("__is")).as("item_a"), col("__is"))
            .select(col("item_a"),
              explode(filter(col("__is"), x => x =!= col("item_a"))).as("item_b"))
          def agg2(df: org.apache.spark.sql.DataFrame) =
            df.groupBy("item_a", "item_b").agg(count(lit(1)).as("n_ab"))
              .filter(col("n_ab") >= 2)
          var out = 0L
          (1 to reps.toInt).foreach { r =>
            val ti = System.nanoTime()
            out = (variant match {
              case "joinplain"  => agg2(joinP)
              case "joinrep"    => agg2(joinP.repartition(256, col("item_a"), col("item_b")))
              case "collplain"  => agg2(collP)
              case "collrep"    => agg2(collP.repartition(256, col("item_a"), col("item_b")))
              case "collrep64"  => agg2(collP.repartition(64, col("item_a"), col("item_b")))
            }).count()
            println(f"  assoc:$variant rep=$r t=${(System.nanoTime() - ti) / 1e9}%.2f")
          }
          out
        case Array("assocfull", variant, reps) =>
          // full a_assoc cell A/B (distinct + checkpoint + pair count +
          // joins + top-50), old self-join shape vs shipped in-row shape
          def bDf = Tables.lineitem(spark, sfDir)
            .select(col("l_orderkey").as("__bk"), col("l_partkey").as("__it"))
            .distinct().localCheckpoint(false)
          def cell(pairsOf: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) = {
            val b = bDf
            val nBaskets = b.agg(countDistinct(col("__bk")).as("__n"))
            val itemCounts = b.groupBy(col("__it").as("item")).agg(count(lit(1)).as("n_item"))
            val pairs = pairsOf(b)
              .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_ab"))
              .filter(col("n_ab") >= 2)
            pairs
              .join(itemCounts.select(col("item").as("item_a"), col("n_item").as("n_a")), Seq("item_a"))
              .join(itemCounts.select(col("item").as("item_b"), col("n_item").as("n_b")), Seq("item_b"))
              .crossJoin(broadcast(nBaskets))
              .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
                (col("n_ab").cast("double") / col("__n").cast("double")).as("support"),
                (col("n_ab").cast("double") / col("n_a").cast("double")).as("confidence"),
                ((col("n_ab") * col("__n")).cast("double") /
                  (col("n_a") * col("n_b")).cast("double")).as("lift"))
              .orderBy(col("lift").desc, col("item_a"), col("item_b")).limit(50)
          }
          def joinPairs(b: org.apache.spark.sql.DataFrame) =
            b.select(col("__bk"), col("__it").as("item_a"))
              .join(b.select(col("__bk"), col("__it").as("item_b")), Seq("__bk"))
              .filter(col("item_a") =!= col("item_b"))
          def collPairs(b: org.apache.spark.sql.DataFrame) =
            b.filter(col("__bk").isNotNull)
              .groupBy("__bk").agg(collect_set(col("__it")).as("__is"))
              .select(explode(col("__is")).as("item_a"), col("__is"))
              .select(col("item_a"),
                explode(filter(col("__is"), x => x =!= col("item_a"))).as("item_b"))
              .repartition(256, col("item_a"), col("item_b"))
          // single-shuffle front: collect_set dedupes in-agg, so ONE
          // groupBy(bk) replaces distinct + groupBy; nBaskets/itemCounts
          // derive from the basket-set frame (checkpointed or via
          // AQE exchange reuse)
          def cell2(checkpoint: Boolean, repart: Int) = {
            val ba0 = Tables.lineitem(spark, sfDir)
              .select(col("l_orderkey").as("__bk"), col("l_partkey").as("__it"))
              .groupBy("__bk").agg(collect_set(col("__it")).as("__is"))
            val ba = if (checkpoint) ba0.localCheckpoint(false) else ba0
            val nBaskets = ba.agg(count(col("__bk")).as("__n"))
            val itemCounts = ba.select(explode(col("__is")).as("item"))
              .groupBy("item").agg(count(lit(1)).as("n_item"))
            val praw = ba.filter(col("__bk").isNotNull)
              .select(explode(col("__is")).as("item_a"), col("__is"))
              .select(col("item_a"),
                explode(filter(col("__is"), x => x =!= col("item_a"))).as("item_b"))
            val pairs = (if (repart > 0) praw.repartition(repart, col("item_a"), col("item_b")) else praw)
              .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_ab"))
              .filter(col("n_ab") >= 2)
            pairs
              .join(itemCounts.select(col("item").as("item_a"), col("n_item").as("n_a")), Seq("item_a"))
              .join(itemCounts.select(col("item").as("item_b"), col("n_item").as("n_b")), Seq("item_b"))
              .crossJoin(broadcast(nBaskets))
              .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
                (col("n_ab").cast("double") / col("__n").cast("double")).as("support"),
                (col("n_ab").cast("double") / col("n_a").cast("double")).as("confidence"),
                ((col("n_ab") * col("__n")).cast("double") /
                  (col("n_a") * col("n_b")).cast("double")).as("lift"))
              .orderBy(col("lift").desc, col("item_a"), col("item_b")).limit(50)
          }
          var out = 0L
          (1 to reps.toInt).foreach { r =>
            val ti = System.nanoTime()
            out = (variant match {
              case "join"    => cell(joinPairs)
              case "coll"    => cell(collPairs)
              case "one"     => cell2(checkpoint = true, repart = 256)
              case "onenock" => cell2(checkpoint = false, repart = 256)
              case "onenorp" => cell2(checkpoint = false, repart = 0)
              case "onenoaqe" =>
                // count inside the arm: AQE flag is read when the
                // QueryExecution is created, i.e. at action time
                spark.conf.set("spark.sql.adaptive.enabled", "false")
                try { val c = cell2(checkpoint = false, repart = 0).count()
                  spark.range(c).filter(lit(false)) }
                finally spark.conf.set("spark.sql.adaptive.enabled", "true")
            }).count()
            println(f"  assocfull:$variant rep=$r t=${(System.nanoTime() - ti) / 1e9}%.2f")
          }
          out
        case Array("assocplan", reps) =>
          // split driver planning (analyze+optimize+physical) from
          // execution for the single-query assoc cell
          var out = 0L
          (1 to reps.toInt).foreach { r =>
            val li = Tables.lineitem(spark, sfDir)
              .select(col("l_orderkey").as("__bk"), col("l_partkey").as("__it"))
            val ba = li.groupBy("__bk").agg(collect_set(col("__it")).as("__is"))
            val nBaskets = ba.agg(count(col("__bk")).as("__n"))
            val itemCounts = ba.select(explode(col("__is")).as("item"))
              .groupBy("item").agg(count(lit(1)).as("n_item"))
            val pairs = ba.filter(col("__bk").isNotNull)
              .select(explode(col("__is")).as("item_a"), col("__is"))
              .select(col("item_a"),
                explode(filter(col("__is"), x => x =!= col("item_a"))).as("item_b"))
              .repartition(256, col("item_a"), col("item_b"))
              .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_ab"))
              .filter(col("n_ab") >= 2)
            val fin = pairs
              .join(itemCounts.select(col("item").as("item_a"), col("n_item").as("n_a")), Seq("item_a"))
              .join(itemCounts.select(col("item").as("item_b"), col("n_item").as("n_b")), Seq("item_b"))
              .crossJoin(broadcast(nBaskets))
              .select(col("item_a"), col("item_b"), col("n_ab"),
                (col("n_ab").cast("double") / col("__n").cast("double")).as("support"))
              .orderBy(col("support").desc, col("item_a"), col("item_b")).limit(50)
            val tp0 = System.nanoTime()
            val _ = fin.queryExecution.executedPlan
            val tPlan = (System.nanoTime() - tp0) / 1e9
            val te0 = System.nanoTime()
            out = fin.count()
            val tExec = (System.nanoTime() - te0) / 1e9
            println(f"  assocplan rep=$r plan=$tPlan%.2f exec=$tExec%.2f")
          }
          out
        case Array("assocprof", reps) =>
          // stage-level decomposition of the a_assoc cell
          def t[A](tag: String)(f: => A): A = {
            val ti = System.nanoTime(); val a = f
            println(f"  assocprof $tag t=${(System.nanoTime() - ti) / 1e9}%.2f"); a
          }
          var out = 0L
          (1 to reps.toInt).foreach { r =>
            println(s"  --- rep $r")
            val li = Tables.lineitem(spark, sfDir)
              .select(col("l_orderkey").as("__bk"), col("l_partkey").as("__it"))
            t("scan")(li.count())
            val ba = li.groupBy("__bk").agg(collect_set(col("__it")).as("__is"))
              .localCheckpoint()
            t("ba_build")(ba.count())
            val nB = t("nbaskets")(ba.agg(count(col("__bk"))).collect()(0).getLong(0))
            val ic = ba.select(explode(col("__is")).as("item"))
              .groupBy("item").agg(count(lit(1)).as("n_item")).localCheckpoint()
            t("itemcounts")(ic.count())
            val praw = ba.filter(col("__bk").isNotNull)
              .select(explode(col("__is")).as("item_a"), col("__is"))
              .select(col("item_a"),
                explode(filter(col("__is"), x => x =!= col("item_a"))).as("item_b"))
            t("pairgen_only")(praw.count())
            val pairs = praw.repartition(256, col("item_a"), col("item_b"))
              .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_ab"))
              .filter(col("n_ab") >= 2).localCheckpoint()
            t("pair_agg")(pairs.count())
            val fin = pairs
              .join(ic.select(col("item").as("item_a"), col("n_item").as("n_a")), Seq("item_a"))
              .join(ic.select(col("item").as("item_b"), col("n_item").as("n_b")), Seq("item_b"))
              .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
                (col("n_ab").cast("double") / lit(nB).cast("double")).as("support"),
                (col("n_ab").cast("double") / col("n_a").cast("double")).as("confidence"),
                ((col("n_ab") * lit(nB)).cast("double") /
                  (col("n_a") * col("n_b")).cast("double")).as("lift"))
              .orderBy(col("lift").desc, col("item_a"), col("item_b")).limit(50)
            out = t("tail")(fin.count())
          }
          out
        case Array("mult") =>
          // r9 verdict #2: key-multiplicity census of every pair-keyed
          // aggregation — mean multiplicity = rows_in / distinct keys;
          // below ~2 the partial aggregate does full hash-map work for
          // ~zero reduction (the linkpred/a_assoc pathology)
          import graft.dedup.Dedup
          def census(tag: String, rowsIn: => Long, keys: => Long): Unit = {
            val r = rowsIn; val k = keys
            println(f"  MULT $tag rows_in=$r keys=$k mult=${r.toDouble / k}%.2f")
          }
          val docs = Tables.documents(spark, sfDir)
          val dt = Dedup.docTokens(docs, "doc_id", "text", Seq("lang", "source"), 1)
            .localCheckpoint()
          val jk = Seq("tok", "lang", "source").map(k => col(s"a.$k") === col(s"b.$k"))
            .reduce(_ && _) && col("a.doc_id") < col("b.doc_id")
          def jj = dt.as("a").join(dt.as("b"), jk)
            .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          census("djaccard_pairagg", jj.count(),
            jj.distinct().count())
          census("tok_df", dt.count(),
            dt.select("tok", "lang", "source").distinct().count())
          val st = Dedup.docTokens(docs, "source", "text", Nil, 3).localCheckpoint()
          def sj = st.as("a").join(st.as("b"), col("a.tok") === col("b.tok")
              && col("a.source") < col("b.source"))
            .select(col("a.source").as("sa"), col("b.source").as("sb"))
          census("contam_matrix_pairagg", sj.count(), sj.distinct().count())
          census("novelty_first", st.count(), st.select("tok").distinct().count())
          val ev = Tables.events(spark, sfDir)
          val clicks = ev.filter(col("event_type") === "click")
            .select(col("user_id"), col("ts"))
          val purchases = ev.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
            .withColumn("w_start", expr("cast(p_ts as timestamp) - INTERVAL 24 HOURS"))
          val rj = graft.ops.Relational.rangeJoin(clicks, purchases, "user_id",
            "ts", "w_start", "p_ts", bucketSeconds = 86400).localCheckpoint()
          census("w10_touches_per_purchase", rj.count(),
            rj.select("p_id").distinct().count())
          0L
        case Array("princb", m) =>
          // bucketed-registry append probe: bootstrap, compact into the
          // bucketed relayout, then run the same two appends as `princ`
          // THROUGH the GraphBase — the deployment steady state
          val li = Tables.lineitem(spark, sfDir)
            .select(col("l_orderkey").as("src"), col("l_partkey").as("dst"))
          val root = java.nio.file.Files.createTempDirectory("princb").toString
          sys.addShutdownHook {
            def rm(f: java.io.File): Unit = {
              Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
            }
            rm(new java.io.File(root))
          }
          val step0 = graft.streaming.StreamingGraph.batchStep(
            spark, s"$root/e", s"$root/s", "src", "dst", 3) _
          val tb0 = System.nanoTime()
          step0(li, 0L)
          val tBoot = (System.nanoTime() - tb0) / 1e9
          val tc0 = System.nanoTime()
          val base = graft.streaming.StreamingGraph.compactRegistryBucketed(
            spark, s"$root/e", s"$root/s", 3, upToBatchId = 1L,
            tablePath = s"$root/t", tablePrefix = "princb", buckets = 32)
          val tCmp = (System.nanoTime() - tc0) / 1e9
          val stepB = graft.streaming.StreamingGraph.batchStep(
            spark, s"$root/e", s"$root/s", "src", "dst", 3,
            base = Some(base)) _
          val append = li.limit(m.toInt * 7)
            .select((col("src") + 10000000000L).as("src"), col("dst"))
          val ta0 = System.nanoTime()
          stepB(append, 1L)
          val tApp = (System.nanoTime() - ta0) / 1e9
          val append2 = li.limit(m.toInt * 7)
            .select((col("src") + 20000000000L).as("src"), col("dst"))
          val tb1 = System.nanoTime()
          stepB(append2, 2L)
          val tApp2 = (System.nanoTime() - tb1) / 1e9
          val tf0 = System.nanoTime()
          val full = graft.graph.GraphOps.pageRank(
            li.union(append).union(append2), "src", "dst", 3).count()
          val tFull = (System.nanoTime() - tf0) / 1e9
          println(f"SPOTX princb:$m boot=$tBoot%.2f compact=$tCmp%.2f " +
            f"append=$tApp%.2f append2=$tApp2%.2f fullRerun=$tFull%.2f nodes=$full")
          graft.streaming.StreamingGraph.readScores(spark, s"$root/s", 3).count()
        case Array("q21k", variant, reps) =>
          // q21 exchange-sharing A/B: two stacked aggregates as shipped
          // (exchange per grain) vs ONE repartition(l_orderkey) feeding
          // perSupp, perOrder, and the join (hash(ok) satisfies the
          // (ok, sk) clustering, so no further exchange is required)
          def shipped = Tables.lineitem(spark, sfDir)
            .withColumn("l_commitdate", expr("timestampadd(DAY, " +
              "cast((l_orderkey * 31 + l_linenumber * 7) % 61 - 30 as int), l_shipdate)"))
            .withColumn("l_receiptdate", expr("timestampadd(DAY, " +
              "cast((l_orderkey * 17 + l_linenumber * 11) % 30 + 1 as int), l_shipdate)"))
            .select(col("l_orderkey"), col("l_suppkey"),
              (col("l_receiptdate") > col("l_commitdate")).as("__late"))
          def cell(lines: org.apache.spark.sql.DataFrame) = {
            val perSupp = lines
              .groupBy("l_orderkey", "l_suppkey")
              .agg(sum(when(col("__late"), 1L).otherwise(0L)).as("n_late_lines"))
            val perOrder = perSupp.groupBy("l_orderkey")
              .agg(count(lit(1)).as("n_supp"),
                sum(when(col("n_late_lines") > 0, 1L).otherwise(0L)).as("n_late_supp"))
            val natSupp = Tables.supplier(spark, sfDir)
              .join(broadcast(Tables.nation(spark, sfDir)
                  .filter(col("n_name") === "NATION_3").select("n_nationkey")),
                col("s_nationkey") === col("n_nationkey"))
              .select("s_suppkey", "s_name")
            perSupp.filter(col("n_late_lines") > 0)
              .join(perOrder.filter(col("n_supp") >= 2 && col("n_late_supp") === 1),
                Seq("l_orderkey"))
              .join(Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F")
                  .select("o_orderkey"),
                col("l_orderkey") === col("o_orderkey"), "left_semi")
              .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
              .groupBy("s_name")
              .agg(sum("n_late_lines").as("numwait"))
              .orderBy(col("numwait").desc, col("s_name")).limit(100)
          }
          var out = 0L
          (1 to reps.toInt).foreach { r =>
            val ti = System.nanoTime()
            out = (variant match {
              case "two" => cell(shipped)
              case "one" => cell(shipped.repartition(col("l_orderkey")))
              case "one256" => cell(shipped.repartition(256, col("l_orderkey")))
            }).count()
            println(f"  q21k:$variant rep=$r t=${(System.nanoTime() - ti) / 1e9}%.2f")
          }
          out
        case Array("ccinc", m, variant) =>
          // incremental-CC scale probe: bootstrap the order→part
          // bipartite graph as batch 0 (labels = min reachable id), then
          // append m new orders (batch 1: new order nodes attach to
          // existing parts — component merges via the label-level graph)
          // and m more wired to LOW part ids (batch 2: forces relabels).
          // variant: plain (dir probes) | bucketed (compacted relayout)
          val li = Tables.lineitem(spark, sfDir)
            .select(col("l_orderkey").as("src"), col("l_partkey").as("dst"))
          val root = java.nio.file.Files.createTempDirectory("ccinc").toString
          sys.addShutdownHook {
            def rm(f: java.io.File): Unit = {
              Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
            }
            rm(new java.io.File(root))
          }
          val step0 = graft.streaming.StreamingCc.batchStep(
            spark, s"$root/e", s"$root/l", "src", "dst") _
          val tb0 = System.nanoTime()
          step0(li, 0L)
          val tBoot = (System.nanoTime() - tb0) / 1e9
          var tCmp = 0.0
          val step = variant match {
            case "plain" => step0
            case "bucketed" =>
              val tc0 = System.nanoTime()
              val base = graft.streaming.StreamingCc.compactRegistryBucketed(
                spark, s"$root/e", s"$root/l", upToBatchId = 1L,
                tablePath = s"$root/t", tablePrefix = "ccinc", buckets = 32)
              tCmp = (System.nanoTime() - tc0) / 1e9
              graft.streaming.StreamingCc.batchStep(
                spark, s"$root/e", s"$root/l", "src", "dst",
                base = Some(base)) _
          }
          val append = li.limit(m.toInt * 7)
            .select((col("src") + 10000000000L).as("src"), col("dst"))
          val ta0 = System.nanoTime()
          step(append, 1L)
          val tApp = (System.nanoTime() - ta0) / 1e9
          val append2 = li.limit(m.toInt * 7)
            .select((col("src") + 20000000000L).as("src"), (col("dst") % 50).as("dst"))
          val tb1 = System.nanoTime()
          step(append2, 2L)
          val tApp2 = (System.nanoTime() - tb1) / 1e9
          val unionE = li.union(append).union(append2)
          val tf0 = System.nanoTime()
          val full = graft.dedup.Dedup.clusters(
            unionE.select(col("src").as("id"))
              .union(unionE.select(col("dst").as("id"))).distinct(),
            unionE, "id", aCol = "src", bCol = "dst").count()
          val tFull = (System.nanoTime() - tf0) / 1e9
          println(f"SPOTX ccinc:$m:$variant boot=$tBoot%.2f compact=$tCmp%.2f " +
            f"append=$tApp%.2f append2=$tApp2%.2f fullRerun=$tFull%.2f nodes=$full")
          graft.streaming.StreamingCc.readLabels(spark, s"$root/l").count()
        case Array("locprobe", kStr, repsStr) =>
          // ProbeSlice deployment-premise A/B (r10 verdict #7): the r10
          // adjudication showed uniformly-DISPERSED probe ids cannot
          // prune a bucketed+sorted registry — the id-set hash touches
          // every bucket, and uniform ids straddle every sorted row
          // group, so the whole log is read either way. The relayout's
          // deployment premise is a LOCALIZED append: recent key ranges
          // / clustered entity ids. This probe measures that premise
          // directly: same registry, same IN-set size k, ids drawn
          // either uniformly across the key domain (disp) or as the
          // most recent contiguous range (loc), against (a) a plain
          // parquet log with no layout discipline (repartitioned write
          // = arrival order destroyed, the worst honest baseline) and
          // (b) the bucketed+SORTED relayout. Spark pushes a >10-value
          // IN down to parquet as a [min,max] range predicate, so the
          // sorted layout prunes row groups exactly when the probe is
          // range-local — the thing this A/B exists to show.
          val k = kStr.toInt
          val log = Tables.lineitem(spark, sfDir)
            .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
          val root = java.nio.file.Files.createTempDirectory("locprobe").toString
          sys.addShutdownHook {
            def rm(f: java.io.File): Unit = {
              Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
            }
            rm(new java.io.File(root))
          }
          log.repartition(64).write.mode("overwrite").parquet(s"$root/plain")
          val plain = spark.read.parquet(s"$root/plain")
          val bucketed = graft.ops.Relational.materializeBucketed(
            log, s"$root/btab", "locprobe_reg", Seq("l_orderkey"), 32,
            onePerBucket = true)
          val maxKey = log.agg(max("l_orderkey")).head().getLong(0)
          val keysLoc = ((maxKey - k + 1) to maxKey).toSeq
          val stride = math.max(1L, maxKey / k)
          val keysDisp = (0 until k).map(i => i.toLong * stride + 1L)
          // wall time at this log size is stage-latency floor; the
          // claim under test is BYTES/RECORDS READ, captured from task
          // input metrics (row-group pruning shows up here directly)
          val bytesRead = new java.util.concurrent.atomic.AtomicLong
          val recsRead = new java.util.concurrent.atomic.AtomicLong
          val listener = new org.apache.spark.scheduler.SparkListener {
            override def onTaskEnd(
                te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
              if (te.taskMetrics != null) {
                bytesRead.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
                recsRead.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
                ()
              }
            }
          }
          spark.sparkContext.addSparkListener(listener)
          def probe(df: org.apache.spark.sql.DataFrame, keys: Seq[Long]): Long =
            df.filter(col("l_orderkey").isInCollection(keys))
              .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("n"))
              .count()
          var out = 0L
          (1 to repsStr.toInt).foreach { r =>
            Seq(("plain", plain, "loc", keysLoc), ("plain", plain, "disp", keysDisp),
              ("bucketed", bucketed, "loc", keysLoc),
              ("bucketed", bucketed, "disp", keysDisp)).foreach {
              case (layout, df, shape, keys) =>
                bytesRead.set(0L); recsRead.set(0L)
                val ti = System.nanoTime()
                out = probe(df, keys)
                Thread.sleep(300) // listener-bus drain (private API in 4.x)
                println(f"  locprobe:$layout:$shape k=$k rep=$r " +
                  f"t=${(System.nanoTime() - ti) / 1e9}%.3f " +
                  f"mb=${bytesRead.get / 1e6}%.1f recs=${recsRead.get}")
            }
          }
          spark.sparkContext.removeSparkListener(listener)
          out
        case Array("q", name) =>
          // run one SparkEntry query under whatever confs were set by
          // earlier lpconf specs — the conf-sensitivity A/B harness
          SparkEntry.queries(name)(spark, sfDir).count()
        case Array("lpconf", key, value) =>
          // set a session conf for subsequent lpstage probes; returns 0
          val full = key match {
            case "cap"    => "spark.sql.codegen.aggregate.fastHashMap.capacityBit"
            case "vec"    => "spark.sql.codegen.aggregate.map.vectorized.enable"
            case "coal"   => "spark.sql.adaptive.coalescePartitions.enabled"
            case "twolvl" => "spark.sql.codegen.aggregate.map.twolevel.enabled"
            case "adv"    => "spark.sql.adaptive.advisoryPartitionSizeInBytes"
            case k        => k
          }
          spark.conf.set(full, value)
          0L
        case other => sys.error(s"unknown spec ${other.mkString(":")}")
      }
      println(f"SPOT $spec rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
