package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.graph.GraphOps.PrScale

/** INCREMENTAL PageRank maintenance over edge appends — the graph
  * family's rung on the registry discipline every other stateful family
  * (dedup, ER, sketches, sessions, attribution, drift) already has.
  *
  * State is two `batch_id=*`-partitioned parquet registries:
  *
  *   - `edgesDir`: each batch's PREVIOUSLY-UNSEEN edges (src, dst) —
  *     unique across batches by construction (every batch anti-joins the
  *     prior log), so the accumulated union IS the distinct edge set the
  *     batch operator would dedupe to.
  *   - `scoresDir`: rows (id, outdeg, s1..sK) for every node whose
  *     outdeg or any per-iteration score changed in that batch; the read
  *     discipline is LATEST BATCH WINS per id.
  *
  * Why per-iteration scores (s1..sK) and not just the final one: the
  * batch operator is FIXED-ITERATION PageRank, so node v's round-i score
  * is a function of its in-neighbors' round-(i−1) scores. An appended
  * edge (u, w) changes u's outdeg — every contribution u sends, at every
  * round — so exactly the nodes within K out-hops of {changed-outdeg
  * sources ∪ brand-new nodes} can move. Recomputing THOSE rounds needs
  * the round-(i−1) scores of their unaffected in-neighbors, which only
  * exist if the registry kept them. K extra BIGINT columns per node buy
  * an affected-neighborhood recompute instead of a full-graph rerun.
  *
  * Exactness (spec-pinned parity with [[graft.graph.GraphOps.pageRank]]
  * on the accumulated union after EVERY batch): the affected set A is
  * the K-hop out-closure of the seeds, a superset of every node whose
  * round-i score can differ; recomputing a node that did not actually
  * move reproduces its stored value (its inputs are all correct by
  * induction), so over-approximation costs work, never correctness.
  * Scores of nodes outside A are untouched and their registry rows are
  * not rewritten — the batch's write volume is O(|affected
  * neighborhood|), not O(|V|).
  *
  * Replay safety (the library-wide exactly-once discipline): both writes
  * are per-batch-partition OVERWRITEs and every read excludes the
  * current batch id, so a replayed batch recomputes from the identical
  * prior state and rewrites both partitions identically.
  *
  * 100 TB shape: per batch, the K-hop frontier expansion and the K
  * recompute supersteps are equi-joins keyed by node id over the
  * accumulated edge log (bucket it by dst to make the in-edge probe
  * exchange-free); the recompute joins touch only in-edges OF AFFECTED
  * NODES (a semi-join slice of the log), so batch cost scales with the
  * disturbed neighborhood — the whole point of the incremental form.
  * Registry growth is one row per CHANGED node per batch; fold it back
  * to one row per node with [[compactRegistry]] (wired into
  * [[RegistryMaintenance.maintainAll]]).
  */
object StreamingGraph {

  private def scoreCols(iters: Int): Seq[String] = (1 to iters).map(i => s"s$i")

  /** The bucketed deployment relayout of a compacted registry pair
    * ([[compactRegistryBucketed]]): the edge base as TWO bucketed+sorted
    * tables (one per probe direction) and the score base bucketed by id.
    * Passing it to [[batchStep]] redirects the append path's log/registry
    * PROBES to these tables — the batch-partition dirs stay the source
    * of truth for writes, replay, and [[readScores]]; the tables are a
    * read-optimized copy of the `batch_id=-1` base, so probes prune
    * bucket files and sorted row groups instead of re-scanning the full
    * log once per probe (the measured ~4-scan append floor). */
  final case class GraphBase(edgesSrc: DataFrame, edgesDst: DataFrame,
      scores: DataFrame, iters: Int)

  /** All batches of the edge log ((src, dst, batch_id); empty frame with
    * the right columns when nothing has been written yet). */
  def readEdges(spark: SparkSession, dir: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path) && fs.listStatus(path).nonEmpty)
      spark.read.option("basePath", dir).parquet(dir)
    else
      spark.range(0).select(lit(0L).as("src"), lit(0L).as("dst"),
        lit(0L).as("batch_id")).limit(0)
  }

  private def readScoresRaw(spark: SparkSession, dir: String,
      iters: Int): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path) && fs.listStatus(path).nonEmpty)
      spark.read.option("basePath", dir).parquet(dir)
    else {
      val base = spark.range(0)
        .select(lit(0L).as("id"), lit(0L).as("outdeg"))
      scoreCols(iters).foldLeft(base)((df, c) => df.withColumn(c, lit(0L)))
        .withColumn("batch_id", lit(0L)).limit(0)
    }
  }

  /** Latest registry row per node (the maintained state): (id, outdeg,
    * s1..sK, score) with `score` = the final iteration's value — the
    * exact (id, outdeg, score) frame the batch operator returns. */
  def readScores(spark: SparkSession, dir: String, iters: Int): DataFrame =
    latestPerId(readScoresRaw(spark, dir, iters), iters)
      .withColumn("score", col(s"s$iters"))

  private def latestPerId(rows: DataFrame, iters: Int): DataFrame = {
    val payload = Seq("outdeg") ++ scoreCols(iters)
    rows.groupBy("id")
      .agg(max(struct((col("batch_id") +: payload.map(col)): _*)).as("__m"))
      .select(col("id") +: payload.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** One idempotent micro-batch step (also the unit the spec drives):
    * log the batch's new edges, expand the affected K-hop out-closure,
    * recompute its per-iteration scores against the patched registry,
    * and overwrite this batch's edge + score partitions. */
  def batchStep(spark: SparkSession, edgesDir: String, scoresDir: String,
      srcCol: String, dstCol: String, iters: Int,
      broadcastAffected: Boolean = true, base: Option[GraphBase] = None,
      probeLiteralCap: Int = 100000)(
      batch: DataFrame, batchId: Long): Unit = {
    require(iters >= 1 && iters <= 10, s"iters must be in [1,10], got $iters")
    base.foreach(gb => require(gb.iters == iters,
      s"GraphBase was compacted at iters=${gb.iters}, batchStep got $iters"))
    // broadcastAffected: ship the (append-sized) frontier/affected/work
    // id sets into every probe of the edge log and score registry
    // instead of shuffling those tables — right whenever appends disturb
    // a bounded neighborhood (the operator's whole premise; measured
    // at the 100× fixture the log would otherwise SHUFFLE once per
    // closure hop). Set false only for appends that rewire most of the
    // graph — at which point a batch rerun is the better tool anyway.
    def hint(df: DataFrame): DataFrame = if (broadcastAffected) broadcast(df) else df
    // slice(log, key, ids): the log rows whose key ∈ ids — pushed
    // In-filter (prunes the [[GraphBase]] bucket files / sorted row
    // groups) below `probeLiteralCap`, semi join above (see
    // [[ProbeSlice]])
    def slice(log: DataFrame, keyCol: String, ids: DataFrame): DataFrame =
      ProbeSlice(log, keyCol, ids, probeLiteralCap, broadcastAffected)
    val sc = scoreCols(iters)
    // with a bucketed base the `batch_id=-1` parquet base is EXCLUDED
    // from probe reads (the tables are its read-optimized copy); live
    // post-compaction partitions stack on top in both probe directions
    val livePrev = readEdges(spark, edgesDir).filter(col("batch_id") =!= batchId)
    val (prevEdgesSrc, prevEdgesDst) = base match {
      case Some(gb) =>
        val live = livePrev.filter(col("batch_id") >= 0).select("src", "dst")
        (gb.edgesSrc.select("src", "dst").union(live),
          gb.edgesDst.select("src", "dst").union(live))
      case None =>
        val all = livePrev.select("src", "dst")
        (all, all)
    }
    val prevRaw = base match {
      case Some(gb) =>
        val payload = Seq("id", "outdeg") ++ sc
        gb.scores.select(payload.map(col): _*).withColumn("batch_id", lit(-1L))
          .unionByName(readScoresRaw(spark, scoresDir, iters)
            .filter(col("batch_id") >= 0 && col("batch_id") =!= batchId))
      case None =>
        readScoresRaw(spark, scoresDir, iters).filter(col("batch_id") =!= batchId)
    }
    // dedupe against the log WITHOUT shuffling it: slice the log to the
    // batch's own src keys first (pushed filter or broadcast semi — a
    // pruned scan, not an exchange), then anti-join small-vs-small;
    // equivalent because an anti match must share the src key
    // eager checkpoints throughout (the StreamingCc rationale: lazy
    // marks materialize after their plan's accumulators are GC'd —
    // error-spam and lost metrics for no measured win)
    val cand = batch
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint(true)
    val logSlice = slice(prevEdgesSrc, "src", cand.select("src").distinct())
    val newE = cand.join(logSlice, Seq("src", "dst"), "left_anti")
      .localCheckpoint(true)
    newE.write.mode("overwrite").parquet(s"$edgesDir/batch_id=$batchId")
    if (newE.isEmpty) {
      // nothing new: the batch still owns (and must rewrite) its scores
      // partition so a replay converges to the same bytes
      latestPerId(prevRaw, iters).limit(0).write.mode("overwrite")
        .parquet(s"$scoresDir/batch_id=$batchId")
      return
    }
    if (prevRaw.isEmpty) {
      // bootstrap (empty registry): every node is affected, so the
      // closure/slice machinery is pure overhead — and at 100 TB its
      // full-edge-set checkpoints are a memory hazard. Run the lean
      // full-graph supersteps (the batch operator's plan shape) and
      // record each round's scores.
      bootstrapScores(newE, iters)
        .write.mode("overwrite").parquet(s"$scoresDir/batch_id=$batchId")
      return
    }
    // NOT checkpointed: each use re-scans the parquet log + the small
    // checkpointed newE — at scale a (bucketed) log re-read beats
    // caching the full edge set
    val allESrc = prevEdgesSrc.union(newE)
    val allEDst = prevEdgesDst.union(newE)
    // seeds: sources whose outdeg changed + brand-new nodes (no registry
    // row yet — includes tail-only nodes the closure would miss)
    val dOut = newE.groupBy(col("src").as("id")).agg(count(lit(1)).as("__d"))
      .localCheckpoint(true)
    // new-node probe: slice the registry's id column to the batch's
    // nodes (pushed filter or broadcast semi — scan, not shuffle), then
    // anti-join small-vs-small; raw duplicates don't change anti
    // semantics
    val nodeCand = newE.select(col("src").as("id"))
      .union(newE.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    val newNodes = nodeCand.join(
      slice(prevRaw.select("id"), "id", nodeCand),
      Seq("id"), "left_anti")
    // affected = K-hop out-closure of the seeds ∪ new nodes: a superset
    // of every node whose fixed-iteration score can move
    var frontier = dOut.select("id").union(newNodes).distinct()
      .localCheckpoint(true)
    var affected = frontier
    var hop = 0
    var drained = false
    while (hop < iters && !drained) {
      frontier = slice(allESrc, "src", frontier)
        .select(col("dst").as("id")).distinct().localCheckpoint(true)
      // an empty frontier has converged — every remaining hop would
      // re-scan the log to produce nothing (a DAG shallower than K
      // otherwise pays K scans; the order→part bipartite log drains
      // after ONE hop)
      drained = frontier.isEmpty
      if (!drained) affected = affected.union(frontier).distinct()
      hop += 1
    }
    affected = affected.localCheckpoint(true)
    // recompute working set: affected nodes + their in-neighbors (whose
    // stored per-round scores feed the supersteps); eA = the in-edge
    // slice of the log that lands on an affected node — the probe the
    // dst-bucketed base exists for
    val eA = slice(allEDst, "dst", affected)
      .localCheckpoint(true)
    val workIds = affected.union(eA.select(col("src").as("id"))).distinct()
      .localCheckpoint(true)
    // latest registry rows ONLY for the work-set slice — the full
    // registry is never aggregated on the append path
    val prevScores = latestPerId(
      slice(prevRaw, "id", workIds), iters)
    val work = workIds
      .join(prevScores, Seq("id"), "left")
      .join(dOut, Seq("id"), "left")
      .join(affected.withColumn("__aff", lit(true)), Seq("id"), "left")
      .select(Seq(col("id"),
        (coalesce(col("outdeg"), lit(0L)) + coalesce(col("__d"), lit(0L))).as("outdeg"),
        coalesce(col("__aff"), lit(false)).as("__aff")) ++ sc.map(col): _*)
      .localCheckpoint(true)
    // K supersteps over the affected slice; `__cur` carries each round's
    // patched score (recomputed where affected, stored otherwise)
    var cur = work.select(col("id"), col("outdeg"), lit(PrScale).as("__cur"))
    var patch = affected
    for (i <- 1 to iters) {
      val insum = eA.join(
        cur.filter(col("outdeg") > 0)
          .select(col("id").as("src"), expr("__cur div outdeg").as("__c")),
        Seq("src"))
        .groupBy(col("dst").as("id")).agg(sum("__c").as("__insum"))
      val siAff = affected.join(insum, Seq("id"), "left")
        .select(col("id"), (lit(PrScale * 3 / 20) +
          expr("(17 * coalesce(__insum, CAST(0 AS BIGINT))) div 20")).as(s"__n$i"))
        .localCheckpoint(true)
      patch = patch.join(siAff, Seq("id"))
      cur = work.join(siAff, Seq("id"), "left")
        .select(col("id"), col("outdeg"),
          coalesce(col(s"__n$i"), col(s"s$i")).as("__cur"))
        .localCheckpoint(true)
    }
    // rows to (re)write: the affected set — it already contains every
    // changed-outdeg source (dOut seeds the first frontier) and every
    // node whose scores moved or that is new
    val out = affected
      .join(work.drop("__aff"), Seq("id"))
      .join(patch, Seq("id"), "left")
      .select(Seq(col("id"), col("outdeg")) ++
        sc.zipWithIndex.map { case (c, i) =>
          coalesce(col(s"__n${i + 1}"), col(c)).as(c)
        }: _*)
    out.write.mode("overwrite").parquet(s"$scoresDir/batch_id=$batchId")
  }

  /** Bootstrap scores: the [[graft.graph.GraphOps.pageRank]] supersteps
    * (identical integer math) over the first batch's edge set, keeping
    * every round's scores. The node/outdeg frame folds the usual
    * distinct-nodes + outdeg-agg + join into ONE union-aggregate pass. */
  private def bootstrapScores(e: DataFrame, iters: Int): DataFrame = {
    val base = e.select(col("src").as("id"), lit(1L).as("__one"))
      .union(e.select(col("dst").as("id"), lit(0L).as("__one")))
      .groupBy("id").agg(sum("__one").as("outdeg"))
      .localCheckpoint(true)
    var cur = base.withColumn("__cur", lit(PrScale))
    var acc = base
    for (i <- 1 to iters) {
      val insum = e.join(
        cur.filter(col("outdeg") > 0)
          .select(col("id").as("src"), expr("__cur div outdeg").as("__c")),
        Seq("src"))
        .groupBy(col("dst").as("id")).agg(sum("__c").as("__insum"))
      cur = base.join(insum, Seq("id"), "left")
        .select(col("id"), col("outdeg"),
          (lit(PrScale * 3 / 20) +
            expr("(17 * coalesce(__insum, CAST(0 AS BIGINT))) div 20")).as("__cur"))
        .localCheckpoint(true)
      acc = acc.join(cur.select(col("id"), col("__cur").as(s"s$i")), Seq("id"))
    }
    acc
  }

  /** Table maintenance, IN PLACE: fold every `batch_id < upToBatchId`
    * score partition into one latest-wins row per node as the
    * `batch_id=-1` base (and the edge log into one distinct-relayout
    * base), via the loss-safe [[RegistryFs]] choreography. Same frontier
    * caveat as every registry: `upToBatchId` must not exceed the
    * stream's checkpoint frontier. */
  def compactRegistry(spark: SparkSession, edgesDir: String,
      scoresDir: String, iters: Int, upToBatchId: Long): Unit = {
    val sPath = new org.apache.hadoop.fs.Path(scoresDir)
    val sFs = sPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    RegistryFs.recover(sFs, sPath)
    latestPerId(
      readScoresRaw(spark, scoresDir, iters).filter(col("batch_id") < upToBatchId),
      iters)
      .write.mode("overwrite").parquet(RegistryFs.staging(sPath).toString)
    RegistryFs.swapBase(sFs, sPath, upToBatchId)
    val ePath = new org.apache.hadoop.fs.Path(edgesDir)
    val eFs = ePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    RegistryFs.recover(eFs, ePath)
    readEdges(spark, edgesDir).filter(col("batch_id") < upToBatchId)
      .select("src", "dst").distinct()
      .write.mode("overwrite").parquet(RegistryFs.staging(ePath).toString)
    RegistryFs.swapBase(eFs, ePath, upToBatchId)
  }

  /** [[compactRegistry]] plus the DEPLOYMENT relayout: after the
    * in-place fold, materialize the edge base as two bucketed+sorted
    * tables (by src for the dedup/frontier probes, by dst for the
    * in-edge probe) and the score base bucketed by id — then pass the
    * returned [[GraphBase]] to [[batchStep]] so appends probe pruned
    * bucket files / sorted row groups instead of re-scanning the full
    * log ~4× (the same maintenance shape as
    * `StreamingDedup.compactSubstringRegistry`). The `batch_id=*` dirs
    * remain the write path and source of truth; the tables are
    * read-optimized copies of the installed `batch_id=-1` base and are
    * rebuilt on each maintenance sweep.
    *
    * Honest scope (measured, BENCH_SCALE round 10): pruning pays when
    * an append's probe keys are LOCALIZED (clustered entity ids,
    * recent-key ranges). Probe key sets spread uniformly over the key
    * domain intersect every block of ANY layout — on such fixtures the
    * bucketed base ties the plain dir layout and the win is the probe
    * PLAN (exchange-free bare scan) and write volume, not scan bytes. */
  def compactRegistryBucketed(spark: SparkSession, edgesDir: String,
      scoresDir: String, iters: Int, upToBatchId: Long,
      tablePath: String, tablePrefix: String, buckets: Int = 32): GraphBase = {
    compactRegistry(spark, edgesDir, scoresDir, iters, upToBatchId)
    // relayout FROM the installed base, so the tables are byte-derived
    // from exactly the state the batch partitions fold to
    val eBase = readEdges(spark, edgesDir)
      .filter(col("batch_id") === -1L).select("src", "dst")
    val sBase = readScoresRaw(spark, scoresDir, iters)
      .filter(col("batch_id") === -1L)
      .select(("id" +: "outdeg" +: scoreCols(iters)).map(col): _*)
    val eSrc = graft.ops.Relational.materializeBucketed(
      eBase, s"$tablePath/edges_src", s"${tablePrefix}_edges_src", Seq("src"), buckets, onePerBucket = true)
    val eDst = graft.ops.Relational.materializeBucketed(
      eBase, s"$tablePath/edges_dst", s"${tablePrefix}_edges_dst", Seq("dst"), buckets, onePerBucket = true)
    val sId = graft.ops.Relational.materializeBucketed(
      sBase, s"$tablePath/scores_id", s"${tablePrefix}_scores_id", Seq("id"), buckets, onePerBucket = true)
    GraphBase(eSrc, eDst, sId, iters)
  }

  /** Continuous form: foreachBatch over the two registries. */
  def start(edges: DataFrame, edgesDir: String, scoresDir: String,
      srcCol: String, dstCol: String, iters: Int, checkpointPath: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val spark = edges.sparkSession
    edges.writeStream
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          batchStep(spark, edgesDir, scoresDir, srcCol, dstCol, iters)(batch, batchId)
        ()
      }
      .start()
  }
}
