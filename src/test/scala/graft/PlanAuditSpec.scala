package graft

/** Physical-plan invariants for scale design (SURVEY.md §4): these are
  * the properties that keep the operators viable at 100 TB — filters
  * reaching the parquet scan, projection pruning, dimension joins
  * broadcast (never shuffled), and no accidental cartesian products in
  * the pair-generation operators. They are asserted on the optimized
  * physical plan string so a regression in plan shape fails CI, not
  * just a benchmark.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    // formatted mode: the simple plan string truncates PushedFilters at
    // spark.sql.maxMetadataStringLength and would hide pushed predicates
    SparkEntry.queries(name)(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("P2 IN-list filter is pushed to the parquet scan") {
    val p = plan("p2_p3_in_time_filter")
    assert(p.contains("PushedFilters:") && p.contains("In(event_type"),
      s"IN filter not pushed:\n$p")
  }

  test("P3 time-range bounds are pushed to the events scan as raw nanos") {
    val p = plan("p2_p3_in_time_filter")
    assert(p.contains("GreaterThanOrEqual(ts") && p.contains("LessThanOrEqual(ts"),
      s"time range not pushed to scan:\n$p")
  }

  test("P1 projection prunes the scan to selected columns only") {
    val p = plan("p1_projection")
    assert(p.contains("ReadSchema: struct<p_partkey:bigint,p_name:string,p_brand:string>"),
      s"scan reads more than the projection:\n$p")
  }

  test("J1 dimension join is a broadcast hash join, not a shuffle join") {
    val p = plan("j1_dim_join")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dimension join shuffled:\n$p")
  }

  test("J2 export join broadcasts all dimensions") {
    val p = plan("j2_export_join")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
  }

  test("LSH candidate generation is an equi-join, never a cartesian product") {
    for (q <- Seq("d_minhash_lsh", "d_jaccard", "d_stream_neardup", "pipe_dedup_keep_best")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q degenerated to a cross join:\n$p")
    }
  }

  test("simhash pair generation is banded: equi-join on signature blocks, no nested loop") {
    val p = plan("d_simhash_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"d_simhash_pairs degenerated to an all-pairs join:\n$p")
  }

  test("P5 case-insensitive LIKE pushes the StringContains residual to the scan") {
    val p = plan("p5_ilike")
    // lower(name) LIKE lower(pattern) with a %x% pattern should still
    // prune columns; pushdown of the lowered predicate is not expected
    assert(p.contains("ReadSchema: struct<p_partkey:bigint,p_name:string>"),
      s"ilike scan reads extra columns:\n$p")
  }

  test("top-k queries use TakeOrderedAndProject, never a global sort + limit") {
    for (q <- Seq("o_topk", "t_vocab", "pipe_importance_select", "t_bm25")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q has no TakeOrdered:\n$p")
    }
  }

  test("keyed keep-first dedups use WindowGroupLimit (rank pushed into the shuffle)") {
    // Spark 4's WindowGroupLimit keeps only the per-key top row on the
    // map side — without it every duplicate crosses the wire
    for (q <- Seq("d_exact", "a7_dedup_first", "pipe_stratified")) {
      val p = plan(q)
      assert(p.contains("WindowGroupLimit"), s"$q shuffles all duplicates:\n$p")
    }
  }

  test("as-of join is one keyed window, never a range join explosion") {
    val p = plan("o_asof")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"asofJoin degenerated to a cross/range join:\n$p")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"),
      s"asofJoin lost its window carry:\n$p")
  }

  test("TPC-H shapes: semi-join customer gate, broadcast tiny dims, pushed date bounds") {
    val p3 = plan("q3_shipping")
    assert(p3.contains("LeftSemi"), s"Q3 customer gate is not a semi join:\n$p3")
    assert(p3.contains("LessThan(o_orderdate") || p3.contains("LessThan(ts"),
      s"Q3 order-date bound not pushed:\n$p3")
    val p5 = plan("q5_local_volume")
    assert(p5.contains("BroadcastHashJoin"), s"Q5 has no broadcast dim join:\n$p5")
    assert(!p5.contains("CartesianProduct"), s"Q5 degenerated:\n$p5")
    val p10 = plan("q10_returns")
    assert(p10.contains("BroadcastHashJoin"), s"Q10 nation join not broadcast:\n$p10")
    assert(p10.contains("EqualTo(l_returnflag,R)") || p10.contains("l_returnflag"),
      s"Q10 return-flag filter not pushed:\n$p10")
  }

  test("TPC-H wave (r8): scan shapes — Q1 joinless wide aggregate, Q6 fully pushed filters") {
    val p1 = plan("q1_pricing")
    assert(!p1.contains("Join"), s"Q1 is a single-scan aggregate, found a join:\n$p1")
    assert(p1.contains("HashAggregate"), s"Q1 lost hash aggregation:\n$p1")
    assert(p1.contains("LessThanOrEqual(l_shipdate"), s"Q1 shipdate bound not pushed:\n$p1")
    val p6 = plan("q6_forecast")
    assert(!p6.contains("Join"), s"Q6 is scan+filter+fold, found a join:\n$p6")
    assert(p6.contains("GreaterThanOrEqual(l_shipdate") &&
      p6.contains("LessThan(l_quantity"),
      s"Q6 predicates not pushed to the scan:\n$p6")
  }

  test("TPC-H wave (r8): join shapes — broadcast dims, semi gates, no nested loops") {
    for (q <- Seq("q7_volume", "q8_share", "q9_profit", "q14_promo",
        "q15_top_supplier", "q16_parts_suppliers", "q19_brackets")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q has no broadcast dim join:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q degenerated to a nested-loop join:\n$p")
    }
    val p8 = plan("q8_share")
    assert(p8.contains("LeftSemi"), s"Q8 region/promo gates are not semi joins:\n$p8")
    val p17 = plan("q17_small_qty")
    assert(p17.contains("LeftSemi"), s"Q17 brand gate is not a semi join:\n$p17")
    assert(!p17.contains("CartesianProduct"), s"Q17 degenerated:\n$p17")
    val p16 = plan("q16_parts_suppliers")
    assert(p16.contains("LeftAnti"), s"Q16 exclusion list is not an anti join:\n$p16")
    val p22 = plan("q22_idle_balance")
    assert(p22.contains("LeftAnti"), s"Q22 recent-orders gate is not an anti join:\n$p22")
    val p18 = plan("q18_big_orders")
    assert(!p18.contains("CartesianProduct") && !p18.contains("BroadcastNestedLoopJoin"),
      s"Q18 degenerated:\n$p18")
  }

  test("TPC-H wave (r9): Q4 semi gate, Q12 pre-join filters, Q21 decorrelated EXISTS pair") {
    // Q4: EXISTS(late line) is a LEFT SEMI probe; the date window is
    // pushed to the orders scan
    val p4 = plan("q4_priority")
    assert(p4.contains("LeftSemi"), s"Q4 EXISTS is not a semi join:\n$p4")
    assert(p4.contains("GreaterThanOrEqual(o_orderdate") &&
      p4.contains("LessThan(o_orderdate"),
      s"Q4 order-date window not pushed:\n$p4")
    assert(!p4.contains("CartesianProduct") && !p4.contains("BroadcastNestedLoopJoin"),
      s"Q4 degenerated:\n$p4")
    // Q12: every lineitem predicate evaluates BEFORE the orders join —
    // in plan terms, no nested loop and exactly one equi-join
    val p12 = plan("q12_shipmode")
    assert(!p12.contains("CartesianProduct") && !p12.contains("BroadcastNestedLoopJoin"),
      s"Q12 degenerated:\n$p12")
    // Q21: the correlated EXISTS / NOT-EXISTS pair must decorrelate to
    // per-(order, supplier) aggregates — never a line-grain self-join:
    // no cartesian/BNLJ anywhere, the status-F gate stays a semi join,
    // the nation-filtered supplier dim broadcasts, and the final top-k
    // is TakeOrdered
    val p21 = plan("q21_waiting")
    assert(!p21.contains("CartesianProduct") && !p21.contains("BroadcastNestedLoopJoin"),
      s"Q21 degenerated to a nested-loop self-join:\n$p21")
    assert(p21.contains("LeftSemi"), s"Q21 status-F gate is not a semi join:\n$p21")
    assert(p21.contains("BroadcastHashJoin"), s"Q21 supplier dim not broadcast:\n$p21")
    assert(p21.contains("TakeOrderedAndProject"),
      s"Q21 top-k sorts globally instead of TakeOrdered:\n$p21")
  }

  test("TPC-H wave (r9): Q2 decorrelated min, Q11 scalar threshold, Q20 decorrelated scalar") {
    // Q2: the correlated min-subquery must decorrelate to one per-part
    // aggregate + join-back; dims broadcast; top-k is TakeOrdered. The
    // only nested loop allowed is the broadcast 1-row supplier-count
    // scalar feeding the derived partsupp (the a3 pattern).
    val p2 = plan("q2_min_cost")
    assert(!p2.contains("CartesianProduct"), s"Q2 went cartesian:\n$p2")
    assert(p2.contains("BroadcastHashJoin"), s"Q2 dims not broadcast:\n$p2")
    assert(p2.contains("TakeOrderedAndProject"), s"Q2 sorts globally:\n$p2")
    // Q11 and Q20: no cartesians beyond the 1-row scalar broadcasts
    // (supplier count, stock-value total), every real join an equi-join
    for (q <- Seq("q11_stock_value", "q20_excess_stock")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q went cartesian:\n$p")
      assert(p.contains("BroadcastHashJoin"), s"$q dims not broadcast:\n$p")
      // Q11's supplier-count scalar appears once per partsupp lineage
      // (grouped + total), plus the stock-value total: 3 one-row
      // broadcasts, zero data-sized nested loops
      val bnlj = """\(\d+\) BroadcastNestedLoopJoin""".r.findAllIn(p).length
      assert(bnlj <= 3, s"$q has $bnlj nested loops (only 1-row scalars allowed):\n$p")
    }
  }

  test("session-3 operators: equi-join pair generation, TakeOrdered sampling, no nested loops") {
    // Theil–Sen pairs ride an explode + (key, rank) equi-join; the
    // pHash cluster generator bands over collapsed representatives —
    // neither may degenerate to a nested-loop join. (a_ref_integrity
    // is exempt: its crossJoins are 1-row scalar-aggregate folds, the
    // adjudicated broadcast-scalar pattern, which Spark plans as a
    // 1-row BNLJ by construction.)
    for (q <- Seq("a_theilsen", "m_phash_cluster", "er_golden")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q degenerated to a nested-loop join:\n$p")
    }
    assert(!plan("a_ref_integrity").contains("CartesianProduct"),
      "a_ref_integrity plans an unbroadcast cartesian")
    // priority sampling's top-(k+1) must ride TakeOrdered, never a
    // global sort of the corpus
    val ps = plan("pipe_priority_sample")
    assert(ps.contains("TakeOrderedAndProject"),
      s"priority sample plans a global sort:\n$ps")
    // Theil-Sen's windows partition by the fixed-cardinality supplier
    // key while the fact grows, so both window inputs must carry the
    // wide explicit repartition (initialPartitionNum — the round-11
    // spill fix); a default-width exchange here re-opens the 100×
    // super-linear straggler. The spec pins the NUMBER of wide
    // REPARTITION_BY_NUM exchanges, not just their presence.
    val wideParts = spark.conf
      .getOption("spark.sql.adaptive.coalescePartitions.initialPartitionNum")
      .map(_.toInt).getOrElse(spark.sessionState.conf.numShufflePartitions)
    val ts = plan("a_theilsen")
    val wideReparts =
      s"hashpartitioning\\(l_suppkey#\\d+L?, $wideParts\\), REPARTITION_BY_NUM".r
        .findAllIn(ts).length
    assert(wideReparts >= 2,
      s"a_theilsen lost its wide window repartitions (found $wideReparts " +
        s"of 2 REPARTITION_BY_NUM($wideParts) hints):\n$ts")
  }

  test("interval overlap, phrase search, rolling actives: cell/shingle equi-joins, no nested loop") {
    for (q <- Seq("o_interval_overlap", "t_phrase_search", "w12_rolling_active")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q degenerated to an all-pairs join:\n$p")
    }
  }

  test("substring dedup is gram-hash equi-joins + bounded windows: no nested loop, no cartesian") {
    for (q <- Seq("d_substring", "d_stream_substring")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a BNLJ:\n$p")
    }
  }

  test("importance scoring is equi-joins + hash aggregates, never pairwise in docs") {
    val p = plan("pipe_importance")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pipe_importance degenerated to a cross join:\n$p")
    assert(p.contains("HashAggregate"), s"pipe_importance has no hash aggregation:\n$p")
  }

  test("semDedup candidate generation is bucket equi-joins, never pairwise in the corpus") {
    val p = plan("pipe_semdedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pipe_semdedup degenerated to a cross join:\n$p")
  }

  test("perplexity bucketing is equi-joins + hash aggregates; only scalar broadcasts nest loops") {
    val p = plan("t_perplexity")
    assert(!p.contains("CartesianProduct"),
      s"t_perplexity degenerated to a cartesian join:\n$p")
    assert(p.contains("HashAggregate"), s"t_perplexity has no hash aggregation:\n$p")
  }

  test("PQ ANN never shuffles raw vectors for scoring: no cartesian, window-bounded candidates") {
    val p = plan("s_knn_pq")
    assert(!p.contains("CartesianProduct"),
      s"s_knn_pq degenerated to a cartesian join:\n$p")
    // rank<=nCandidates must prune map-side (WindowGroupLimit), or every
    // (query, vector) approx row crosses the per-query shuffle
    assert(p.contains("WindowGroupLimit"),
      s"s_knn_pq shuffles the full approx table:\n$p")
  }

  test("IVF-PQ composed ANN probes by cluster equi-join: no nested loop anywhere") {
    val p = plan("s_knn_ivfpq")
    // the whole point of the composition: the BNLJ that pqTopK accepts
    // (its ADC scan is corpus x queries by design) must be GONE — the
    // candidate join is keyed on the coarse cluster id
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"s_knn_ivfpq degenerated to an unkeyed join:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"s_knn_ivfpq shuffles the full approx table:\n$p")
  }

  test("contamination matrix is a token equi-join with the df cap, never pairwise in docs") {
    val p = plan("d_contam_matrix")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"d_contam_matrix degenerated to a cross join:\n$p")
    assert(p.contains("HashAggregate"), s"d_contam_matrix has no hash aggregation:\n$p")
  }

  test("contamination probe is an equi-join with map-side partial aggregation") {
    val p = plan("d_contam")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"d_contam degenerated to a cross join:\n$p")
    // the per-eval-doc count aggregates partially before the final shuffle
    assert(p.contains("HashAggregate"), s"d_contam has no hash aggregation:\n$p")
  }

  test("novelty scoring is a first-occurrence equi-join, never pairwise in docs") {
    val p = plan("t_novelty")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"t_novelty degenerated to a cross join:\n$p")
    assert(p.contains("HashAggregate"), s"t_novelty has no hash aggregation:\n$p")
  }

  test("temperature sampling never shuffles the corpus: broadcast stats + pure projection") {
    val p = plan("pipe_temperature")
    // the ONLY nested loop permitted is the scalar total-weight broadcast
    // (one row); group stats reach the corpus via BroadcastHashJoin
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"pipe_temperature shuffled the corpus for a catalog-sized join:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"group stats not broadcast:\n$p")
  }

  test("embedding decontamination broadcasts the bench set; corpus shuffle is thin rows") {
    val p = plan("s_contam_embed")
    assert(!p.contains("SortMergeJoin"), s"bench join not broadcast:\n$p")
    // the rank-1 argmax prunes to one row per vector on the map side —
    // the shuffle never carries the m-per-vector scored rows
    assert(p.contains("WindowGroupLimit"), s"argmax not map-side group-limited:\n$p")
    // and no aggregate-based argmax regression to sort-based folding
    assert(!p.contains("SortAggregate"), s"aggregate fell back to sort-based:\n$p")
  }

  test("IVF-SQ8 probes by cluster equi-join: no nested loop anywhere") {
    val p = plan("s_knn_ivfsq8")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"s_knn_ivfsq8 degenerated to a cross join:\n$p")
    // candidate cut is map-side group-limited before the shuffle
    assert(p.contains("WindowGroupLimit"), s"candidate cut not group-limited:\n$p")
  }

  test("vocabulary drift is hash-keyed counting, never pairwise in tokens") {
    val p = plan("t_drift")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"t_drift should broadcast its catalog-sized totals:\n$p")
    assert(p.contains("HashAggregate"), s"t_drift has no hash aggregation:\n$p")
  }

  test("conversion funnel rides the as-of union-sort: no range-join explosion") {
    val p = plan("w4_funnel")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"w4_funnel degenerated to a pair join:\n$p")
    assert(p.contains("HashAggregate"), s"w4_funnel has no hash aggregation:\n$p")
  }

  test("span corruption and FIM are pure projections: no join, no window, no mid-plan shuffle") {
    Seq("pipe_span_corrupt", "pipe_fim").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join"), s"$q must not join:\n$p")
      assert(!p.contains("Window"), s"$q must not need a window:\n$p")
      // the only exchange allowed is the final presentation ORDER BY
      // ("Exchange (" matches tree nodes only, not the detail section)
      val exchanges = "Exchange \\(".r.findAllIn(p).length
      assert(exchanges <= 1, s"$q should shuffle at most for the final sort:\n$p")
    }
  }

  test("SQ8 flat scan broadcasts queries and group-limits the rank window") {
    val p = plan("s_knn_sq8")
    assert(!p.contains("SortMergeJoin"), s"query side not broadcast:\n$p")
    assert(p.contains("WindowGroupLimit"), s"top-k not map-side pruned:\n$p")
  }

  test("ts_interp is union-sort: keyed window carry, no range join, no cartesian") {
    val p = plan("ts_interp")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"interpolation degenerated to a pair join:\n$p")
    assert(p.contains("Window"), s"interpolation lost its window carry:\n$p")
  }

  test("windowed rollups aggregate partially before the shuffle") {
    for (q <- Seq("w1_tumbling", "w2_sliding")) {
      val p = plan(q)
      // two HashAggregates (partial + final) around one exchange — the
      // map-side combine that keeps a 100 TB rollup's shuffle bounded by
      // (windows × attributes), not rows
      assert("HashAggregate".r.findAllIn(p).size >= 2,
        s"$q does not partially aggregate:\n$p")
    }
  }

  test("forward as-of and stepped resampling keep the union-sort shape (no pair join)") {
    for (q <- Seq("o_asof_fwd", "ts_step")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q degenerated to a pair join:\n$p")
      assert(p.contains("Window"), s"$q lost its window carry:\n$p")
    }
  }

  test("label centroids are ONE hash aggregate over the corpus — no explode, no pair scan") {
    val p = plan("s_label_centroids")
    // the corpus-sized stage must be positional sums, never a dim-times
    // row explosion; the pair matrix afterwards is centroid-table-sized
    assert(p.contains("HashAggregate"), s"no hash aggregate:\n$p")
    assert(!p.toLowerCase.contains("generate"), // Spark's explode operator
      s"centroid aggregation explodes the corpus:\n$p")
  }

  test("histogram quantile sketch shuffles bin counts, not data (partial aggregation)") {
    val p = plan("k_quantile_hist")
    // the (lo, hi, n) scalar attaches to the data via a 1-row broadcast
    // nested loop — constant-size build side, legitimate; what must hold
    // is map-side partial aggregation of the bin counts and a scan
    // pruned to the value column
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"bin counts not partially aggregated:\n$p")
    assert(p.contains("ReadSchema: struct<o_totalprice:double>"),
      s"quantile scan reads more than the value column:\n$p")
  }

  test("pipe_corpus_clean evaluates its text predicate AFTER the fan-out, not on the raw scan") {
    val p = plan("pipe_corpus_clean")
    // the staged langid/quality predicate re-inlined below the fan-out
    // would serialize ~20 tokenizations per row onto the single
    // pre-fan-out parquet split. With the fanOut barrier in place the
    // documents scan is a respread RDD scan; if a parquet scan IS
    // present, its section must carry only cheap pushed filters.
    val scanIdx = p.indexOf("Scan parquet")
    val barrierHolds = scanIdx < 0 ||
      !p.substring(scanIdx).split("\n\n").head.contains("split")
    assert(barrierHolds && p.contains("Scan ExistingRDD"),
      s"text predicate reached the pre-fan-out scan:\n$p")
  }

  test("archiveRange prunes whole date partitions: PartitionFilters on p_date") {
    // the date-partitioned ArchiveStore layout is only a 100 TB lever if
    // a time-ranged scan actually prunes directories at planning time —
    // pin PartitionFilters the same way the P3 pushdown assert pins
    // PushedFilters on the events scan
    val sess = spark
    import sess.implicits._
    val cat = new graft.api.GraftApi(spark,
      java.nio.file.Files.createTempDirectory("graft_prune").toString).catalog("site1")
    cat.appendArchive(Seq(
      (1, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      (1, java.sql.Timestamp.valueOf("2024-01-02 12:00:00"), 2.0),
      (1, java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), 3.0)
    ).toDF("attribute_id", "timestamp", "value"))
    val ranged = cat.archiveRange(Some("2024-01-02 00:00:00"), Some("2024-01-02 23:59:59"))
    val p = ranged.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pf = p.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.isDefined, s"no PartitionFilters section in the archive scan:\n$p")
    assert(pf.get.contains("p_date") && pf.get.contains(">=") && pf.get.contains("<="),
      s"p_date bounds missing from PartitionFilters:\n${pf.get}")
    // and the pruned scan still returns exactly the boundary-day rows
    assert(ranged.collect().map(_.getDouble(2)).toSeq === Seq(2.0))
  }

  test("ewma and seasonal residuals never pair-join; the seasonal profile broadcasts") {
    val pe = plan("ts_ewma")
    assert(!pe.contains("CartesianProduct") && !pe.contains("Join"),
      s"ts_ewma needs no join at all:\n$pe")
    assert(pe.contains("Window"), s"ts_ewma lost its frame collect:\n$pe")
    val ps = plan("ts_seasonal")
    assert(ps.contains("BroadcastHashJoin"),
      s"the catalog-sized diurnal profile must broadcast:\n$ps")
    assert(!ps.contains("SortMergeJoin"),
      s"ts_seasonal shuffled the archive against a 120-row profile:\n$ps")
  }

  test("LSH calibration pairs stay equi-join shaped; sizes broadcast") {
    // per-pair calibration: strictly equi-join, nothing nested-loop
    val pe = plan("d_minhash_est")
    assert(!pe.contains("CartesianProduct") && !pe.contains("BroadcastNestedLoopJoin"),
      s"d_minhash_est degenerated to a pair scan:\n$pe")
    // the recall summary ends in a single-row × single-row cross (the
    // broadcast-scalar-aggregate pattern, a3_scalar_subquery precedent)
    // — allowed exactly once, and never a shuffled cartesian
    val pr = plan("d_lsh_recall")
    assert(!pr.contains("CartesianProduct"),
      s"d_lsh_recall has a shuffled cartesian:\n$pr")
    // count detail headers "(N) BroadcastNestedLoopJoin" — the tree and
    // detail sections of formatted explain each mention a node once
    assert("\\(\\d+\\) BroadcastNestedLoopJoin".r.findAllIn(pr).length <= 1,
      s"d_lsh_recall may cross only the two one-row aggregates:\n$pr")
  }

  test("token-budget selection is one window per source partition, no global sort") {
    val p = plan("pipe_token_budget")
    // the only rangepartitioning allowed is the final presentation ORDER BY
    val exchanges = "Exchange rangepartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"pipe_token_budget must not sort globally mid-plan:\n$p")
    assert(p.contains("Window"), s"pipe_token_budget lost its budget window:\n$p")
    assert(!p.contains("Join"), s"pipe_token_budget needs no join:\n$p")
  }

  test("per-source top-ngram rank is map-side group-limited; no global sort") {
    val p = plan("t_ngram_topk")
    assert(p.contains("WindowGroupLimit"), s"top-5 rank not group-limited:\n$p")
    assert(!p.contains("CartesianProduct"), s"pair scan appeared:\n$p")
  }

  test("source-dup matrix and eval decontamination stay equi-join shaped") {
    for (q <- Seq("d_source_dups", "pipe_eval_clean", "t_langid_mixed")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q degenerated to a pair scan:\n$p")
    }
  }

  test("canonical dedup is one hash window over 8-byte keys, no join") {
    val p = plan("d_canon")
    assert(!p.contains("Join"), s"d_canon needs no join:\n$p")
    assert(p.contains("Window"), s"d_canon lost its canon-group window:\n$p")
  }

  test("boilerplate removal joins on the 8-byte line hash, never pairwise in lines") {
    for (q <- Seq("t_boilerplate", "d_stream_boiler")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q degenerated to a pair scan:\n$p")
    }
  }

  test("acf and changepoint are pure keyed windows + aggregates, no join") {
    for (q <- Seq("ts_acf", "ts_changepoint")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q needs no join:\n$p")
      assert(p.contains("Window"), s"$q lost its lag/frame window:\n$p")
    }
  }

  test("cross-correlation aligns by timestamp equi-join, never a nested loop") {
    val p = plan("ts_xcorr")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"ts_xcorr degenerated to a pair scan:\n$p")
  }

  test("path mining and markov transitions: one user window, top-k never sorts globally") {
    val pp = plan("w7_path")
    assert(pp.contains("TakeOrderedAndProject"),
      s"w7_path's top-10 must be TakeOrdered, not sort+limit:\n$pp")
    assert(!pp.contains("Join"), s"w7_path needs no join:\n$pp")
    val pm = plan("w8_markov")
    assert(!pm.contains("Join"), s"w8_markov needs no join:\n$pm")
  }

  test("graph kernels and association rules stay equi-join shaped, never all-pairs") {
    // pageRank/triangles run localCheckpoint eagerly at plan build; audit
    // the executed plans via the query entries end-to-end
    for (q <- Seq("g_pagerank", "g_triangles", "a_assoc", "m_phash_pairs")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q degenerated to a cartesian:\n$p")
      // scalar-aggregate broadcasts (n_baskets / count compose) are the
      // only tolerated nested loops: they join ONE row
      if (q != "g_triangles" && q != "a_assoc")
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$q degenerated to a nested loop:\n$p")
    }
    // the hamming pair generator joins on (band, chunk) — an exchange on
    // the band key must exist (equi-join), with the hamming verify a filter
    val ph = plan("m_phash_pairs")
    assert(ph.contains("SortMergeJoin") || ph.contains("ShuffledHashJoin") ||
      ph.contains("BroadcastHashJoin"), s"m_phash_pairs lost its equi-join:\n$ph")
  }

  test("t_entropy and t_bpe_pairs are explode + combinable hash aggregates, no join on the corpus") {
    val pe = plan("t_entropy")
    assert(!pe.contains("Join"), s"t_entropy needs no join:\n$pe")
    assert(pe.contains("HashAggregate"), s"t_entropy lost hash aggregation:\n$pe")
    val pb = plan("t_bpe_pairs")
    assert(!pb.contains("Join"), s"t_bpe_pairs needs no join:\n$pb")
    assert(pb.contains("TakeOrderedAndProject"),
      s"t_bpe_pairs top-k must be TakeOrdered, not global sort:\n$pb")
  }

  test("binary ANN broadcasts the query side; rerank joins only the shortlist") {
    for (q <- Seq("s_knn_bin", "s_knn_bin_rerank")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q went cartesian:\n$p")
      assert(p.contains("WindowGroupLimit"),
        s"$q's per-query top-k must group-limit the rank window:\n$p")
    }
  }

  test("z-order key audit is one projection + one hash aggregate: no join, no window") {
    val p = plan("pipe_zorder")
    assert(!p.contains("Join"), s"pipe_zorder needs no join:\n$p")
    assert(p.contains("HashAggregate"), s"bucket summary lost hash aggregation:\n$p")
  }

  test("filtered kNN joins on the metadata key and group-limits the rank window") {
    val p = plan("s_knn_filtered")
    assert(!p.contains("CartesianProduct"), s"s_knn_filtered went cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"query side must broadcast on the filter key:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"per-query top-k must group-limit the rank window:\n$p")
  }

  test("cluster evaluation is a broadcast-assignment projection + catalog-sized aggregates") {
    val p = plan("s_cluster_eval")
    assert(!p.contains("CartesianProduct"), s"s_cluster_eval went cartesian:\n$p")
    // the contingency count is the ONLY corpus-wide aggregate; margins
    // and the ARI assembly run on its k x labels output
    assert(p.contains("HashAggregate"), s"contingency count lost hash aggregation:\n$p")
  }

  test("k-core peeling is gate equi-joins + combinable degree counts, no nested loop") {
    val p = plan("g_kcore")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"g_kcore degenerated to a pair scan:\n$p")
    assert(p.contains("HashAggregate"), s"degree count lost hash aggregation:\n$p")
  }

  test("source capping group-limits the per-source rank window (cap-sized heaps, no full sort)") {
    val p = plan("pipe_source_cap")
    assert(p.contains("WindowGroupLimit"),
      s"pipe_source_cap shuffles whole sources instead of cap-sized heaps:\n$p")
  }

  test("snapshot diff is ONE full-outer equi-join on the key — no nested loop, no extra shuffles") {
    val p = plan("d_diff")
    assert(p.contains("FullOuter"), s"d_diff lost its full-outer join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"d_diff degenerated:\n$p")
    // both sides come from the same scan with only a filter between —
    // exactly two exchanges (one per side) feed the join, nothing more
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"d_diff has unexpected extra shuffles ($exchanges):\n$p")
  }

  test("attribution (batch + streaming kernel) never pair-joins: as-of is the union-sort carry") {
    for (q <- Seq("w9_attribution", "d_stream_attrib")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q degenerated to an all-pairs join:\n$p")
    }
  }

  test("SCD2 assembly is two keyed windows and ZERO joins") {
    val p = plan("j_scd2")
    assert(!p.contains("Join"), s"scd2 grew a join it doesn't need:\n$p")
    assert("\\(\\d+\\) Window".r.findAllIn(p).length === 2,
      s"scd2 should be exactly two window passes:\n$p")
  }

  test("DQ audit shares one scan for the conditional checks + one broadcast anti-join") {
    val p = plan("a_dq_audit")
    assert(p.contains("LeftAnti"), s"referential check lost its anti join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"dq audit should broadcast the dimension, not shuffle:\n$p")
    // three scans total: orders for the shared conditional-agg pass,
    // orders again as the anti-join probe, customer once — adding
    // checks must not add scans (count the "(n) Scan parquet" node
    // headers; a substring count doubles through the tree rendering)
    val scans = """\(\d+\) Scan parquet""".r.findAllIn(p).length
    assert(scans <= 3, s"a_dq_audit reads its inputs $scans times:\n$p")
  }

  test("bootstrap replicas are one explode + one combinable aggregate, no join") {
    val p = plan("pipe_bootstrap")
    assert(!p.contains("Join"), s"bootstrap grew a join:\n$p")
    assert(p.contains("HashAggregate"), s"bootstrap lost hash aggregation:\n$p")
  }

  test("PIT join and streaks: as-of never pair-joins; islands are one window, zero joins") {
    val pit = plan("j_pit")
    assert(!pit.contains("CartesianProduct") && !pit.contains("BroadcastNestedLoopJoin"),
      s"j_pit degenerated to an all-pairs join:\n$pit")
    val st = plan("w11_streaks")
    assert(!st.contains("Join"), s"w11_streaks grew a join it doesn't need:\n$st")
  }

  test("backtest joins on the shifted hour (equi), never an interval nested loop") {
    val p = plan("ts_backtest")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"ts_backtest degenerated:\n$p")
    assert(p.contains("HashAggregate"), s"backtest lost hash aggregation:\n$p")
  }

  test("link prediction: wedge/degree/anti joins are all equi-joins, never all-pairs") {
    val p = plan("g_linkpred")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"g_linkpred degenerated to an all-pairs join:\n$p")
    assert(p.contains("LeftAnti"), s"existing-edge filter lost its anti join:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k ranking sorts globally instead of TakeOrdered:\n$p")
  }

  /** The unrolled graph operators checkpoint every superstep, so the
    * FINAL plan string shows only the post-checkpoint tail — the joins
    * to audit execute eagerly during construction. Capture those real
    * executed plans through a QueryExecutionListener (localCheckpoint
    * goes through withAction, which notifies it). */
  private def executedPlans(run: => Unit): Seq[String] = {
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      run
      // the listener dispatches on the shared bus thread: poll until
      // the captured set stops growing
      var last = -1
      while (plans.size() != last) { last = plans.size(); Thread.sleep(300) }
    } finally spark.listenerManager.unregister(listener)
    import scala.jdk.CollectionConverters._
    plans.asScala.toSeq
  }

  test("round-8 graph family: equi-join supersteps, no cartesian, broadcast state") {
    for (q <- Seq("g_ppr", "g_pagerank_w", "g_lpa_w", "g_walks", "g_ktruss")) {
      val ps = executedPlans {
        SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan
      }
      assert(ps.nonEmpty, s"$q: no superstep plans captured")
      ps.foreach { p =>
        assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
          s"$q superstep degenerated to an all-pairs join:\n$p")
      }
      assert(ps.exists(_.contains("BroadcastHashJoin")),
        s"$q lost its broadcast state/seed/index joins")
    }
    // modularity: the ONLY nested loop allowed is the broadcast 1-row
    // edge-count scalar (the a3 pattern); everything else equi-joins
    val pm = plan("g_modularity")
    assert(!pm.contains("CartesianProduct"), s"g_modularity went cartesian:\n$pm")
    val bnlj = """\(\d+\) BroadcastNestedLoopJoin""".r.findAllIn(pm).length
    assert(bnlj <= 1, s"g_modularity has $bnlj nested loops (1 scalar allowed):\n$pm")
  }

  test("CDC chunking family: chunking is pure projection; dedup joins are hash-keyed") {
    for (q <- Seq("d_cdc_shared", "pipe_dedup_cdc", "d_stream_cdc")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q degenerated to an all-pairs join:\n$p")
      assert(!p.contains("SortMergeJoin") || q != "d_cdc_shared",
        s"$q shuffled a sort-merge join where hash suffices:\n$p")
    }
  }

  test("negative sampling: broadcast catalog pick + anti-join, never a nested loop over draws") {
    val p = plan("pipe_negatives")
    assert(!p.contains("CartesianProduct"), s"pipe_negatives went cartesian:\n$p")
    // the broadcast 1-row |catalog| scalar is the only permitted BNLJ
    val bnlj = """\(\d+\) BroadcastNestedLoopJoin""".r.findAllIn(p).length
    assert(bnlj <= 1, s"pipe_negatives has $bnlj nested loops (1 scalar allowed):\n$p")
    assert(p.contains("LeftAnti"), s"history collision filter lost its anti join:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"catalog pick join not broadcast:\n$p")
  }

  test("MMR and FS scoring: pool/block-bounded work only, no corpus-scale nested loops") {
    // s_mmr checkpoints per greedy step: audit the executed plans. The
    // per-step pair scoring is an intentionally bounded cross join
    // (<= poolSize x k rows); the corpus-scale pool scan must stay a
    // broadcast query join + rank window
    val ps = executedPlans {
      SparkEntry.queries("s_mmr")(spark, sfDir).queryExecution.executedPlan
    }
    assert(ps.exists(p => p.contains("BroadcastHashJoin") ||
        p.contains("BroadcastExchange")),
      "s_mmr pool scan lost its broadcast")
    assert(ps.exists(_.contains("Window")), "s_mmr rank window missing")
    val pe = plan("er_score")
    assert(!pe.contains("CartesianProduct") && !pe.contains("BroadcastNestedLoopJoin"),
      s"er_score blocking degenerated to all-pairs:\n$pe")
  }

  test("grouped k-fold and kept-set policies are single hash aggregates, no joins at all") {
    val p = plan("pipe_kfold")
    assert(!p.contains("Join"), s"pipe_kfold grew a join:\n$p")
    assert(p.contains("HashAggregate"), s"pipe_kfold lost its hash aggregate:\n$p")
  }

  test("KMV overlap: only the #groups-sized pair seed may nest-loop; corpus joins are equi") {
    val p = plan("k_kmv_jaccard")
    assert(!p.contains("CartesianProduct"), s"k_kmv_jaccard went cartesian:\n$p")
    // the ga < gb pair seed (#groups rows) is the only permitted
    // nested-loop; its subtree is duplicated once for the two UNION
    // branches (no CTE reuse), so 2 catalog-sized nodes are expected —
    // everything touching hashes must stay hash-joined. Count the
    // "(n) BroadcastNestedLoopJoin" detail headers (one per plan node;
    // a bare substring count doubles through the tree rendering).
    val bnlj = """\(\d+\) BroadcastNestedLoopJoin""".r.findAllIn(p).length
    assert(bnlj <= 2, s"k_kmv_jaccard has $bnlj nested-loop joins (2 catalog-sized allowed):\n$p")
    assert(p.contains("WindowGroupLimit") || p.contains("Window"),
      s"union-sketch rank window missing:\n$p")
  }
}
