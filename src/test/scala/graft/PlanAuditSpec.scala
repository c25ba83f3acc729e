package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression net over the catalog: the properties that make
  * queries scale are PLAN facts (pushdown reached the scan, rank filters
  * prune map-side, no accidental cartesian/nested-loop joins), and a
  * code edit can silently lose them while every value-level oracle stays
  * green — the fuzzy join's first cut shipped a CartesianProduct that
  * way. Each assertion reads the physical plan string of the real
  * catalog entry on real testdata.
  */
class PlanAuditSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private def haveData = new java.io.File(dir).isDirectory

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.maxFields", "256")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "8388608")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  /** Count FileScans of a table that would EXECUTE in this plan — i.e.
    * outside InMemoryTableScan subtrees. A persisted materialization
    * prints its cached BUILD plan (including the original fact scan)
    * under every InMemoryRelation in the plan string, so a string
    * `contains` cannot distinguish "re-scans the fact table" from
    * "reads the cache whose lineage mentions it"; this walks the
    * physical tree (children + subqueries) and stops at cache reads. */
  private def liveScans(name: String, table: String): Int = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def walk(n: SparkPlan): Int = n match {
      case _: InMemoryTableScanExec => 0
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case f: FileSourceScanExec =>
        if (f.toString.contains(s"$table.parquet")) 1 else 0
      case other =>
        other.children.map(walk).sum + other.subqueries.map(walk).sum
    }
    walk(SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan)
  }

  test("filter predicates reach the parquet scan as PushedFilters") {
    assume(haveData)
    for (q <- Seq("q_filter", "q_where_between", "q_where_in")) {
      val p = plan(q)
      assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
        s"$q lost scan pushdown")
    }
  }

  test("top-k-per-group, domain-cap and LATERAL limit prune map-side via WindowGroupLimit") {
    assume(haveData)
    for (q <- Seq("q_topk_per_group", "q_domain_cap", "q_lateral")) {
      assert(plan(q).contains("WindowGroupLimit"), s"$q lost the rank-limit pushdown")
    }
  }

  test("correlated scalar subquery de-correlates to aggregate + join") {
    assume(haveData)
    val p = plan("q_scalar_subquery")
    assert(p.contains("HashAggregate"), "de-correlation lost: no aggregate in the plan")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "subquery fell back to a per-row/all-pairs evaluation")
  }

  test("no accidental all-pairs joins in the scale-path entries") {
    assume(haveData)
    // brute-force baselines (q_simsearch) legitimately broadcast-nested-
    // loop; these entries must never
    for (q <- Seq("q_fuzzy_join", "q_semdedup", "q_dedup_minhash",
                  "q_join_inner", "q_join_multi", "q_pit_multi")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a CartesianProduct")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a BroadcastNestedLoopJoin")
    }
  }

  test("global sorts stay TakeOrderedAndProject where a LIMIT bounds them") {
    assume(haveData)
    // top-V / top-50 entries must forward k rows per partition, not
    // globally sort the corpus
    for (q <- Seq("q_vocab", "q_inverted_index", "q_bigram_lm")) {
      assert(plan(q).contains("TakeOrderedAndProject"),
        s"$q lost TakeOrderedAndProject (global sort instead)")
    }
  }

  test("TPC-H Q18/Q21 keep the semi/anti hash-join shapes") {
    assume(haveData)
    val p18 = plan("q_tpch_q18")
    assert(p18.contains("LeftSemi"), "Q18's IN subquery lost the left-semi join rewrite")
    assert(p18.contains("TakeOrderedAndProject"), "Q18's LIMIT lost TakeOrdered")
    val p21 = plan("q_tpch_q21")
    assert(p21.contains("LeftSemi"), "Q21's EXISTS lost the left-semi join")
    assert(p21.contains("LeftAnti"), "Q21's NOT EXISTS lost the left-anti join")
    for (p <- Seq(p18, p21)) {
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        "TPC-H entry fell back to an all-pairs join")
    }
  }

  test("quantile sketch's rank filter prunes map-side; paragraph dedup never all-pairs") {
    assume(haveData)
    // rn <= 64 over the hash-ordered window must become a WindowGroupLimit
    // (each partition forwards 64 rows, not the full group)
    assert(plan("q_quantile_sketch").contains("WindowGroupLimit"),
      "quantile sketch lost the rank-limit pushdown")
    val pp = plan("q_dedup_paragraph")
    assert(!pp.contains("CartesianProduct") && !pp.contains("BroadcastNestedLoopJoin"),
      "paragraph dedup plans an all-pairs join")
    assert(pp.contains("Generate"), "paragraph dedup lost the explode (Generate)")
  }

  test("TPC-H Q4/Q6/Q14: semi-join EXISTS, full predicate pushdown, no all-pairs") {
    assume(haveData)
    val p4 = plan("q_tpch_q4")
    assert(p4.contains("LeftSemi"), "Q4's EXISTS lost the left-semi join rewrite")
    val p6 = plan("q_tpch_q6")
    // the pure-scan query: every conjunct must reach the parquet reader
    assert(p6.contains("PushedFilters: ["), "Q6 lost predicate pushdown entirely")
    assert(p6.contains("l_discount") && p6.contains("l_quantity"),
      "Q6's range predicates missing from the scan node")
    assert(p6.contains("partial_"), "Q6 lost map-side partial aggregation")
    val p14 = plan("q_tpch_q14")
    val p10 = plan("q_tpch_q10")
    assert(p10.contains("TakeOrderedAndProject"), "Q10's LIMIT lost TakeOrdered")
    val p13 = plan("q_tpch_q13")
    assert(p13.contains("LeftOuter") || p13.contains("RightOuter"),
      "Q13 lost the outer join (zero-order customers must survive)")
    for (p <- Seq(p4, p6, p14, p10, p13)) {
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        "TPC-H entry fell back to an all-pairs join")
    }
  }

  test("TPC-H Q19/Q2/Q16/Q22: disjunctive pushdown, min-subquery de-correlation, anti joins") {
    assume(haveData)
    def scanPushed(p: String, col: String): Boolean =
      p.linesIterator.exists(l => l.contains("PushedFilters") && l.contains(col))
    val p19 = plan("q_tpch_q19")
    // the OR-of-ANDs must be pruned by CNF conversion: each side's
    // derivable disjunction reaches its SCAN's PushedFilters (brand
    // alternatives on part, quantity-range union on lineitem) — a
    // residual filter above the join mentioning the columns is NOT
    // enough, the assertion is on the scan lines themselves
    assert(scanPushed(p19, "p_brand"),
      "Q19's brand disjunction never reached the part scan's PushedFilters")
    assert(scanPushed(p19, "l_quantity"),
      "Q19's quantity-range union never reached the lineitem scan's PushedFilters")
    val p2 = plan("q_tpch_q2")
    // the ps derivation still aggregates, and the LIMIT keeps TakeOrdered
    assert(p2.contains("HashAggregate"), "Q2's ps derivation lost its aggregate")
    assert(p2.contains("TakeOrderedAndProject"), "Q2's LIMIT lost TakeOrdered")
    // r20: the correlated min-subquery is expressed as a WINDOW over the
    // one joined frame (min per p_partkey) — the plan must carry the
    // Window operator, exactly ONE live lineitem scan, and NO cached
    // reads (the r11-r19 persist(DISK_ONLY) materialization is gone)
    assert(p2.contains("Window"), "Q2's min-per-part lost its window rewrite")
    assert(!p2.contains("InMemoryTableScan"),
      "Q2 regrew a cached materialization — the window rewrite made it single-pass")
    assert(liveScans("q_tpch_q2", "lineitem") == 1,
      "Q2 must scan the fact table exactly once")
    val p16 = plan("q_tpch_q16")
    assert(p16.contains("LeftAnti"), "Q16's NOT IN lost the anti-join rewrite")
    // count(DISTINCT supplier) plans as a two-level aggregate whose
    // first level keys on the distinct column alongside the group keys
    assert(p16.linesIterator.exists(l =>
        l.contains("HashAggregate") && l.contains("ps_suppkey") && l.contains("p_brand")),
      "Q16's count(DISTINCT ps_suppkey) lost the keyed de-dup aggregate level")
    val p22 = plan("q_tpch_q22")
    assert(p22.contains("LeftAnti"), "Q22's NOT EXISTS lost the anti join")
    for (p <- Seq(p19, p2, p16, p22)) {
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        "TPC-H entry fell back to an all-pairs join")
    }
  }

  test("TPC-H Q7/Q8/Q9/Q11/Q12/Q15: dim broadcasts survive, scalar aggs de-correlate") {
    assume(haveData)
    def scanPushed(p: String, col: String): Boolean =
      p.linesIterator.exists(l => l.contains("PushedFilters") && l.contains(col))
    val p7 = plan("q_tpch_q7")
    // the symmetric nation-pair OR must not break the five-way join
    // into a nested loop; the pair predicate survives into the plan
    assert(p7.contains("NATION_13") && p7.contains("NATION_19"),
      "Q7's nation-pair predicate vanished from the plan")
    val p8 = plan("q_tpch_q8")
    // the two dim gates are plain equalities and must reach their scans
    assert(scanPushed(p8, "r_name"), "Q8's region gate lost scan pushdown")
    assert(scanPushed(p8, "p_type"), "Q8's part-type gate lost scan pushdown")
    val p9 = plan("q_tpch_q9")
    assert(scanPushed(p9, "p_name"),
      "Q9's p_name LIKE filter never reached the part scan (StringContains pushdown)")
    // r20: the ps self-join is a window (min per (partkey, suppkey)) on
    // ONE lineitem scan
    assert(p9.contains("Window"), "Q9's ps self-join lost its window rewrite")
    assert(liveScans("q_tpch_q9", "lineitem") == 1,
      "Q9 must scan the fact table exactly once")
    val p11 = plan("q_tpch_q11")
    assert(p11.contains("HashAggregate"), "Q11 lost its aggregates")
    // r20: the fraction-of-total scalar is a window over the grouped
    // frame (sum of sums OVER ()) — one live lineitem scan, no cached
    // reads (the r11-r19 persist(DISK_ONLY) materialization is gone)
    assert(p11.contains("Window"), "Q11's fraction-of-total lost its window rewrite")
    assert(!p11.contains("InMemoryTableScan"),
      "Q11 regrew a cached materialization — the window rewrite made it single-pass")
    assert(liveScans("q_tpch_q11", "lineitem") == 1,
      "Q11 must scan the fact table exactly once")
    val p12 = plan("q_tpch_q12")
    assert(p12.contains("PushedFilters: [") && p12.contains("l_returnflag"),
      "Q12's returnflag IN filter lost scan pushdown")
    val p15 = plan("q_tpch_q15")
    assert(p15.contains("HashAggregate"), "Q15's revenue view lost the aggregate")
    for (p <- Seq(p7, p8, p9, p11, p12, p15)) {
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        "TPC-H entry fell back to an all-pairs join")
    }
  }

  test("IVF search over a saved index prunes the scan to the probed cells") {
    assume(haveData)
    import org.apache.spark.sql.functions.col
    val emb = GraftSession.table(spark, dir, "embeddings")
    val idx = graft.operators.Similarity.ivfBuild(emb, "vec_id", "embedding", nlist = 16)
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_pin_").toString
    graft.operators.Similarity.saveIndex(idx, root)
    val loaded = graft.operators.Similarity.loadIndex(spark, root)
    val search = graft.operators.Similarity.ivfSearch(loaded,
      emb.where(col("vec_id") < 3), "vec_id", "embedding", k = 3, nprobe = 4)
    val p = search.queryExecution.executedPlan.toString
    // the probed-cell set must reach the index scan as a PARTITION
    // filter (static pruning) — a dynamic-pruning expression that
    // degenerates to `true` under AQE re-reads the whole index
    // OptimizeIn rewrites In -> InSet above the conversion threshold
    // (default 10 values), printed as "INSET" — accept both spellings
    assert(p.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("__cell") &&
        (l.contains(" IN (") || l.contains(" INSET "))),
      "saved-index search lost static cell pruning — full index scan")
    assert(!p.contains("dynamicpruningexpression(true)"),
      "degenerate dynamic pruning present — the static prune did not replace it")
  }

  test("TPC-H Q1/Q17/Q20: partial agg, de-correlated avg join, nested-semi chain") {
    assume(haveData)
    val p1 = plan("q_tpch_q1")
    assert(p1.contains("partial_"), "Q1 lost map-side partial aggregation")
    assert(p1.contains("PushedFilters: ["), "Q1's shipdate filter lost pushdown")
    val p17 = plan("q_tpch_q17")
    assert(p17.contains("HashAggregate"), "Q17's avg subquery lost the aggregate rewrite")
    val p20 = plan("q_tpch_q20")
    assert(p20.contains("LeftSemi"), "Q20's nested IN lost the left-semi chain")
    for (p <- Seq(p1, p17, p20)) {
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        "TPC-H entry fell back to an all-pairs join")
    }
  }
}
