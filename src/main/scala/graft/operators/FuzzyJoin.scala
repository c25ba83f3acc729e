package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy join / record linkage: match rows of two tables whose character
  * n-gram sets have Jaccard similarity >= a rational threshold num/den.
  *
  * The scale path is EXTENDED prefix filtering (the PPJoin family's
  * lossless candidate pruning, widened to the Delta=1 case of
  * AdaptJoin's variable-length prefix — SIGMOD'12): under a global
  * rarest-first total order on grams, two sets that share >= k >= 2
  * elements must share a PAIR of grams within each other's first
  * (n - k + 2), so candidates come from an equi-join on TWO-gram keys;
  * records whose minimum overlap k is 1 (too few grams) fall back to
  * the classic single-gram prefix join. Stop-grams shared by every
  * record sort to the END of each record's gram list and never enter a
  * prefix, so the candidate join never explodes on them — the same
  * hot-key discipline as the LSH bucket caps, but provably lossless:
  * the final exact verify of candidates returns EXACTLY the brute-force
  * result, which is why the driver oracle can stay a plain cross-join
  * replay. The pair key exists because single-gram fan-out is
  * sum_g cntL(g)*cntR(g) — quadratic in rows once the gram vocabulary
  * saturates (measured: ~1.2k live trigrams over 1.6M digit-heavy
  * names), while squaring the key space keeps coincidental collisions
  * rare at any corpus size.
  *
  * Grams ride as packed longs (21 bits per code point — injective for
  * all of Unicode), not 3-char strings: the verify stage's per-pair
  * intersection is the hot loop and integer equality beats string
  * compare ~10x.
  *
  * Shuffle budget: one gram-df aggregate, one window rank + exchange-
  * reusing prefix-array aggregate per side, one equi-join on pair keys
  * (+ one on single grams for the short-record fallback), one distinct
  * on candidate pairs, two id joins to re-attach gram arrays for the
  * verify. Nothing is ever all-pairs.
  */
object FuzzyJoin {

  /** Distinct packed-long trigrams of a string column: each char's code
    * point (< 2^21 for any Unicode scalar) packed into 21 bits of a
    * BIGINT — injective for ALL code points, never overflows. Strings
    * shorter than 3 chars yield an EMPTY array (a bare
    * `sequence(1, len-2)` would DESCEND for len < 3 and fabricate
    * phantom grams from out-of-range substrings).
    */
  def grams3(c: Column): Column = {
    val grams = transform(sequence(lit(1), length(c) - 2),
      i => ascii(substring(c, i, lit(1))).cast("long") * lit(4398046511104L) +
           ascii(substring(c, i + lit(1), lit(1))).cast("long") * lit(2097152L) +
           ascii(substring(c, i + lit(2), lit(1))).cast("long"))
    when(length(c) >= 3, array_distinct(grams))
      .otherwise(array().cast("array<bigint>"))
  }

  /** The pipeline's intermediate frames, exposed so the bench's `[fuzzy]`
    * attribution phase can count each stage's cardinality without
    * duplicating (and silently diverging from) the operator. */
  private[graft] final case class Stages(
      l: DataFrame, r: DataFrame, dfs: DataFrame,
      pairL: DataFrame, pairR: DataFrame,
      candsRaw: DataFrame, cands: DataFrame, verified: DataFrame)

  private[graft] def stages(left: DataFrame, lidCol: String, lnameCol: String,
                            right: DataFrame, ridCol: String, rnameCol: String,
                            num: Int, den: Int): Stages = {
    require(num > 0 && den > 0 && num <= den, "threshold must be in (0, 1]")
    val l = left.select(col(lidCol).as("__lid"), grams3(col(lnameCol)).as("__lg"))
      .where(size(col("__lg")) > 0)
    val r = right.select(col(ridCol).as("__rid"), grams3(col(rnameCol)).as("__rg"))
      .where(size(col("__rg")) > 0)

    // global gram rarity over BOTH tables: the one total order every
    // prefix derives from
    val dfs = l.select(explode(col("__lg")).as("__g"))
      .unionAll(r.select(explode(col("__rg")).as("__g")))
      .groupBy("__g").agg(count(lit(1)).as("__df"))

    // Candidate generation is the EXTENDED prefix filter (the Delta=1
    // case of AdaptJoin's variable-length prefix, SIGMOD'12 "Can we
    // beat the prefix filtering?"): a record keeps its rarest
    // n - k + 2 grams (one MORE than the classic prefix), and a
    // candidate must share a PAIR of grams inside both extended
    // prefixes, joined on the two-gram key. Why this is lossless for
    // k >= 2: a true match's overlap o >= k; let s1 < s2 be the two
    // globally-smallest shared grams. If x's extended prefix missed
    // s2, then <= k - 2 grams of x rank at-or-after s2 — but the
    // shared set minus s1 has k - 1 grams there. Contradiction, so
    // (s1, s2) sits inside BOTH extended prefixes and the pair join
    // finds it. Why it exists: the classic single-gram join's fan-out
    // is sum_g cntL(g)*cntR(g), which goes quadratic as soon as the
    // gram VOCABULARY saturates (measured at sf10: ~1.2k live grams
    // for 1.6M mostly-digit names made joinFanout grow ~x49 per data
    // decade with the filters only shaving 3%). Squaring the key
    // space (two grams) collapses coincidental collisions while every
    // true match still lands on its (s1, s2) witness.
    //
    // Per-record prefix ARRAY (rarest-first): the df join + rank
    // window already shuffle by record id; the groupBy reuses that
    // partitioning (grouping on the id plus its functional dependents),
    // so the array costs no extra exchange.
    def prefixArr(side: DataFrame, idc: String, gc: String): DataFrame = {
      side.select(col(idc), explode(col(gc)).as("__g"), size(col(gc)).as("__n"))
        .join(dfs, "__g")
        .withColumn("__rank", row_number().over(
          Window.partitionBy(col(idc)).orderBy(col("__df"), col("__g"))))
        .withColumn("__k", ((col("__n") * num + lit(den - 1)) / den).cast("int"))
        .where(col("__rank") <= col("__n") - col("__k") + 2)
        .groupBy(col(idc), col("__n"), col("__k"))
        .agg(array_sort(collect_list(struct(col("__rank"), col("__g")))).as("__pref"))
    }
    val paL = prefixArr(l, "__lid", "__lg")
    val paR = prefixArr(r, "__rid", "__rg")

    // A record rides the pair path only when its minimum overlap k
    // admits a two-gram witness (k >= 2) AND its extended prefix is
    // short enough that the C(p, 2) pair expansion stays cheap — long
    // sets (large documents) would pay a quadratic per-record explode
    // for nothing, since their prefixes are high-entropy anyway. 64
    // keeps the expansion <= ~2k rows/record, ~32x a classic explode.
    // Both class predicates are pure functions of the record's gram
    // count n, so the FALLBACK class is selectable straight off l/r
    // WITHOUT the df-ranked lineage: since exact Jaccard needs the
    // candidate superset only, fallback records join on ALL their
    // grams (a lossless superset of the classic prefix) against the
    // other side's ALL grams — Spark does not reuse the ranked
    // subtree across plan references (the HOF lambdas defeat exchange
    // canonicalization; measured: 3 references = 3 full recomputes,
    // 29 exchanges), so the expensive dfs-join + rank-window + array
    // aggregate must be referenced EXACTLY once per side. The cost of
    // skipping the rank discipline on the fallback is bounded by the
    // class itself: k < 2 records have <= den/num grams and the
    // length filter caps their partners at (den/num)^2 grams;
    // oversized-prefix records are long texts, the wrong tool's
    // domain (use the minhash family) — documented, not optimized.
    val maxPairPrefix = 64
    def kOf(n: Column): Column = ((n * num + lit(den - 1)) / den).cast("int")
    def fallbackClass(n: Column): Column =
      kOf(n) < 2 || (n - kOf(n) + 2) > maxPairPrefix

    // pair rows: every (g1, g2) combination inside the extended prefix,
    // rk2 = the later gram's rarest-first rank (feeds the pair-level
    // positional filter). Expression-level expansion — no extra shuffle.
    def pairRows(pa: DataFrame, idc: String, nOut: String,
                 rk2Out: String): DataFrame =
      pa.where(!fallbackClass(col("__n")))
        .select(col(idc), col("__n").as(nOut), explode(expr(
          """flatten(transform(__pref, (a, i) ->
               transform(slice(__pref, i + 2, size(__pref) - i - 1),
                 b -> named_struct('g1', a.__g, 'g2', b.__g,
                                   'rk2', b.__rank))))"""))
          .as("__p"))
        .select(col(idc), col("__p.g1").as("__g1"), col("__p.g2").as("__g2"),
          col(nOut), col("__p.rk2").as(rk2Out))
    val pairL = pairRows(paL, "__lid", "__ln", "__lrk2")
    val pairR = pairRows(paR, "__rid", "__rn", "__rrk2")

    // all-grams rows straight off l/r (cheap lineage — scan + grams3
    // only) for the fallback joins
    def allGrams(side: DataFrame, idc: String, gc: String, nOut: String,
                 klass: Column => Column): DataFrame =
      side.select(col(idc), col(gc), size(col(gc)).as(nOut))
        .where(klass(col(nOut)))
        .select(col(idc), explode(col(gc)).as("__g"), col(nOut))

    // The fallback join's PARTNER side must not explode the whole
    // table when the fallback class is empty (at a 100x scale-up the
    // un-pruned partner explode+sort alone cost ~minutes at local[4]):
    // the length filter bounds a fallback record's partners from the
    // threshold ALONE, so the partner side prunes statically —
    //  - k < 2 records have n <= den/num grams, their partners
    //    n <= (den/num)^2;
    //  - oversized-prefix records have n >= minOversizedN, their
    //    partners n >= minOversizedN * num / den.
    // A partner passing the disjunction for the WRONG class dies at
    // the per-pair length filter, so the union stays lossless.
    // At t = 1 (num == den) the extended prefix is always exactly 2
    // grams, so NO record is ever oversized — the search predicate
    // n - n + 2 > 64 is constantly false and Iterator.find would spin
    // forever (through Int wraparound). Degrade both bounds to "never".
    val minOversizedN: Long =
      if (num == den) Long.MaxValue
      else Iterator.from(1)
        .find(n => n - ((n * num + den - 1) / den) + 2 > maxPairPrefix).get.toLong
    val sPartnerMaxN = (den.toLong * den) / (num.toLong * num)
    val oPartnerMinN =
      if (num == den) Long.MaxValue
      else (minOversizedN * num + den - 1) / den
    def partnerClass(n: Column): Column =
      n <= sPartnerMaxN || n >= oPartnerMinN

    // Lossless cuts AT the candidate joins, from the PPJoin family (the
    // spec pins the output against brute force):
    //  - length bound: J >= t forces min(|x|,|y|) >= t * max(|x|,|y|);
    //  - positional filter (pair path): grams shared from ranks
    //    (rx, ry) onward can witness an overlap of at most
    //    min(|x|-rx, |y|-ry) + 2 (the two witness grams plus the
    //    shorter remaining suffix — every other shared gram sorts
    //    after the pair in BOTH records, the global order being one),
    //    which must reach the minimum overlap
    //    ceil(t/(1+t) * (|x|+|y|)). A true match's smallest witness
    //    pair always passes.
    def lengthOk = greatest(col("__ln"), col("__rn")) * num <=
      least(col("__ln"), col("__rn")) * den
    val candsPair = pairL.join(pairR, Seq("__g1", "__g2"))
      .where(lengthOk)
      .where((least(col("__ln") - col("__lrk2"), col("__rn") - col("__rrk2")) + 2) *
        (num + den) >= (col("__ln") + col("__rn")) * num)
      .select(col("__lid"), col("__rid"))
    val candsSmall = allGrams(l, "__lid", "__lg", "__ln", fallbackClass)
      .join(allGrams(r, "__rid", "__rg", "__rn", partnerClass), "__g")
      .unionAll(
        allGrams(l, "__lid", "__lg", "__ln", partnerClass)
          .join(allGrams(r, "__rid", "__rg", "__rn", fallbackClass), "__g"))
      .where(lengthOk)
      .select(col("__lid"), col("__rid"))
    val candsRaw = candsPair.unionAll(candsSmall)
    val cands = candsRaw.distinct()

    // exact verify: re-attach gram arrays, one intersection per
    // candidate. Plain equi-joins on the ids: AQE broadcasts a side from
    // its MEASURED size (GraftSession's 8 MB adaptive threshold) — a
    // hardcoded broadcast() would OOM the two-large-tables case this
    // operator exists for.
    val verified = cands.join(l, "__lid").join(r, "__rid")
      .withColumn("__inter", size(array_intersect(col("__lg"), col("__rg"))).cast("long"))
      .withColumn("__uni",
        (size(col("__lg")) + size(col("__rg"))).cast("long") - col("__inter"))
      .where(col("__inter") * den >= col("__uni") * num)
    Stages(l, r, dfs, pairL, pairR, candsRaw, cands, verified)
  }

  /** `(lid, rid, inter, uni)` for every cross-table pair with
    * J >= num/den (exact rational compare). Rows whose names yield
    * fewer than one gram are dropped.
    */
  def jaccardJoin(left: DataFrame, lidCol: String, lnameCol: String,
                  right: DataFrame, ridCol: String, rnameCol: String,
                  num: Int = 1, den: Int = 3): DataFrame = {
    val st = stages(left, lidCol, lnameCol, right, ridCol, rnameCol, num, den)
    st.verified.select(col("__lid").as(lidCol), col("__rid").as(ridCol),
      col("__inter").as("inter"), col("__uni").as("uni"))
  }
}
