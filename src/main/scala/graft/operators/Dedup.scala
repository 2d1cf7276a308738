package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpus cleaning: exact
  * (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket-join),
  * SimHash, and n-gram Jaccard.
  *
  * Hash primitives are md5-based so the exact same signatures are computable
  * in the DuckDB oracle (lexicographic MIN over lowercase hex strings is
  * engine-neutral; no engine-specific hash functions). At 100 TB the
  * expensive parts are the explode fan-outs and the band self-join — both are
  * plain shuffles on high-cardinality keys (token, band value) with no
  * driver-side state, so they parallelize linearly; the LSH band join keeps
  * the pair space far below the quadratic brute-force cross join.
  */
object Dedup {

  /** A constant-but-NON-FOLDABLE window partition key: `pmod(c, 1)` ≡ 0
    * for any value, but Catalyst cannot fold it away (a plain `lit(0)`
    * IS folded out of the partition spec, leaving it empty again). Use on
    * windows over deliberately-tiny frames to suppress WindowExec's
    * single-partition WARN — the flood (1000+ lines per bench run) is
    * enough to drown a run's machine-readable output tail — while
    * changing nothing about the plan's actual (bounded) shape.
    */
  def constantPartitionKey(c: Column): Column = pmod(c, lit(1L))

  /** Distinct (id, token) rows — the shingle set for token-level MinHash. */
  def distinctTokenRows(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token")).distinct()

  /** Substring-span cut over any (id, text) frame: find every `w`-token
    * window duplicated across documents, keep its FIRST occurrence
    * (min id, min start), and delete the tokens of every later copy —
    * the RefinedWeb-style exact-substring pass as a reusable operator.
    *
    * Returns (idCol, n_tokens, n_cut, kept_text) where `kept_text` is the
    * surviving tokens rejoined with single spaces (whitespace-normalizing
    * for docs whose original text had runs of spaces). Docs with fewer
    * than `w` tokens pass through uncut; docs with ZERO tokens fall out
    * of the token stream entirely — callers keeping such docs must
    * left-join and coalesce back to the original text.
    *
    * Scale shape: window hashes are built in array-land so the exploded
    * stream carries 40-byte rows; the cut set is candidate-sized (only
    * duplicated windows explode to positions); the rebuild is one
    * groupBy over the corpus token stream.
    */
  def spanCut(docs: DataFrame, idCol: String, textCol: String, w: Int = 8): DataFrame = {
    // consumed twice (duplicate-set groupBy, occurrence semi-join)
    val wins = docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= w)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("toks")) - w + 1),
        i => struct(i.cast("long").as("start"),
                    md5(concat_ws(" ", slice(col("toks"), i, lit(w)))).as("span_md5"))))
        .as("sp"))
      .select(col(idCol), col("sp.start"), col("sp.span_md5"))
      .localCheckpoint(true)
    val dup = wins.groupBy("span_md5")
      .agg(countDistinct(idCol).as("nd"))
      .filter(col("nd") >= 2)
      .select("span_md5")
    val cut = wins.join(dup, Seq("span_md5"), "left_semi")
      .withColumn("rn", row_number().over(
        Window.partitionBy("span_md5").orderBy(idCol, "start")))
      .filter(col("rn") > 1)
      .select(col(idCol),
              explode(sequence(col("start"), col("start") + lit(w - 1))).as("p"))
      .distinct()
      .withColumn("__cut", lit(1))
    val tok = docs
      .select(col(idCol), posexplode(TextAnalysis.tokens(col(textCol))))
      .select(col(idCol), (col("pos") + 1).cast("long").as("p"),
              col("col").as("tok"))
    tok.join(cut, Seq(idCol, "p"), "left_outer")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
           count(col("__cut")).as("n_cut"),
           concat_ws(" ", transform(
             array_sort(collect_list(
               when(col("__cut").isNull, struct(col("p"), col("tok"))))),
             x => x.getField("tok"))).as("kept_text"))
  }

  /** MinHash signatures: k permutations realized as md5("<i>:" + token);
    * signature element i = MIN of that keyed hash over the doc's token set.
    * Returns (idCol, m0..m{k-1}).
    */
  def minhashSignatures(tokenRows: DataFrame, idCol: String, k: Int): DataFrame = {
    val aggs = (0 until k).map { i =>
      min(md5(concat_ws(":", lit(i), col("token")))).as(s"m$i")
    }
    tokenRows.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH bands over a signature: band j = md5(concat of its r signature
    * elements). Returns (idCol, band0..band{k/r-1}).
    */
  def minhashBands(sig: DataFrame, idCol: String, k: Int, r: Int): DataFrame = {
    require(k % r == 0, "k must be divisible by r")
    val bands = (0 until k / r).map { j =>
      md5(concat((j * r until (j + 1) * r).map(i => col(s"m$i")): _*)).as(s"band$j")
    }
    sig.select(col(idCol) +: bands: _*)
  }

  /** Candidate pairs (a < b) sharing at least one LSH band.
    *
    * Dedup across bands uses the first-matching-band rule (emit a pair only
    * from the lowest band index where it collides, requiring all earlier
    * bands to differ) instead of a `distinct()` — that removes an exchange
    * over the band-duplicated pair stream entirely, which at sf0.1 is the
    * single largest cost of the whole MinHash path (pairs collide in ~4
    * bands each on near-identical docs).
    *
    * `maxBucket` (optional) neutralizes band values shared by more than that
    * many docs before pairing — the skew guard for 100 TB corpora, where a
    * mass exact-duplicate (boilerplate page, empty doc) otherwise turns one
    * band bucket into O(bucket²) pairs. Hot band values are set to NULL
    * (never equal) rather than their rows dropped, so a pair that ALSO
    * shares a small band is still emitted there — only pairs whose every
    * shared band is hot are suppressed (those are exact-dedup's job).
    * The oracle queries use the uncapped default for bit-parity.
    *
    * Exchange-width gate (`maxWideBands`): the first-matching-band rule
    * needs every band value on both sides of the join, which widens the
    * exploded frame by nBands columns per row — a fine trade at the 4 bands
    * the oracle uses, an 8× shuffle-width tax at the 32+ bands a production
    * K would run. Above the gate the narrow (id, band_idx, band_val) frame
    * joins instead and band-duplicated pairs collapse through one
    * `distinct()` exchange over two-long rows — same pair set, opposite
    * width/exchange trade, each chosen where it wins.
    */
  def lshCandidatePairs(bands: DataFrame, idCol: String, nBands: Int,
                        maxBucket: Option[Int] = None,
                        maxWideBands: Int = 8): DataFrame = {
    val capped = maxBucket match {
      case None => bands
      case Some(cap) =>
        (0 until nBands).foldLeft(bands) { (df, j) =>
          val hot = df.groupBy(col(s"band$j").as("__hv"))
            .agg(count(lit(1)).as("__bn")).filter(col("__bn") > cap)
            .select("__hv")
          df.join(broadcast(hot), col(s"band$j") === col("__hv"), "left_outer")
            .withColumn(s"band$j",
              when(col("__hv").isNotNull, lit(null)).otherwise(col(s"band$j")))
            .drop("__hv")
        }
    }
    val bandCols = (0 until nBands).map(j => col(s"band$j"))
    val entries = array((0 until nBands).map(j =>
      struct(lit(j).as("bi"), col(s"band$j").as("bv"))): _*)
    if (nBands > maxWideBands) {
      val narrow = capped
        .select(col(idCol), explode(entries).as("e"))
        .select(col(idCol), col("e.bi").as("band_idx"), col("e.bv").as("band_val"))
        .filter(col("band_val").isNotNull)
      return narrow.toDF("a", "band_idx", "band_val")
        .join(narrow.toDF("b", "band_idx", "band_val"), Seq("band_idx", "band_val"))
        .filter(col("a") < col("b"))
        .select("a", "b")
        .distinct()
    }
    val long = capped
      .select(col(idCol) +: bandCols :+ explode(entries).as("e"): _*)
      .select(col(idCol) +: bandCols :+ col("e.bi").as("band_idx") :+ col("e.bv").as("band_val"): _*)
      .filter(col("band_val").isNotNull) // nulled hot bands never pair
    def pfx(p: String) = long.toDF(long.columns.map(c => s"$p$c").toIndexedSeq: _*)
    // earlier band i blocks this match only if BOTH values survived capping
    // and are equal; a nulled (hot) band never counts as a match
    val firstMatchOnly = (0 until nBands).map { i =>
      (col("a_band_idx") <= lit(i)) ||
        col(s"a_band$i").isNull || col(s"b_band$i").isNull ||
        (col(s"a_band$i") =!= col(s"b_band$i"))
    }.reduce(_ && _)
    pfx("a_").join(pfx("b_"),
        col("a_band_idx") === col("b_band_idx") &&
        col("a_band_val") === col("b_band_val") &&
        col(s"a_$idCol") < col(s"b_$idCol") &&
        firstMatchOnly)
      .select(col(s"a_$idCol").as("a"), col(s"b_$idCol").as("b"))
  }

  /** Wide band table exploded to long form
    * `(idCol, band0..band{n-1}, band_idx, band_val, band_key)` — one row
    * per (doc, band), null band values dropped. The wide columns ride
    * along because the first-matching-band rule needs every band value on
    * both join sides. `band_key` fuses (band_idx, band_val) into ONE
    * column: probe joins cluster on it alone, which is what lets a table
    * bucketed on `band_key` feed the join with no exchange — Spark's
    * co-partitioning requires the bucket columns to be exactly the equi
    * keys (a two-key join over a one-column bucketing is rejected by the
    * planner). This is the PERSISTABLE shape of LSH dedup state
    * ([[Layout.writeBucketed]] on `band_key`).
    */
  def longBands(bands: DataFrame, idCol: String, nBands: Int): DataFrame = {
    val bandCols = (0 until nBands).map(j => col(s"band$j"))
    val entries = array((0 until nBands).map(j =>
      struct(lit(j).as("bi"), col(s"band$j").as("bv"))): _*)
    bands
      .select(col(idCol) +: bandCols :+ explode(entries).as("e"): _*)
      .select(col(idCol) +: bandCols :+ col("e.bi").as("band_idx") :+ col("e.bv").as("band_val"): _*)
      .filter(col("band_val").isNotNull)
      // ':' is unambiguous (band_idx is an int, band_val 32 hex chars), so
      // band_key equality IS (band_idx, band_val) equality
      .withColumn("band_key", concat_ws(":", col("band_idx"), col("band_val")))
  }

  /** Cross-set candidate pairs `(a, b)`: a from `bandsA`, b from `bandsB`,
    * sharing at least one LSH band — the INCREMENTAL form of
    * [[lshCandidatePairs]] for matching an incoming batch against a
    * standing corpus (ids must be disjoint across the two frames; no
    * within-set pairs form). Uses the same first-matching-band rule, so
    * band-duplicated collisions never exist and no `distinct()` exchange
    * is paid.
    */
  def lshCrossCandidatePairs(bandsA: DataFrame, bandsB: DataFrame,
                             idCol: String, nBands: Int): DataFrame =
    lshCrossCandidatePairsLong(longBands(bandsA, idCol, nBands),
                               longBands(bandsB, idCol, nBands), idCol, nBands)

  /** [[lshCrossCandidatePairs]] over ALREADY-long band frames (the stored
    * form [[longBands]] produces) — the rolling-ingest entry point: the
    * equi key is the single fused `band_key`, so the corpus side coming
    * off a `band_key`-bucketed table satisfies the join's clustering
    * exactly and the (huge) corpus never shuffles; only the (small)
    * incoming batch does.
    */
  def lshCrossCandidatePairsLong(longA: DataFrame, longB: DataFrame,
                                 idCol: String, nBands: Int): DataFrame = {
    def pfx(df: DataFrame, p: String) = df.toDF(df.columns.map(c => s"$p$c").toIndexedSeq: _*)
    val a = pfx(longA, "a_")
    val b = pfx(longB, "b_")
    val firstMatchOnly = (0 until nBands).map { i =>
      (col("a_band_idx") <= lit(i)) ||
        col(s"a_band$i").isNull || col(s"b_band$i").isNull ||
        (col(s"a_band$i") =!= col(s"b_band$i"))
    }.reduce(_ && _)
    a.join(b, col("a_band_key") === col("b_band_key") && firstMatchOnly)
      .select(col(s"a_$idCol").as("a"), col(s"b_$idCol").as("b"))
  }

  /** WITHIN-set candidate pairs (a < b) over one ALREADY-long band frame —
    * [[lshCandidatePairs]] for a corpus whose band table is persisted
    * state ([[longBands]] written via `Layout.writeBucketed` on
    * `band_key`). Self-joining a table bucketed on exactly the equi key
    * means NEITHER side shuffles: full-corpus re-clustering reads the
    * stored state twice and pays zero exchanges before the verify stage.
    * Same first-matching-band rule as the recomputing form, so the pair
    * set is bit-identical and no `distinct()` exchange is ever paid.
    */
  def lshSelfCandidatePairsLong(long: DataFrame, idCol: String,
                                nBands: Int): DataFrame = {
    def pfx(p: String) = long.toDF(long.columns.map(c => s"$p$c").toIndexedSeq: _*)
    val firstMatchOnly = (0 until nBands).map { i =>
      (col("a_band_idx") <= lit(i)) ||
        col(s"a_band$i").isNull || col(s"b_band$i").isNull ||
        (col(s"a_band$i") =!= col(s"b_band$i"))
    }.reduce(_ && _)
    pfx("a_").join(pfx("b_"),
        col("a_band_key") === col("b_band_key") &&
        col(s"a_$idCol") < col(s"b_$idCol") && firstMatchOnly)
      .select(col(s"a_$idCol").as("a"), col(s"b_$idCol").as("b"))
  }

  /** Exact set-overlap statistics `(a, b, n_inter, sz_a, sz_b)` for
    * candidate pairs via packed 64-bit token bitmasks: tokens get dense ids
    * from a distributed vocabulary numbering, each doc's set becomes a map
    * word->bitmask, and |A∩B| is a popcount loop — constant small work per
    * pair instead of per-token joins or string-array intersections. Exact,
    * not approximate (the id→token bijection only relabels bits, so
    * intersection popcounts are invariant). Jaccard, containment, overlap
    * coefficient etc. are one projection away ([[jaccardVerifyBitset]]).
    *
    * Scale posture: nothing here is vocabulary-sized on a single node — id
    * assignment is a bucketed window + a B-row offset join, and the
    * token→id join is a plain shuffled equi-join (AQE may broadcast it when
    * small, but it is never forced).
    *
    * @param idBuckets bucket count for the dense-id numbering: bounds BOTH
    *   the offsets-broadcast size (exactly `idBuckets` rows) and the
    *   parallelism of the vocabulary-numbering window — raise it for very
    *   large vocabularies (target ~10^5–10^6 tokens per bucket).
    */
  def bitsetPairStats(cand: DataFrame, tokenRows: DataFrame, idCol: String,
                      idBuckets: Int = 1 << 10,
                      materializeMasks: Boolean = false): DataFrame = {
    // The mask table is probed TWICE (a-side and b-side of the candidate
    // join). Left lazy, self-join deduplication hands the two probes
    // different expression ids, the canonical plans stop matching, and
    // exchange reuse no longer collapses them — the entire vocab-numbering
    // + bitset aggregation runs once PER SIDE (measured at sf0.1 as twin
    // concurrent ~1.2 s stage chains inside every incremental verify).
    // `materializeMasks` builds the table once — "build the index once,
    // probe it per side" — hash-spread on the id so the probe stage
    // inherits parallelism (r12; guide §2.4 "share one exchange"). It is
    // OPT-IN: for candidate sets whose mask build is sub-second the eager
    // checkpoint interrupts an otherwise fully-lazy plan for a net loss
    // (measured +0.9 s on dedup_decontam_purge), so only the heavy
    // corpus/incremental verifies enable it.
    val masks0 = tokenMasks(tokenRows, idCol, idBuckets)
    val masks =
      if (materializeMasks) Materialize.shared(masks0, col(idCol)) else masks0
    bitsetPairStatsFromMasks(cand, masks, idCol)
  }

  /** The per-id bitset masks [[bitsetPairStats]] probes: `(id, mm, sz)`
    * where `mm` maps 64-bit word index → mask over a dense numbering of
    * the DISTINCT tokens in `tokenRows`, and `sz` is the id's distinct
    * token count. Exposed so consumers sharing one token relation (the
    * 3-gram shingle verifiers) can build the mask table ONCE and probe it
    * per candidate set — the numbering depends on the token set, but
    * every quantity a verify reads (`n_inter`, `sz_a`, `sz_b`) is
    * invariant under renumbering, so probing a superset-built mask table
    * returns bit-identical stats to a per-query build.
    */
  def tokenMasks(tokenRows: DataFrame, idCol: String,
                 idBuckets: Int = 1 << 10): DataFrame = {
    require(idBuckets > 0, s"idBuckets must be positive, got $idBuckets")
    // Distributed dense-id assignment, entirely inside Catalyst (no RDD
    // round-trip, no extra zipWithIndex job): hash each distinct token into
    // one of B buckets, number tokens within a bucket (a distributed window
    // partitioned on the bucket), then add per-bucket offsets. The offsets
    // frame is exactly B rows — ITS broadcast is bounded by construction,
    // unlike the vocabulary itself. The bijection is a pure function of the
    // token set (no range-partitioner sampling, no partition-order
    // dependence), so the masks subtree sees the same ids every time it is
    // recomputed or a stage retries.
    val buckets = idBuckets
    val vocabBase = tokenRows.select("token").distinct()
      .withColumn("__bk", pmod(xxhash64(col("token")), lit(buckets.toLong)))
    val local = vocabBase.withColumn("__rn",
      row_number().over(Window.partitionBy("__bk").orderBy("token")).cast("long") - 1)
    // the cumulative sum is over ≤ `buckets` rows by construction;
    // constantPartitionKey silences WindowExec's single-partition WARN
    // without changing the (bounded) plan shape
    val offsets = vocabBase.groupBy("__bk").agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(
        sum("__n").over(Window.partitionBy(constantPartitionKey(col("__bk"))).orderBy("__bk")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__bk", "__off")
    val vocab = local.join(broadcast(offsets), "__bk")
      .select(col("token"), (col("__off") + col("__rn")).as("tid"))
    // vocab-sized join: deliberately NO broadcast hint — a web-scale corpus
    // has a vocabulary far beyond driver/executor broadcast limits, so this
    // must stay a plain equi-join on `token`; AQE still picks broadcast on
    // its own when the vocab actually fits.
    tokenRows.join(vocab, "token")
      .select(col(idCol),
              (col("tid") / 64).cast("long").as("w"),
              expr("shiftleft(CAST(1 AS BIGINT), CAST(tid % 64 AS INT))").as("m"))
      .groupBy(col(idCol), col("w")).agg(expr("bit_or(m)").as("mask"))
      .groupBy(col(idCol))
      .agg(map_from_entries(sort_array(collect_list(struct(col("w"), col("mask"))))).as("mm"),
           sum(expr("bit_count(mask)")).as("sz"))
  }

  /** The pair-probe half of [[bitsetPairStats]]: join each candidate side
    * to a prebuilt [[tokenMasks]] table and popcount the intersection.
    */
  def bitsetPairStatsFromMasks(cand: DataFrame, masks: DataFrame,
                               idCol: String): DataFrame = {
    val ma = masks.select(col(idCol).as("a"), col("mm").as("__ma"), col("sz").as("__za"))
    val mb = masks.select(col(idCol).as("b"), col("mm").as("__mb"), col("sz").as("__zb"))
    // |A∩B| runs once per CANDIDATE PAIR — the hottest expression in the
    // dedup path. The native merge-intersect expression stays inside
    // whole-stage codegen (the equivalent aggregate(map_keys(...)) HOF is
    // an interpreted per-pair lambda with per-element map probes).
    graft.functions.BitsetFunctions.register(masks.sparkSession)
    val inter = graft.functions.BitsetFunctions.bitsetIntersect(col("__ma"), col("__mb"))
    cand.join(ma, "a").join(mb, "b") // AQE broadcasts when the mask table is small
      .withColumn("__i", inter)
      .select(col("a"), col("b"), col("__i").as("n_inter"),
              col("__za").as("sz_a"), col("__zb").as("sz_b"))
  }

  /** Exact Jaccard for candidate pairs via [[bitsetPairStats]]'s popcounts. */
  def jaccardVerifyBitset(cand: DataFrame, tokenRows: DataFrame, idCol: String,
                          idBuckets: Int = 1 << 10,
                          materializeMasks: Boolean = false): DataFrame =
    bitsetPairStats(cand, tokenRows, idCol, idBuckets, materializeMasks)
      .select(col("a"), col("b"),
              (col("n_inter").cast("double") /
               (col("sz_a") + col("sz_b") - col("n_inter")).cast("double")).as("jaccard"))

  /** Exact Jaccard similarity for candidate pairs over distinct-element set
    * arrays. `docSets` is (idCol, set: array<string>) with distinct elements.
    *
    * Per-pair `array_intersect` beats the explode-then-shuffle join by orders
    * of magnitude when candidate counts are large (measured at sf0.1: the
    * exploded join moved ~170M intermediate rows; this moves one array lookup
    * per pair). Pairs sharing zero elements keep jaccard 0 (inner joins only
    * touch the id columns, so no pair is lost).
    */
  def jaccardVerify(cand: DataFrame, docSets: DataFrame, idCol: String): DataFrame = {
    val sa = docSets.select(col(idCol).as("a"), col("set").as("__sa"))
    val sb = docSets.select(col(idCol).as("b"), col("set").as("__sb"))
    val inter = size(array_intersect(col("__sa"), col("__sb"))).cast("double")
    val union = (size(col("__sa")) + size(col("__sb"))).cast("double") - inter
    cand.join(sa, "a").join(sb, "b")
      .select(col("a"), col("b"), (inter / union).as("jaccard"))
  }

  /** Distinct-token set per document as a single array column. */
  def distinctTokenSets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), array_distinct(TextAnalysis.tokens(col(textCol))).as("set"))

  /** Connected components over near-dup pairs: every node gets the minimum
    * node id of its component (`comp`), which is the canonical document to
    * KEEP — turning a pair list into an actual dedup decision.
    *
    * Star contraction with pointer-jumped maps: each round computes the
    * contraction map m(x) = min(x, min neighbour) — a forest of parent
    * pointers — then squares the MAP against itself (m := m∘m, a
    * node-count-sized self-join, never an edge pass) until stable, so every
    * node points at its forest root: a 200-hop chain collapses in one
    * round, not 200. Edges are then remapped through the compressed map and
    * self-loops dropped. The edge set shrinks geometrically — dense
    * near-dup clusters collapse immediately, and only the FIRST round
    * touches the full edge list (unlike label propagation, which pays a
    * full-edge join every round). The map is current-node-count-sized, so
    * the edge remap joins broadcast when it is small; per-round edge-sized
    * work is one groupBy and one distinct over the shrinking edge set. No
    * driver-side graph state; convergence = the contracted graph running
    * out of edges. Labels always map to the component minimum (the min
    * never maps away from itself).
    *
    * @param pairs (a, b) undirected near-dup edges
    * @param nodes single-column frame of all node ids (isolated nodes keep
    *              their own id as comp)
    */
  /** m(x) = min(x, min neighbour) over the current contracted graph — a
    * forest of parent pointers, compressed to its roots by the pointer
    * jumping in [[connectedComponents]].
    *
    * Hub skew (a pathological mega-component funnelling every member
    * through one reduce key) is bounded by construction: `min` is an
    * algebraic aggregate, so Spark plans it partial+final — each map task
    * combines its slice of the hub's rows to ONE row before the exchange,
    * which therefore carries at most one row per key per map partition
    * regardless of component size. That IS the salted two-phase min, with
    * the physical partition id as the salt; an explicit salt column would
    * add a second exchange on the node-sized frame every round without
    * improving the bound. ScaleOpsSpec pins both the partial_min-below-
    * Exchange plan shape and a generated mega-star completing flat.
    */
  private[graft] def neighbourMin(g: DataFrame): DataFrame =
    g.select(col("src").as("__n"), col("dst").as("__nb"))
      .unionByName(g.select(col("dst").as("__n"), col("src").as("__nb")))
      .groupBy(col("__n")).agg(min(col("__nb")).as("__mn"))
      .select(col("__n").as("__mid"), least(col("__n"), col("__mn")).as("__mv"))

  /** Eager localCheckpoint that COUNTS rows satisfying `flag` via an
    * accumulator riding the materialization job itself — fusing the
    * "produce the next frame" and "probe its state" actions that
    * [[connectedComponents]] previously ran as TWO blocking jobs per
    * iteration into one. On a real cluster every blocking job on the CC
    * critical path is a full job-submission round-trip, and the iteration
    * count is what it is — halving the jobs halves the serial latency.
    *
    * The count is exact for the == 0 test even under task retries:
    * accumulator updates from re-run tasks can only ADD increments, and
    * only rows with `flag` true increment — a truly flag-free frame always
    * reports 0, and a non-zero report only ever errs toward one more
    * (harmless) iteration. Returns (checkpointed frame projected to
    * `keep`, flagged-row count).
    */
  private[graft] def checkpointCounting(df: DataFrame, flag: Column,
                                        keep: Seq[String]): (DataFrame, Long) = {
    val acc = df.sparkSession.sparkContext.longAccumulator("graft.cc.flagged")
    // the side-effecting probe must survive optimization: nondeterministic
    // stops Catalyst from folding, pruning, or re-evaluating it, and the
    // checkpoint materializes every output column exactly once per row
    val tick = udf { c: Boolean => if (c) acc.add(1L); true }.asNondeterministic()
    // Materialize.frame: eager localCheckpoint by default, reliable
    // checkpoint under spark.graft.checkpoint.dir (cluster posture — see
    // that object's accumulator note for why the count stays zero-exact)
    val ck = Materialize.frame(
      df.withColumn("__probe", tick(coalesce(flag, lit(false)))))
    (ck.select(keep.map(col): _*), acc.value)
  }

  def connectedComponents(pairs: DataFrame, nodes: DataFrame, idCol: String,
                          maxIter: Int = 20): DataFrame = {
    // materialize the (expensive, LSH+jaccard-derived) pair list once, as
    // an UNDIRECTED edge list — symmetrizing it would double what every
    // checkpoint stores and every remap join carries; instead each round's
    // neighbour-min unions the two directed projections lazily (same
    // shuffle volume into the groupBy, half the materialized bytes)
    val (g0, e0) = checkpointCounting(
      pairs.select(col("a").as("src"), col("b").as("dst"))
        .filter(col("src") =!= col("dst")),
      lit(true), Seq("src", "dst"))
    var g = g0
    // labels stay a LAZY chain of left-outer joins against each round's
    // CHECKPOINTED min-map (r12 job diet): nothing ever re-executes — every
    // m_i below is materialized and the chain is at most maxIter joins deep
    // — and the per-round labels materialization (a full blocking
    // scheduler round-trip on a real cluster, formerly hidden behind a
    // concurrent Future) disappears; the chain runs once, inside the
    // consumer's action.
    var labels = nodes.select(col(idCol).as("id"), col(idCol).as("comp"))
    var i = 0
    var done = e0 == 0L
    while (!done && i < maxIter) {
      // the neighbour-min map materializes EAGERLY before the pointer-jump
      // squarings: the squarings self-join it 4×, and self-join
      // deduplication re-aliases the copies' expression ids so exchange
      // reuse cannot collapse a lazy groupBy across them — a lazy m here
      // recomputed the edge-sized aggregation once per copy (r12: the same
      // reuse failure bitsetPairStats documents)
      var m = Materialize.frame(neighbourMin(g))
      // pointer jumping on the map alone: squaring halves the forest depth
      // per pass, each pass a self-join of the node-sized (never
      // edge-sized) frame; dense graphs stabilize after one pass
      def squared(mm: DataFrame): DataFrame =
        mm.alias("x")
          .join(mm.select(col("__mid").as("__jid"), col("__mv").as("__jv")).alias("y"),
                col("x.__mv") === col("y.__jid"), "left_outer")
          .select(col("x.__mid").as("__mid"),
                  coalesce(col("__jv"), col("x.__mv")).as("__mv"),
                  (coalesce(col("__jv"), col("x.__mv")) =!= col("x.__mv")).as("__chg"))
      var mStable = false
      var j = 0
      while (!mStable && j < 20) {
        // TWO squarings per blocking job: the first stays a lazy plan, the
        // second checkpoints WITH the change count riding its own
        // materialization (a stable map squares to itself, so probing only
        // the second pass is exact). Each iteration of this loop is now
        // exactly ONE blocking job jumping depth by 4x — round 5 paid two
        // (checkpoint, then a separate .head() probe)
        val (m2, nChanged) = checkpointCounting(
          squared(squared(m).select("__mid", "__mv")),
          col("__chg"), Seq("__mid", "__mv"))
        mStable = nChanged == 0L
        m = m2
        j += 1
      }
      // relabel LAZILY against the checkpointed m (no job — see the labels
      // note above); the edge remap stays this round's one blocking job:
      // canonicalize (least, greatest) so the distinct() collapses both
      // orientations of a contracted edge, with the edge count riding the
      // checkpoint job itself
      val prevLabels = labels
      labels = prevLabels
        .join(m, prevLabels("comp") === m("__mid"), "left_outer")
        .select(col("id"), coalesce(col("__mv"), col("comp")).as("comp"))
      val (g2, nEdges) = checkpointCounting(
        g.join(m.select(col("__mid").as("__sid"), col("__mv").as("__sv")),
               col("src") === col("__sid"))
          .join(m.select(col("__mid").as("__did"), col("__mv").as("__dv")),
                col("dst") === col("__did"))
          .select(least(col("__sv"), col("__dv")).as("src"),
                  greatest(col("__sv"), col("__dv")).as("dst"))
          .filter(col("src") =!= col("dst"))
          .distinct(),
        lit(true), Seq("src", "dst"))
      g = g2
      done = nEdges == 0L
      i += 1
    }
    labels.select(col("id").as(idCol), col("comp"))
  }

  /** Token n-gram shingles (adjacent n tokens joined by one space), distinct.
    *
    * IMPORTANT: pass a *materialized column* (e.g. `.withColumn("toks", ...)`
    * first), not a raw `split(...)` expression — higher-order lambdas are
    * interpreted without common-subexpression elimination, so an inline
    * expression would be re-evaluated per element (measured ~60x slowdown).
    */
  def ngramShingles(toks: Column, n: Int): Column = {
    val grams = transform(sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o + 1)): _*))
    array_distinct(when(size(toks) >= n, grams).otherwise(array()))
  }

  /** Content-defined chunking (token-granularity FastCDC/rsync family):
    * cut a doc into variable-size chunks whose BOUNDARIES depend only on
    * local content — after token p whenever the 4-token window ending at p
    * hashes to 0 mod 8 (expected chunk length ≈ 8 tokens). The window
    * width and divisor are deliberately FIXED, not parameters: the DuckDB
    * oracles ([[graft.queries.DedupQueries]]'s `cdcChunksSql`), the
    * plain-Scala property reference (GraftProperties' `refCdcChunkMd5s`)
    * and CdcSpec all pin this exact (4, mod 8) rule, so a tunable knob
    * here would let a caller silently leave every cross-engine contract.
    * Because a boundary looks at w tokens and nothing else, an edit
    * anywhere in a doc reshapes only the chunks it touches: every chunk
    * lying fully inside an untouched region keeps its identity, which is
    * what makes chunk-hash dedup catch shared passages that fixed-size
    * chunking misses after a single leading insertion shifts every frame
    * (CdcSpec pins exactly that prepend-invariance).
    *
    * Output: one row per chunk — (id, chunk_idx, n_toks, chunk_md5).
    * Everything is per-row array algebra — a pure map stage with NO
    * shuffle and no explode of token rows, so at 100 TB this costs one
    * corpus scan; the duplicate census downstream is one groupBy on
    * chunk_md5.
    *
    * The window hash is a 31-weighted polynomial over PER-TOKEN portable
    * hashes (the md5-hex-prefix integer every other dedup op uses), and
    * the whole boundary-scan + chunk-build runs inside the native
    * [[graft.functions.CdcChunks]] expression — one imperative pass per
    * document that hashes every token exactly once. Its `aggregate`-fold
    * predecessor (already a rescue from a measured O(n²) HOF-inlining
    * form) still paid interpreted per-element lambda dispatch, benching
    * 6.3×/5.1× the single-thread comparator; the native form is the same
    * promotion [[graft.functions.WinnowSpans]] got for the same profile.
    * The SQL oracle replays the identical polynomial + cut-point rule
    * relationally, producing bit-equal chunks (CdcSpec and
    * GraftProperties' plain-Scala reference both regression-pin the
    * contract).
    */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.CdcFunctions.register(docs.sparkSession)
    docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col(idCol),
        posexplode(graft.functions.CdcFunctions.cdcChunks(col("toks")))
          .as(Seq("chunk_idx", "ch")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("ch").getField("n_toks").as("n_toks"),
        col("ch").getField("chunk_md5").as("chunk_md5"))
  }

  /** 60-bit SimHash over term frequencies. Bit b of md5(token)'s leading
    * 60 bits votes +tf / -tf; simhash bit b is 1 iff the vote sum is > 0.
    * 60 bits (15 hex chars) keeps everything in signed-long range in every
    * engine.
    *
    * The 60 per-bit vote sums are 60 aggregate COLUMNS over the token-freq
    * rows, not a 60× exploded row stream: no row inflation, one shuffle on
    * the doc id, and every vote benefits from map-side partial aggregation
    * — the plan shape that survives a 100 TB corpus (the explode form
    * shuffles 60× the token volume).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = TextAnalysis.tokenRows(df, idCol, textCol)
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val hashed = tf.withColumn("h",
      conv(substring(md5(col("token")), 1, 15), 16, 10).cast("long"))
    val votes = (0 until 60).map { b =>
      sum(col("tf") * (expr(s"CAST(shiftright(h, $b) & 1 AS BIGINT)") * 2 - 1)).as(s"__s$b")
    }
    val packed = (0 until 60).map { b =>
      when(col(s"__s$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    hashed.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
      .select(col(idCol), packed.as("simhash"))
  }

  /** SimHash near-dup pairs `(a, b, hamming)` at Hamming distance <=
    * `maxHamming`, blocked by pigeonhole banding: the 60-bit simhash splits
    * into 4 bands of 15 bits, and any pair within distance 3 must agree
    * EXACTLY on at least one band (3 bit flips touch at most 3 of the 4
    * bands) — so candidates come from the same first-matching-band
    * equi-join the MinHash path uses, never an all-pairs comparison.
    * Verification is one codegen'd `bit_count(xor)` per candidate. The ONE
    * near-dup-pair definition shared by the `dedup_simhash_pairs` query
    * and [[graft.pipeline.CorpusJob]]'s curation stage.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int): DataFrame =
    hammingPairs(simhash(df, idCol, textCol), idCol, "simhash",
      bits = 60, nBands = 4, maxHamming = maxHamming)

  /** Banded Hamming near-dup pairs `(a, b, hamming)` over ANY precomputed
    * `bits`-bit hash column — the pigeonhole blocking [[simhashPairs]]
    * introduced, factored out so every bit-fingerprint family (simhash,
    * multimodal aHash, ...) shares the one candidate-formation path: the
    * hash splits into `nBands` equal bands, and a pair within Hamming
    * distance `maxHamming` ≤ nBands−1 must agree EXACTLY on some band, so
    * candidates come from a band equi-join — never an all-pairs scan.
    * Verification is one codegen'd `bit_count(xor)` per candidate.
    */
  def hammingPairs(hashes: DataFrame, idCol: String, hashCol: String,
                   bits: Int, nBands: Int, maxHamming: Int): DataFrame = {
    require(bits % nBands == 0, s"bits=$bits not divisible into $nBands bands")
    require(maxHamming >= 0 && maxHamming <= nBands - 1,
      s"$nBands-band pigeonhole is complete only for Hamming <= ${nBands - 1}, got $maxHamming")
    val bw = bits / nBands
    val mask = (1L << bw) - 1
    val banded = hashes.select(col(idCol) +: (0 until nBands).map { j =>
      shiftrightunsigned(col(hashCol), bw * j).bitwiseAND(lit(mask)).as(s"band$j")
    }: _*)
    val cand = lshCandidatePairs(banded, idCol, nBands)
    cand.join(hashes.select(col(idCol).as("a"), col(hashCol).as("ha")), "a")
      .join(hashes.select(col(idCol).as("b"), col(hashCol).as("hb")), "b")
      .select(col("a"), col("b"),
              bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** [[hammingPairs]] across a PROBE frame and a STANDING frame with
    * disjoint id sets — the incremental-epoch form: per-band equi-joins
    * probe × standing replace the self-join (the standing side is never
    * self-paired — its internal pairs were found in their own epochs), and
    * the same codegen popcount verifies. A candidate sharing several bands
    * is emitted once via the first-matching-band rule, so no `distinct()`
    * exchange is paid. Output `(a, b, hamming)` with a = probe id.
    */
  def hammingCrossPairs(probe: DataFrame, standing: DataFrame, idCol: String,
                        hashCol: String, bits: Int, nBands: Int,
                        maxHamming: Int): DataFrame = {
    require(bits % nBands == 0, s"bits=$bits not divisible into $nBands bands")
    require(maxHamming >= 0 && maxHamming <= nBands - 1,
      s"$nBands-band pigeonhole is complete only for Hamming <= ${nBands - 1}, got $maxHamming")
    val bw = bits / nBands
    val mask = (1L << bw) - 1
    def long(df: DataFrame, p: String): DataFrame = {
      val bandCols = (0 until nBands).map { j =>
        shiftrightunsigned(col(hashCol), bw * j).bitwiseAND(lit(mask))
          .as(s"${p}_band$j")
      }
      val wide = df.select(
        Seq(col(idCol).as(p), col(hashCol).as(s"${p}_h")) ++ bandCols: _*)
      val entries = array((0 until nBands).map(j =>
        struct(lit(j).as("bi"), col(s"${p}_band$j").as("bv"))): _*)
      wide.select(wide.columns.map(col) :+ explode(entries).as("e"): _*)
        .select(wide.columns.map(col) :+
          col("e.bi").as(s"${p}_bi") :+ col("e.bv").as(s"${p}_bv"): _*)
    }
    val a = long(probe, "a")
    val b = long(standing, "b")
    val firstMatchOnly = (0 until nBands).map { i =>
      (col("a_bi") <= lit(i)) || (col(s"a_band$i") =!= col(s"b_band$i"))
    }.reduce(_ && _)
    a.join(b, col("a_bi") === col("b_bi") && col("a_bv") === col("b_bv") &&
        firstMatchOnly)
      .select(col("a"), col("b"),
              bit_count(col("a_h").bitwiseXOR(col("b_h"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Ids of `train` docs whose token set near-duplicates ANY `eval` doc —
    * the fuzzy decontamination tier as a reusable operator (the
    * `dedup_decontam_fuzzy` query shape, factored for the curation
    * pipeline): MinHash band CROSS-candidates only (train × eval — never
    * train × train, the corpus is never self-paired here), then the exact
    * bitset-Jaccard verify at `minJaccard`. Id sets must be disjoint.
    * Returns a one-column frame (`idCol`) of contaminated training ids;
    * scale shape is the incremental-probe shape — candidates are
    * eval-blocked, the verify stage candidate-sized.
    */
  def fuzzyContaminatedIds(train: DataFrame, eval: DataFrame, idCol: String,
                           textCol: String, k: Int = 16, r: Int = 4,
                           minJaccard: Double = 0.7): DataFrame = {
    val tT = distinctTokenRows(train, idCol, textCol).localCheckpoint(true)
    val tE = distinctTokenRows(eval, idCol, textCol).localCheckpoint(true)
    val bT = minhashBands(minhashSignatures(tT, idCol, k), idCol, k, r)
    val bE = minhashBands(minhashSignatures(tE, idCol, k), idCol, k, r)
    val cand = lshCrossCandidatePairs(bT, bE, idCol, k / r).localCheckpoint(true)
    val parts = cand.select(col("a").as(idCol))
      .union(cand.select(col("b").as(idCol))).distinct()
    val toks = tT.unionByName(tE).join(parts, Seq(idCol), "left_semi")
    jaccardVerifyBitset(cand, toks, idCol)
      .filter(col("jaccard") >= minJaccard)
      .select(col("a").as(idCol)).distinct()
  }

  /** Long-form Hamming band rows `(id, hash, band_idx, band_val,
    * band_key)` — [[longBands]]'s analogue for the bit-fingerprint family
    * ([[hammingPairs]]/[[hammingCrossPairs]]): one row per (id, band),
    * with the fused string `band_key` as the SINGLE equi key a probe
    * joins on. This is the PERSISTABLE shape of Hamming dedup state: a
    * standing fingerprint table written via [[Layout.writeBucketed]] on
    * `band_key` feeds [[hammingCrossPairsLong]] with NO exchange on the
    * corpus side — the rolling-ingest contract for media fingerprints,
    * identical in structure to the MinHash band state ([[graft.operators
    * .DedupState]]).
    */
  def hammingLongBands(hashes: DataFrame, idCol: String, hashCol: String,
                       bits: Int, nBands: Int): DataFrame = {
    require(bits % nBands == 0, s"bits=$bits not divisible into $nBands bands")
    val bw = bits / nBands
    val mask = (1L << bw) - 1
    val entries = array((0 until nBands).map { j =>
      struct(lit(j).as("bi"),
        shiftrightunsigned(col(hashCol), bw * j).bitwiseAND(lit(mask)).as("bv"))
    }: _*)
    hashes.select(col(idCol), col(hashCol), explode(entries).as("e"))
      .select(col(idCol), col(hashCol),
        col("e.bi").as("band_idx"), col("e.bv").as("band_val"))
      // ':' is unambiguous (band_idx is a small int, band_val decimal), so
      // band_key equality IS (band_idx, band_val) equality
      .withColumn("band_key", concat_ws(":", col("band_idx"), col("band_val")))
  }

  /** [[hammingCrossPairs]] over ALREADY-long band frames (the stored form
    * [[hammingLongBands]] produces) — the rolling-ingest entry point for
    * bit fingerprints: the equi key is the single fused `band_key`, so the
    * standing side coming off a `band_key`-bucketed table satisfies the
    * join's clustering exactly and the (huge) corpus state never shuffles;
    * only the (small) incoming batch does. The first-matching-band rule
    * recomputes each side's bands FROM the hash column it carries (no
    * per-band columns needed on the stored table), so a candidate sharing
    * several bands is emitted once and no `distinct()` exchange is paid.
    * Verification is the same codegen popcount. Output `(a, b, hamming)`
    * with a = probe id; id sets must be disjoint.
    */
  def hammingCrossPairsLong(longProbe: DataFrame, longStanding: DataFrame,
                            idCol: String, hashCol: String, bits: Int,
                            nBands: Int, maxHamming: Int): DataFrame = {
    require(bits % nBands == 0, s"bits=$bits not divisible into $nBands bands")
    require(maxHamming >= 0 && maxHamming <= nBands - 1,
      s"$nBands-band pigeonhole is complete only for Hamming <= ${nBands - 1}, got $maxHamming")
    val bw = bits / nBands
    val mask = (1L << bw) - 1
    def band(h: org.apache.spark.sql.Column, j: Int) =
      shiftrightunsigned(h, bw * j).bitwiseAND(lit(mask))
    val a = longProbe.select(col(idCol).as("a"), col(hashCol).as("a_h"),
      col("band_idx").as("a_bi"), col("band_key").as("a_bk"))
    val b = longStanding.select(col(idCol).as("b"), col(hashCol).as("b_h"),
      col("band_key").as("b_bk"))
    val firstMatchOnly = (0 until nBands).map { i =>
      (col("a_bi") <= lit(i)) || (band(col("a_h"), i) =!= band(col("b_h"), i))
    }.reduce(_ && _)
    a.join(b, col("a_bk") === col("b_bk") && firstMatchOnly)
      .select(col("a"), col("b"),
              bit_count(col("a_h").bitwiseXOR(col("b_h"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
