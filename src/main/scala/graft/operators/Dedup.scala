package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Distinct (id, token) rows — the shingle set for token-level MinHash. */
  def distinctTokenRows(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token")).distinct()

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

  /** Candidate pairs (a < b) sharing at least one LSH band. */
  def lshCandidatePairs(bands: DataFrame, idCol: String, nBands: Int): DataFrame = {
    val long = bands.unpivot(
      Array(col(idCol)),
      (0 until nBands).map(j => col(s"band$j")).toArray,
      "band_idx", "band_val")
    val a = long.select(col(idCol).as("a"), col("band_idx"), col("band_val"))
    val b = long.select(col(idCol).as("b"), col("band_idx").as("bi2"), col("band_val").as("bv2"))
    a.join(b, col("band_idx") === col("bi2") && col("band_val") === col("bv2") && col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Exact Jaccard similarity for candidate pairs over distinct-token sets.
    * Output: (a, b, jaccard). Pairs sharing zero tokens drop out (jaccard 0).
    */
  def jaccardVerify(cand: DataFrame, tokenRows: DataFrame, idCol: String): DataFrame = {
    val sizes = tokenRows.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val ta = tokenRows.select(col(idCol).as("__ia"), col("token"))
    val tb = tokenRows.select(col(idCol).as("__ib"), col("token").as("__tb"))
    val inter = cand
      .join(ta, col("a") === col("__ia"))
      .join(tb, col("b") === col("__ib") && col("token") === col("__tb"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("a"), col("sz").as("sa")), "a")
      .join(sizes.select(col(idCol).as("b"), col("sz").as("sb")), "b")
      .select(col("a"), col("b"),
              (col("inter").cast("double") /
               (col("sa") + col("sb") - col("inter")).cast("double")).as("jaccard"))
  }

  /** Token n-gram shingles (adjacent n tokens joined by one space), distinct. */
  def ngramShingles(toks: Column, n: Int): Column = {
    val grams = transform(sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o + 1)): _*))
    array_distinct(when(size(toks) >= n, grams).otherwise(array()))
  }

  /** 60-bit SimHash over term frequencies. Bit b of md5(token)'s leading
    * 60 bits votes +tf / -tf; simhash bit b is 1 iff the vote sum is > 0.
    * 60 bits (15 hex chars) keeps everything in signed-long range in every
    * engine.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = TextAnalysis.tokenRows(df, idCol, textCol)
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val hashed = tf.withColumn("h",
      conv(substring(md5(col("token")), 1, 15), 16, 10).cast("long"))
    hashed
      .select(col(idCol), col("tf"), col("h"),
              explode(sequence(lit(0), lit(59))).as("b"))
      .withColumn("bit", expr("CAST(shiftright(h, CAST(b AS INT)) & 1 AS BIGINT)"))
      .groupBy(col(idCol), col("b"))
      .agg(sum(col("tf") * (col("bit") * 2 - 1)).as("s"))
      .withColumn("vote", when(col("s") > 0, 1L).otherwise(0L))
      .withColumn("w", expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))"))
      .groupBy(col(idCol))
      .agg(sum(col("vote") * col("w")).as("simhash"))
  }
}
