package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the file-level data-skipping
  * primitive for multi-dimensional scans.
  *
  * A 100 TB table is pruned by file/row-group min-max stats. A layout
  * sorted on ONE column gives perfect pruning on that column and none on
  * any other; interleaving the bits of TWO (or more) columns' rank spaces
  * and range-partitioning + sorting on the interleaved value gives every
  * file a small bounding BOX in the combined key space, so a predicate on
  * EITHER column (or a 2-D box) prunes most files. This is what
  * Delta/Iceberg `OPTIMIZE ZORDER BY` does; here it is a plain Spark
  * plan: one min/max agg pass + `repartitionByRange` on the z-value +
  * `sortWithinPartitions` — no custom physical operator needed, and the
  * range exchange is the only shuffle.
  *
  * The bit-interleave itself is a pure Column expression (shift/and/or
  * terms, whole-stage codegen'd) so the same arithmetic is stateable in
  * ANSI SQL for the oracle (`layout_zvalue`).
  */
object Layout {

  /** Bits per dimension. 12 bits x 2 dims = 24-bit z-values: 4096 rank
    * cells per dimension is far finer than any realistic file count, and
    * everything stays comfortably in a long.
    */
  val Bits = 12

  /** Interleave the low [[Bits]] bits of two non-negative integral columns:
    * bit i of `a` lands at even position 2i, bit i of `b` at odd 2i+1.
    * Inputs must already be in [0, 2^Bits) — see [[rank16]] for scaling
    * arbitrary columns into that space.
    */
  def zvalue(a: Column, b: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _).cast("long")

  /** Linear min/max scaling of a numeric column into the [0, 2^Bits) rank
    * space: `floor((x - lo) / max(hi - lo, 1e-9) * 2^Bits)`, then clamped
    * into [0, 2^Bits) — x = hi lands on 2^Bits and is clamped to the top
    * cell; a degenerate hi <= lo range maps everything to cell 0. One pass
    * over the data computes the (lo, hi) pair per dimension;
    * rank-exactness is not required — z-order locality only needs a
    * monotone map into the cell grid, so a linear scale (no sort, no
    * window) is the scale-correct choice.
    */
  def scaled(x: Column, lo: Double, hi: Double): Column = {
    val cells = (1 << Bits).toDouble
    val unit = (x.cast("double") - lit(lo)) / lit(math.max(hi - lo, 1e-9))
    least(greatest(floor(unit * cells), lit(0.0)), lit(cells - 1)).cast("long")
  }

  /** Write `df` z-ordered on two numeric columns into `numFiles` parquet
    * files under `path`. One agg pass for the per-dimension bounds, then a
    * single range exchange on the z-value; the z-column is dropped before
    * the write (a narrow projection after the in-partition sort, so the
    * row order the files inherit is preserved).
    */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
                    path: String, numFiles: Int): Unit = {
    val b = bounds(df, colA, colB)
    df.withColumn("__z",
        zvalue(scaled(col(colA), b(0), b(1)), scaled(col(colB), b(2), b(3))))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Comparison baseline: the same data linearly sorted on `colA` only —
    * perfect pruning on A, none on B.
    */
  def writeLinear(df: DataFrame, colA: String, path: String, numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(colA))
      .sortWithinPartitions(colA)
      .write.mode("overwrite").parquet(path)

  /** (minA, maxA, minB, maxB) in one pass. */
  def bounds(df: DataFrame, colA: String, colB: String): Array[Double] = {
    val r = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    require(!r.anyNull, s"z-order bounds: $colA/$colB must be non-null")
    Array(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
  }

  /** Per-file (min, max) of a column — the stats a pruning engine reads
    * from footers, recomputed here engine-agnostically for layout audits.
    */
  def fileStats(df: DataFrame, c: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(col(c)).cast("double").as("lo"), max(col(c)).cast("double").as("hi"))

  /** Persist `df` as a catalog table hash-bucketed (and in-bucket sorted)
    * on `key` — the OTHER half of the layout story: z-order shrinks what a
    * scan READS; bucketing pre-pays the join/agg SHUFFLE at write time.
    * Two tables bucketed the same way join with zero exchanges (Spark
    * reads bucket i of each side into the same task), and a groupBy on the
    * bucket key skips its exchange too — at 100 TB that converts every
    * recurring fact-to-fact join on the bucket key from a full network
    * shuffle into a co-located merge. LayoutSpec pins the zero-exchange
    * plans; bucket count is fixed at write time, so size it for the
    * TARGET scale (buckets ≈ data / healthy-partition-size), not the
    * current one.
    */
  def writeBucketed(df: DataFrame, key: String, table: String, numBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, key).sortBy(key)
      .saveAsTable(table)
}
