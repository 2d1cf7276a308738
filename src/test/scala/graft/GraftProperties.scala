package graft

import graft.operators.ReferenceOps._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** Property-based suite (SURVEY.md §5.3) over the reference-parity
  * operators, with generated micro-datasets:
  *  - melt output size = rows x measures, and values survive the reshape;
  *  - ranking is a permutation of 1..n within every partition;
  *  - cohort semi-join output is always a subset of its input;
  *  - append = union of writes (sink associativity).
  */
object GraftProperties extends Properties("graft") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-props")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    // same temp-warehouse guard as SparkSpec: whichever suite builds the
    // shared session first must not point saveAsTable at the repo dir
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def widths = Gen.chooseNum(1, 6)
  private def heights = Gen.chooseNum(1, 20)

  private def wideGen: Gen[(Seq[Seq[Long]], Int)] = for {
    w <- widths
    h <- heights
    rows <- Gen.listOfN(h, Gen.listOfN(w, Gen.chooseNum(0L, 100L)))
  } yield (rows, w)

  property("melt size and value preservation") = Prop.forAll(wideGen) {
    case (rows, w) =>
      import spark.implicits._
      val cols = (0 until w).map(i => s"m$i")
      val df = rows.zipWithIndex
        .map { case (r, i) => (i.toLong, r) }
        .toDF("id", "vals")
        .select(col("id") +: cols.zipWithIndex.map { case (c, i) =>
          element_at(col("vals"), i + 1).as(c) }: _*)
      val long = melt(df, Seq("id"), cols, "m", "v")
      long.count() == rows.size.toLong * w &&
        long.agg(sum("v")).head.getLong(0) == rows.flatten.sum
  }

  private def partitioned: Gen[Seq[(String, Long)]] = for {
    nKeys <- Gen.chooseNum(1, 4)
    n <- Gen.chooseNum(1, 30)
    rows <- Gen.listOfN(n, for {
      k <- Gen.oneOf((0 until nKeys).map(i => s"k$i"))
      v <- Gen.chooseNum(0L, 50L)
    } yield (k, v))
  } yield rows

  property("ranking is a permutation of 1..n per partition") =
    Prop.forAll(partitioned) { rows =>
      import spark.implicits._
      val df = rows.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
        .toDF("k", "v", "tie")
      val ranked = rankWithin(df, Seq("k"), Seq(desc("v"), asc("tie")))
      ranked.groupBy("k")
        .agg(sort_array(collect_list("ranking")).as("r"), count(lit(1)).as("n"))
        .select("r", "n").as[(Seq[Int], Long)].collect()
        .forall { case (r, n) => r == (1 to n.toInt) }
    }

  property("cohort filter output is a subset of its input") =
    Prop.forAll(partitioned) { rows =>
      import spark.implicits._
      val df = rows.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
        .toDF("k", "v", "id")
      val out = cohortFilter(df, Seq("k"), col("v"), 3L, "k")
      out.join(df, Seq("id", "k", "v"), "left_anti").count() == 0L
    }

  property("append twice = union of two writes") =
    Prop.forAll(Gen.chooseNum(1, 20)) { n =>
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-prop").toString
      val df = (1 to n).map(i => (i.toLong, s"r$i")).toDF("id", "s")
      graft.sinks.TableSink.append(df, s"$dir/t")
      graft.sinks.TableSink.append(df, s"$dir/t")
      spark.read.parquet(s"$dir/t").count() == 2L * n
    }
}
