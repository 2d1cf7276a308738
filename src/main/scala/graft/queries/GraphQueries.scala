package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph analytics over relations the corpus already implies — no
  * separate graph store, no vertex/edge RDDs: nodes and edges are
  * DataFrames, an iteration is a join + aggregate, and iterative state is
  * truncated via [[graft.operators.Materialize.frame]] exactly where a
  * 100 TB deployment checkpoints between supersteps — executor-local by
  * default, RELIABLE (filesystem-backed, survives executor loss) when
  * `spark.graft.checkpoint.dir` is set.
  */
object GraphQueries {

  // PageRank constants, all integer so both engines run the identical
  // arithmetic: damping d = Damp/DampDen = 0.85, ranks held in micro-units
  // (Scale = 1e6), Iters fixed supersteps.
  private val Damp = 85L
  private val DampDen = 100L
  private val Scale = 1000000L
  private val BaseNum = Scale * (DampDen - Damp) / DampDen // (1-d)·Scale
  private val Iters = 5

  /** The duplicate-sharing domain edge list: directed both ways,
    * weight = number of verified cross-source near-dup pairs. Shared by
    * [[domainRank]] and [[domainCommunities]] (and their oracles share the
    * matching CTE chain) so the two views of the graph cannot drift.
    */
  private def domainEdges(s: SparkSession, d: String): DataFrame = {
    val docsrc = Tables.documents(s, d).select(col("doc_id"), col("source"))
    val pairs = DedupQueries.minhashPairsRaw(s, d).select("a", "b")
    val crossSrc = pairs
      .join(docsrc.select(col("doc_id").as("a"), col("source").as("s1")), "a")
      .join(docsrc.select(col("doc_id").as("b"), col("source").as("s2")), "b")
      .filter(col("s1") =!= col("s2"))
      .select("s1", "s2")
    val directed = crossSrc.select(col("s1").as("src"), col("s2").as("dst"))
      .unionByName(crossSrc.select(col("s2").as("src"), col("s1").as("dst")))
    directed.groupBy("src", "dst").agg(count(lit(1)).as("w"))
  }

  /** Duplicate-sharing domain rank — a crawl-scheduling / content-farm
    * signal for corpus curation: sources (domains) that share
    * near-duplicate documents link to each other, and a PageRank over that
    * graph concentrates mass on the hubs of syndication networks. Nodes
    * are the distinct `source` values; an undirected edge (a,b) carries
    * the number of verified MinHash near-dup pairs (Jaccard ≥ 0.7, the
    * SAME pair set as `dedup_minhash_pairs`) whose endpoints live on the
    * two sources; rank runs [[Iters]] damped supersteps.
    *
    * Determinism across engines: ranks are BIGINT micro-units end to end —
    * r₀ = ⌊Scale/N⌋, each superstep is
    * rₖ₊₁(v) = ⌊(1−d)·Scale/N⌋ + Σᵤ→ᵥ ⌊d·rₖ(u)·w(u,v) / outw(u)⌋
    * with ⌊·⌋ as integer division (`div` in Spark, `//` in DuckDB), so no
    * float-addition order can drift. Dangling mass (a node with no
    * out-edges) is dropped, identically on both sides. Magnitudes stay
    * far below 2⁶³: each term ≤ d·Scale·w < 10⁶·w.
    *
    * Scale shape: the corpus-sized work is the pair pipeline (shared with
    * the dedup queries; amortized under `sharePairs`); everything after
    * runs on DOMAIN-sized relations (≈10⁸ rows at web scale, never
    * corpus-sized). Each superstep is one equi-join rank⋈edges on `src`
    * plus one map-side-combined groupBy(dst) — co-partition both on the
    * node key (bucketing) and the join moves no data. The edge/node frames
    * are checkpointed ONCE (their lineage contains the whole pair
    * pipeline); the [[Iters]]-step ladder itself is a lazy plan over them —
    * fixed, small depth, each round feeding the next through its own
    * shuffle stage, so nothing re-executes and no per-superstep blocking
    * job is paid (r12).
    */
  def domainRank(s: SparkSession, d: String): DataFrame = {
    val ec = domainEdges(s, d)
    // checkpoint: ec's lineage contains the whole pair pipeline, which
    // every superstep (and the final inw derivation) would otherwise
    // re-execute
    rankOver(s, d, ec, checkpointEdges = true)
  }

  /** The damped-superstep tail shared by [[domainRank]] (recomputed edges)
    * and [[domainRankStored]] (persisted edge state): rank [[Iters]]
    * supersteps over the given `(src, dst, w)` edge relation. The stored
    * caller passes `checkpointEdges = false` — its edge lineage is a
    * bucketed catalog scan, and checkpointing would DISCARD the bucket
    * partitioning the exchange-free superstep join relies on.
    */
  private def rankOver(s: SparkSession, d: String, ec: DataFrame,
                       checkpointEdges: Boolean): DataFrame = {
    val docsrc = Tables.documents(s, d).select(col("doc_id"), col("source"))
    val edges0 = ec
      .join(ec.groupBy("src").agg(sum("w").as("outw")), "src")
    // Materialize.shared: checkpoint hash-distributed on the superstep join
    // key (reliable under spark.graft.checkpoint.dir as before) — the
    // frozen memo partitioning note on Materialize.shared applies here too
    val edges =
      if (checkpointEdges) graft.operators.Materialize.shared(edges0, col("src"))
      else edges0
    val nodes = graft.operators.Materialize.frame(
      docsrc.select(col("source").as("node")).distinct())
    // ONE bounded driver read (a single scalar — the same sanctioned class
    // as the k-sized centroid collects) replaces the former per-superstep
    // broadcast(count(nodes)) rebuild: n enters the plan as a literal in r0
    // and the damped base term. Scala's Long division is the same ⌊·⌋ both
    // engines compute, so the arithmetic is bit-identical to the crossJoin
    // form. (r12 job diet.)
    val n = nodes.count()
    require(n > 0, "rankOver: empty node set")
    // The superstep ladder is LAZY (r12): Iters is a fixed small constant,
    // every superstep below is ordinary join+aggregate plan growth over the
    // CHECKPOINTED edges/nodes frames, and nothing in round k re-executes
    // round k-1 when the whole ladder runs as one action — each round's
    // aggregate feeds the next through its own shuffle stage. The former
    // per-superstep Materialize.frame + broadcast pair cost ~9 blocking
    // jobs per superstep on the bench (53 jobs total for one rank query);
    // the lazy ladder runs in a handful.
    var rank: DataFrame = nodes.select(col("node"), lit(Scale / n).as("r"))
    for (_ <- 1 to Iters) {
      val contrib = rank.withColumnRenamed("node", "src")
        .join(edges, "src")
        .select(col("dst").as("node2"),
          expr(s"($Damp * r * w) div ($DampDen * outw)").as("c"))
        .groupBy("node2").agg(sum("c").as("c"))
      rank = nodes
        .join(contrib, col("node") === col("node2"), "left")
        .select(col("node"),
          (lit(BaseNum / n) + coalesce(col("c"), lit(0L))).as("r"))
    }
    // derive in-weights from the CHECKPOINTED edge frame, not the lazy ec
    // plan — ec's lineage contains the whole pair pipeline, which would
    // re-execute here whenever sharePairs is off (Verify, ScaleSmoke);
    // the outw join is 1:1 so summing w over `edges` is identical
    // name-based using-join: `edges` also lives inside the lazy rank
    // ladder's lineage now, so dataset-column refs across the two sides
    // would trip the ambiguous-self-join guard
    val inw = edges.groupBy("dst").agg(sum("w").as("dup_w"))
      .withColumnRenamed("dst", "node")
    rank.join(inw, Seq("node"), "left")
      .select(col("node").as("source"), col("r").as("rank_micro"),
        round(col("r").cast("double") / Scale.toDouble, 6).as("rank_score"),
        coalesce(col("dup_w"), lit(0L)).as("dup_w"))
      .orderBy("source")
  }

  /** The standing domain-edge STATE: per-epoch `(src, dst, w)` partial
    * weights persisted as a bucketed catalog table — the AggState pattern
    * applied to the graph tier, so the corpus-sized pair work behind the
    * edge relation is paid once per ingest epoch, never per rank run.
    *
    *  - epoch 0: the standing corpus's verified pairs, read off the
    *    bucketed [[graft.operators.DedupState]] band/token tables
    *    ([[DedupQueries.stateVerifiedEdges]] — the corpus is probed, not
    *    re-tokenized);
    *  - epoch advance: one batch's verified-pair delta (batch-self +
    *    batch×corpus off the stored band probe —
    *    [[DedupQueries.incrementalVerifiedEdges]], the SAME proven merge
    *    path `dedup_clusters_incremental` rides) aggregated to domain
    *    grain and bucket-aligned-APPENDED.
    *
    * Bands are per-document, so the full-corpus pair set decomposes
    * exactly into corpus-self ∪ batch-self ∪ batch×corpus — summing the
    * partials reproduces the recomputed edge weights row-for-row, which
    * is what lets [[domainRankStored]] share [[domainRank]]'s oracle.
    * Bucketed on `src`: hash-partitioning on src satisfies both the
    * (src, dst) re-aggregation's and the superstep join's clustering, so
    * the standing state never shuffles (PlanAuditSpec pins it).
    */
  private val edgeStateCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  private[graft] def edgeState(s: SparkSession, d: String): String =
    edgeStateCache.computeIfAbsent((s, d), _ => {
      val tbl = graft.operators.AggState.name("graft_graphedges", d).parts
      val docsrc = Tables.documents(s, d).select(col("doc_id"), col("source"))
      def weights(pairs: DataFrame): DataFrame = {
        val crossSrc = pairs
          .join(docsrc.select(col("doc_id").as("a"), col("source").as("s1")), "a")
          .join(docsrc.select(col("doc_id").as("b"), col("source").as("s2")), "b")
          .filter(col("s1") =!= col("s2"))
          .select("s1", "s2")
        crossSrc.select(col("s1").as("src"), col("s2").as("dst"))
          .unionByName(crossSrc.select(col("s2").as("src"), col("s1").as("dst")))
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      }
      val st = DedupQueries.corpusState(s, d)
      graft.operators.Layout.writeBucketed(
        weights(DedupQueries.stateVerifiedEdges(s, st).select("a", "b")),
        "src", tbl, 4)
      weights(DedupQueries.incrementalVerifiedEdges(s, d, st))
        .write.mode("append").format("parquet")
        .bucketBy(4, "src").sortBy("src").saveAsTable(tbl)
      tbl
    })

  /** [[domainRank]] from the PERSISTED edge state ([[edgeState]]): summing
    * the per-epoch partials reproduces the recomputed edge relation
    * exactly, then the identical superstep ladder runs — so a rank
    * refresh costs domain-sized work only, with the edge scan
    * exchange-free off the bucketed table. Row-identical to
    * [[domainRank]] (same oracle), which is the proof the stored
    * decomposition loses nothing.
    */
  def domainRankStored(s: SparkSession, d: String): DataFrame =
    rankOver(s, d, storedDomainEdges(s, d), checkpointEdges = false)

  /** The summed standing edge relation — exposed for the plan pin. */
  private[graft] def storedDomainEdges(s: SparkSession, d: String): DataFrame =
    s.table(edgeState(s, d)).groupBy("src", "dst").agg(sum("w").as("w"))

  /** Minimum shared-pair weight for a community edge: a single stray
    * near-dup pair between two domains is noise; repeated sharing is a
    * syndication relationship.
    */
  private val MinW = 2L

  /** Syndication-network detection: connected components over the
    * duplicate-sharing domain graph, keeping only edges with ≥ [[MinW]]
    * verified pairs. The community id is the lexicographically smallest
    * member domain (ASCII/binary string order — identical in both
    * engines). The action a curation pipeline takes on the output is
    * per-NETWORK (dedup budgets, crawl throttling, quality review) — the
    * domain-level counterpart of `dedup_clusters`' doc-level components,
    * running the same star-contraction CC on the domain-sized relation.
    */
  def domainCommunities(s: SparkSession, d: String): DataFrame = {
    val strong = domainEdges(s, d).filter(col("w") >= MinW)
      .select(col("src").as("a"), col("dst").as("b"))
    val nodes = Tables.documents(s, d).select(col("source").as("node")).distinct()
    val comps = graft.operators.Dedup.connectedComponents(strong, nodes, "node")
      .select(col("node").as("source"), col("comp").as("community"))
    val sizes = comps.groupBy("community").agg(count(lit(1)).as("community_size"))
    comps.join(sizes, "community")
      .select("source", "community", "community_size")
      .orderBy("source")
  }

  /** Triangle census of the duplicate-sharing domain graph — the
    * syndication-density signal that separates a loose pair of domains
    * sharing one article from a tight copy ring where everyone mirrors
    * everyone: per-domain triangle participation and a local clustering
    * coefficient.
    *
    * Scale shape (the part that matters at 10⁸ domains): a naive wedge
    * join fans out quadratically on hub nodes — a domain with degree 10⁵
    * contributes 10¹⁰ wedges. The classic fix, used here, is
    * degree-ordered orientation: each undirected edge points from the
    * (degree, node)-smaller endpoint to the larger, wedges are built only
    * at each edge's LOW endpoint, and a low endpoint's oriented out-degree
    * is bounded by O(√m) on any graph — total wedge work is O(m^{3/2})
    * regardless of hubs. Closure is one semi-join of wedges against the
    * oriented edge set (each triangle found exactly once, at its
    * lowest-ranked corner). All three relations are domain-sized and
    * equi-join on node keys — shuffles carry edges, never documents.
    *
    * Determinism: the orientation key is `lpad(deg)||':'||node` (binary
    * string order == (deg, node) lexicographic in both engines) and the
    * local clustering coefficient is integer micro-units
    * ⌊2·10⁶·tri / (deg·(deg−1))⌋ — no float path anywhere.
    */
  def domainTriangles(s: SparkSession, d: String): DataFrame = {
    val und = domainEdges(s, d).filter(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b"))
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val key = deg.select(col("node"), col("deg"),
      concat(lpad(col("deg").cast("string"), 10, "0"), lit(":"), col("node"))
        .as("k"))
    // orient every edge from the (deg, node)-smaller endpoint to the larger
    val ore = und
      .join(key.select(col("node").as("a"), col("k").as("ka")), "a")
      .join(key.select(col("node").as("b"), col("k").as("kb")), "b")
      .select(least(col("ka"), col("kb")).as("klo"),
        greatest(col("ka"), col("kb")).as("khi"))
    // wedges rooted at each edge's low endpoint, then close with a
    // semi-join — each triangle materializes once, at its lowest corner
    val e1 = ore.select(col("klo").as("kx"), col("khi").as("ky"))
    val e2 = ore.select(col("klo").as("kx"), col("khi").as("kz"))
    val wedge = e1.join(e2, "kx").filter(col("ky") < col("kz"))
    val tri = wedge.join(
      ore.select(col("klo").as("ky"), col("khi").as("kz")),
      Seq("ky", "kz"), "left_semi")
    val perNode = tri.select(col("kx").as("k"))
      .unionByName(tri.select(col("ky").as("k")))
      .unionByName(tri.select(col("kz").as("k")))
      .groupBy("k").agg(count(lit(1)).as("tri"))
    val nodes = Tables.documents(s, d).select(col("source").as("node")).distinct()
    nodes
      .join(key, Seq("node"), "left")
      .join(perNode, Seq("k"), "left")
      .select(col("node").as("source"),
        coalesce(col("deg"), lit(0L)).as("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"))
      .withColumn("lcc_micro",
        when(col("deg") >= 2,
          expr("(2000000 * tri) div (deg * (deg - 1))"))
          .otherwise(lit(0L)))
      .orderBy("source")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_domain_rank" -> (domainRank _),
    "graph_domain_rank_stored" -> (domainRankStored _),
    "graph_domain_communities" -> (domainCommunities _),
    "graph_triangles" -> (domainTriangles _),
  )

  // the superstep chain restated as explicit CTEs (DuckDB's recursive CTEs
  // disallow the aggregate each superstep needs, and an unrolled chain is
  // exactly as deterministic)
  private val rankCtes: String = {
    val r0 = s"""r0 AS (
                |  SELECT node, CAST($Scale AS BIGINT) // nn.n AS r
                |  FROM nodes CROSS JOIN nn)""".stripMargin
    val steps = (1 to Iters).map { k =>
      s"""c$k AS (
         |  SELECT e.dst AS node,
         |    CAST(sum(($Damp * p.r * e.w) // ($DampDen * e.outw)) AS BIGINT) AS c
         |  FROM r${k - 1} p JOIN e ON p.node = e.src GROUP BY e.dst),
         |r$k AS (
         |  SELECT nodes.node,
         |    CAST($BaseNum AS BIGINT) // nn.n + coalesce(c$k.c, CAST(0 AS BIGINT)) AS r
         |  FROM nodes CROSS JOIN nn LEFT JOIN c$k ON nodes.node = c$k.node)""".stripMargin
    }
    (r0 +: steps).mkString(",\n")
  }

  // the domain edge derivation restated — shared verbatim by both graph
  // oracles (the [[domainEdges]] twin)
  private val domainEdgeCtes: String =
    """e0 AS (
      |  SELECT da.source AS s1, db.source AS s2
      |  FROM vp
      |  JOIN documents da ON vp.a = da.doc_id
      |  JOIN documents db ON vp.b = db.doc_id
      |  WHERE da.source <> db.source),
      |ed AS (SELECT s1 AS src, s2 AS dst FROM e0
      |       UNION ALL SELECT s2 AS src, s1 AS dst FROM e0),
      |ec AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
      |       FROM ed GROUP BY src, dst)""".stripMargin

  val oracle: Map[String, String] = Map(
    "graph_triangles" ->
      s"""WITH ${DedupQueries.verifiedPairsCtes},
         |$domainEdgeCtes,
         |und AS MATERIALIZED (SELECT src AS a, dst AS b FROM ec WHERE src < dst),
         |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
         |        FROM (SELECT a AS node FROM und
         |              UNION ALL SELECT b AS node FROM und)
         |        GROUP BY node),
         |k AS MATERIALIZED (SELECT node, deg,
         |        lpad(CAST(deg AS VARCHAR), 10, '0') || ':' || node AS k
         |      FROM deg),
         |ore AS MATERIALIZED (
         |  SELECT least(ka.k, kb.k) AS klo, greatest(ka.k, kb.k) AS khi
         |  FROM und
         |  JOIN k ka ON und.a = ka.node
         |  JOIN k kb ON und.b = kb.node),
         |wedge AS (
         |  SELECT e1.klo AS kx, e1.khi AS ky, e2.khi AS kz
         |  FROM ore e1 JOIN ore e2 ON e1.klo = e2.klo
         |  WHERE e1.khi < e2.khi),
         |tri AS MATERIALIZED (
         |  SELECT kx, ky, kz FROM wedge
         |  WHERE EXISTS (SELECT 1 FROM ore
         |                WHERE ore.klo = wedge.ky AND ore.khi = wedge.kz)),
         |pern AS (SELECT k, CAST(count(*) AS BIGINT) AS tri
         |         FROM (SELECT kx AS k FROM tri
         |               UNION ALL SELECT ky AS k FROM tri
         |               UNION ALL SELECT kz AS k FROM tri)
         |         GROUP BY k),
         |nodes AS MATERIALIZED (SELECT DISTINCT source AS node FROM documents)
         |SELECT nodes.node AS source,
         |  coalesce(k.deg, CAST(0 AS BIGINT)) AS deg,
         |  coalesce(pern.tri, CAST(0 AS BIGINT)) AS tri,
         |  CASE WHEN coalesce(k.deg, 0) >= 2
         |       THEN (2000000 * coalesce(pern.tri, CAST(0 AS BIGINT)))
         |            // (k.deg * (k.deg - 1))
         |       ELSE CAST(0 AS BIGINT) END AS lcc_micro
         |FROM nodes
         |LEFT JOIN k ON nodes.node = k.node
         |LEFT JOIN pern ON k.k = pern.k
         |ORDER BY source""".stripMargin,
    "graph_domain_communities" ->
      s"""WITH RECURSIVE ${DedupQueries.verifiedPairsCtes},
         |$domainEdgeCtes,
         |ew AS MATERIALIZED (SELECT src, dst FROM ec WHERE w >= $MinW),
         |nodes AS MATERIALIZED (SELECT DISTINCT source AS node FROM documents),
         |cc AS (
         |  SELECT node AS id, node AS root FROM nodes
         |  UNION
         |  SELECT e.dst, cc.root FROM cc JOIN ew e ON cc.id = e.src),
         |fin AS (SELECT id AS source, min(root) AS community FROM cc GROUP BY id),
         |csz AS (SELECT community, CAST(count(*) AS BIGINT) AS community_size
         |        FROM fin GROUP BY community)
         |SELECT fin.source, fin.community, csz.community_size
         |FROM fin JOIN csz USING (community)
         |ORDER BY source""".stripMargin,
    "graph_domain_rank" -> rankSql,
    // the stored form is row-identical by construction (the per-epoch
    // partial decomposition sums back to the recomputed edge relation) —
    // the shared oracle IS the equivalence proof
    "graph_domain_rank_stored" -> rankSql,
  )

  private lazy val rankSql: String =
    s"""WITH ${DedupQueries.verifiedPairsCtes},
       |$domainEdgeCtes,
       |ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM ec GROUP BY src),
       |e AS MATERIALIZED (SELECT ec.src, ec.dst, ec.w, ow.outw FROM ec JOIN ow USING (src)),
       |nodes AS MATERIALIZED (SELECT DISTINCT source AS node FROM documents),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       |inw AS (SELECT dst AS node, CAST(sum(w) AS BIGINT) AS dup_w
       |        FROM ec GROUP BY dst),
       |$rankCtes
       |SELECT r$Iters.node AS source, r$Iters.r AS rank_micro,
       |  round(CAST(r$Iters.r AS DOUBLE) / $Scale.0, 6) AS rank_score,
       |  coalesce(inw.dup_w, CAST(0 AS BIGINT)) AS dup_w
       |FROM r$Iters LEFT JOIN inw ON r$Iters.node = inw.node
       |ORDER BY source""".stripMargin
}
