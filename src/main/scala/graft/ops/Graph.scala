package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Graph analytics over relationships mined from the corpus — the
  * companion family to [[Dedup.components]] (connected components):
  * weighted PageRank with a FIXED iteration count, evaluated entirely in
  * scaled 64-bit integer arithmetic so each iteration is a closed-form
  * SQL expression and the result hash-matches an external oracle — no
  * float accumulation, no convergence nondeterminism.
  *
  * Scale shape per iteration: one equi-join of the edge list with the
  * current rank vector (keyed by source node) and one hash aggregate
  * (keyed by destination) — edge-linear shuffle volume, node-linear
  * state, identical plan every iteration. The iteration count is a
  * static plan parameter (2 here — enough to rank hubs), not a
  * convergence loop: at 100 TB you run the same plan with checkpointed
  * rank tables between iterations.
  */
object Graph {

  /** Above this many vertices the rank / degree / contribution tables
    * stop being broadcast-sized (1e8–1e9-node web graphs × 16 B of rank
    * state exceed driver and executor memory) and every node-side join
    * switches to a partitioned shuffle-hash join. The fixture graphs sit
    * far below it, so their plans keep the broadcast; PlanGuardSpec
    * pins both shapes. */
  val BroadcastNodeLimit: Long = 2L * 1000 * 1000

  /** Metadata-cheap vertex upper bound: the part table's parquet row
    * count (vertices are part keys, so the FK parent bounds them);
    * when no part table exists (synthetic graph fixtures), the
    * lineitem row count — looser but still a sound upper bound. */
  private def nodeUpperBound(spark: SparkSession, dir: String): Long =
    try Tables.part(spark, dir).count()
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        Tables.lineitem(spark, dir).count()
    }

  /** Join `big` against a NODE-sized table: broadcast below the vertex
    * threshold, shuffle-hash (hash the node table per partition, never
    * sort the big stream) above it. */
  private def nodeJoin(big: DataFrame, nodeSide: DataFrame, keys: Seq[String],
                       large: Boolean, joinType: String = "inner"): DataFrame =
    if (large) big.join(nodeSide.hint("shuffle_hash"), keys, joinType)
    else big.join(broadcast(nodeSide), keys, joinType)

  /** One PageRank step in integer micro-units (1e6 = rank 1.0), damping
    * 0.85 as the exact rational 85/100: contribution of edge (u,v) is
    * `(r(u) · w(u,v)) div out(u)` (floor per edge — the same order of
    * operations the oracle evaluates), and
    * `r'(v) = 150000 + (85 · Σ contrib) div 100`. Dangling mass is
    * dropped (simplified PR) — identically on both engines. */
  private def step(nodes: DataFrame, edges: DataFrame, r: DataFrame,
                   large: Boolean): DataFrame = {
    // the rank vector and the contribution sums are NODE-sized (bounded
    // by vertex count, not edges) — below the threshold broadcast both
    // so the edge table is never shuffled for a join; above it both
    // joins become partitioned (node-keyed) shuffle-hash joins
    val contribs = nodeJoin(edges,
      r.withColumnRenamed("p", "u").withColumnRenamed("r", "ru"),
      Seq("u"), large)
      .select(col("v"), expr("(ru * w) div outw").as("c"))
      .groupBy(col("v")).agg(sum(col("c")).as("s"))
    val joined =
      if (large)
        nodes.join(contribs.hint("shuffle_hash"),
          nodes("p") === contribs("v"), "left")
      else
        nodes.join(broadcast(contribs), nodes("p") === contribs("v"), "left")
    joined.select(col("p"),
      (lit(150000L) + expr("(85 * coalesce(s, 0L)) div 100")).as("r"))
  }

  /** Weighted PageRank (2 iterations) over an edge list (u, v, w) with
    * per-source out-weights pre-joined; `nodes` carries every vertex so
    * sinks keep their base rank. `largeGraph` selects the partitioned
    * join shape (None = count the vertices once and compare against
    * [[BroadcastNodeLimit]]). */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int = 2,
               largeGraph: Option[Boolean] = None,
               nodeCountHint: Option[Long] = None): DataFrame = {
    import graft.core.Caches.TrackedDataset
    val n = nodes.trackPersist()
    // the threshold needs only an ORDER OF MAGNITUDE: callers pass a
    // metadata-cheap UPPER BOUND (overestimating selects the
    // partitioned shape — the safe direction at scale) so no extra
    // distinct-count job runs; with neither hint the exact count runs
    val large = largeGraph.getOrElse(
      nodeCountHint.getOrElse(n.count()) > BroadcastNodeLimit)
    // persist the aggregated edge list BEFORE deriving out-weights
    // (round-14 opt): `out` is edge-derived, so without this cut the
    // whole pair-expansion + (u,v) aggregate subtree executed twice in
    // the e-build job — once under the broadcast out-weight build and
    // once on the stream side (2 Generate nodes in the plan, 0
    // ReusedExchange). Edge-sized cache, same size class as `e` below.
    val eg = edges.trackPersist()
    // the out-weight table is node-sized too — same threshold rule
    val out = eg.groupBy(col("u")).agg(sum(col("w")).as("outw"))
    // every iteration re-reads the edge table — persist the built graph
    // once instead of re-running the self-join+aggregate subtree per step
    val e = nodeJoin(eg, out, Seq("u"), large).trackPersist()
    val r0 = n.select(col("p"), lit(1000000L).as("r"))
    (1 to iters).foldLeft(r0)((r, _) => step(n, e, r, large))
  }

  /** Product-importance query: PageRank over the co-purchase graph —
    * parts are nodes, edge weight = number of orders where both parts
    * appear. The order-local self-join co-partitions on l_orderkey
    * (per-order fanout is bounded by lines-per-order, so pair volume is
    * order-linear), and the graph build is two hash aggregates. */
  def partPageRank(spark: SparkSession, dir: String,
                   largeGraph: Option[Boolean] = None): DataFrame = {
    import graft.core.Caches.TrackedDataset
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .trackPersist() // pair build + node list
    // order-local pairs WITHOUT a self-join: one aggregate gathers each
    // order's (bounded, lines-per-order) part list, then an array kernel
    // expands the ordered pairs — value-identical to the equi-self-join
    // (pairing excludes equal VALUES, multiplicities multiply through),
    // but it costs one shuffle instead of two sorted join sides. The
    // oracle keeps the join spelling; results match by construction.
    val pairs = li.groupBy(col("ok")).agg(collect_list(col("p")).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, x -> " +
          "transform(filter(ps, y -> y != x), y -> struct(x AS u, y AS v))))"))
        .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val edges = pairs.groupBy(col("u"), col("v")).agg(count(lit(1)).as("w"))
    val nodes = li.select(col("p")).distinct()
    // node-count upper bound from parquet metadata (part keys are a
    // subset of part rows; fall back to the lineitem row count — a
    // looser but still sound bound — when no part table exists) so no
    // distinct-count job runs just to pick a join strategy
    val hint = largeGraph match {
      case Some(_) => None
      case None => Some(nodeUpperBound(spark, dir))
    }
    pageRank(nodes, edges, largeGraph = largeGraph, nodeCountHint = hint)
      .select(col("p").as("part_key"), col("r").as("rank"))
  }

  /** Per-part triangle counts on the UNWEIGHTED co-purchase graph (parts
    * are adjacent iff some order contains both) — the local clustering
    * signal that separates parts bought in cohesive bundles from parts
    * that merely co-occur with everything.
    *
    * The implementation is the degree-ordered node-iterator: orient each
    * undirected edge from its lower-(degree, id) endpoint, enumerate
    * wedges only between OUT-neighbors, and close them against the
    * oriented edge set. Under this orientation every out-degree is
    * O(√m), so wedge volume is O(m^1.5) regardless of hub skew — the
    * textbook bound that makes triangle counting survive power-law
    * graphs, where the naive u<v wedge join explodes on hubs. Both joins
    * are equi-joins (one on the apex, one on the closing edge); each
    * triangle is produced exactly once (its orientation-minimum vertex is
    * the unique apex with out-edges to the other two). The oracle spells
    * the naive canonical 3-way self-join — an independent algorithm
    * arriving at the same counts. */
  def triangles(spark: SparkSession, dir: String,
                largeGraph: Option[Boolean] = None): DataFrame = {
    import graft.core.Caches.TrackedDataset
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
    // canonical undirected edges (u < v), distinct across orders; the
    // per-order pair build reuses the order-local array-expansion shape
    // of partPageRank (collect_set bounds fanout by lines-per-order)
    val und = li.groupBy(col("ok")).agg(collect_set(col("p")).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, x -> " +
          "transform(filter(ps, y -> y > x), y -> struct(x AS u, y AS v))))"))
        .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .distinct()
      .trackPersist() // feeds the degree union AND the orientation join —
                      // unpersisted, the whole pair-build pipeline (scan +
                      // 2 shuffles) replays once per consumer
    // degree table is NODE-sized (the same size class PageRank's rank
    // vector is in): broadcast below the vertex threshold, partitioned
    // shuffle-hash above it — at web-graph grain the degree table
    // exceeds broadcast memory
    val deg = und.select(col("u").as("p"))
      .union(und.select(col("v").as("p")))
      .groupBy(col("p")).agg(count(lit(1)).as("deg"))
      .trackPersist() // joined twice (orientation u- and v-sides)
    // metadata-cheap node upper bound (vertices are part keys) — the
    // threshold needs only the order of magnitude, and overestimating
    // picks the partitioned shape, the safe direction at scale
    val large = largeGraph.getOrElse(
      nodeUpperBound(spark, dir) > BroadcastNodeLimit)
    // orient low→high in the (deg, id) total order, keeping the OUT
    // endpoint's order key (db) so the wedge join can order out-neighbors
    // without another degree lookup
    val oriented = nodeJoin(nodeJoin(und,
        deg.select(col("p").as("u"), col("deg").as("du")), Seq("u"), large),
        deg.select(col("p").as("v"), col("deg").as("dv")), Seq("v"), large)
      .select(when(col("du") < col("dv") ||
                   (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("a"), col("v").as("b"), col("dv").as("db")))
        .otherwise(struct(col("v").as("a"), col("u").as("b"), col("du").as("db"))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"), col("e.db").as("db"))
      .trackPersist() // wedge self-join + closing probe read it twice
    // out-neighbor pairs ORDERED by the same (deg, id) total order the
    // orientation uses: each unordered {b, c} wedge is enumerated once
    // (half the naive b≠c volume), and the closing edge — if it exists —
    // is necessarily oriented b→c, so one equi-probe decides it
    val apexSide = oriented.select(col("a"), col("b").as("c"), col("db").as("dc"))
    // the apex self-join hashes the edge-sized build side per partition
    // at EVERY scale (round-14 opt: the unhinted branch planned a
    // SortMergeJoin here — two sorts of the edge table for nothing;
    // broadcast variants were measured SLOWER locally: the driver-serial
    // broadcast build of the edge table costs more than the partitioned
    // exchange it saves, see OPTIMIZATION_r14.md)
    val wedges = oriented.as("x")
      .join(apexSide.hint("shuffle_hash").as("y"), Seq("a"))
      .filter(col("db") < col("dc") ||
              (col("db") === col("dc") && col("b") < col("c")))
      .select(col("a"), col("b"), col("c"))
    // close the wedge with a SHUFFLE-HASH probe: the wedge stream is the
    // big side (O(m^1.5) rows) and must not be sorted — hash the
    // edge-sized build side per partition instead of sort-merging
    val tris = wedges.join(
      oriented.select(col("a").as("b"), col("b").as("c")).hint("shuffle_hash"),
      Seq("b", "c"))
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("part_key"))
      .groupBy(col("part_key"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  val trianglesOracle: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
      |e AS (
      |  SELECT DISTINCT a.p AS u, b.p AS v
      |  FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
      |tri AS (
      |  SELECT e1.u AS x, e1.v AS y, e2.v AS z
      |  FROM e e1
      |  JOIN e e2 ON e2.u = e1.v
      |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
      |n AS (
      |  SELECT x AS part_key FROM tri
      |  UNION ALL SELECT y FROM tri
      |  UNION ALL SELECT z FROM tri)
      |SELECT part_key, CAST(count(*) AS BIGINT) AS n_triangles
      |FROM n GROUP BY 1
      |""".stripMargin

  val partPageRankOracle: String =
    """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS p FROM lineitem),
      |e0 AS (
      |  SELECT a.p AS u, b.p AS v
      |  FROM li a JOIN li b ON a.ok = b.ok AND a.p <> b.p),
      |edges AS (
      |  SELECT u, v, CAST(count(*) AS BIGINT) AS w FROM e0 GROUP BY 1, 2),
      |outd AS (SELECT u, CAST(sum(w) AS BIGINT) AS outw FROM edges GROUP BY 1),
      |e AS (SELECT edges.u, v, w, outw FROM edges JOIN outd USING (u)),
      |nodes AS (SELECT DISTINCT p FROM li),
      |r0 AS (SELECT p, CAST(1000000 AS BIGINT) AS r FROM nodes),
      |c1 AS (
      |  SELECT v, CAST(sum((r * w) // outw) AS BIGINT) AS s
      |  FROM e JOIN r0 ON r0.p = e.u GROUP BY 1),
      |r1 AS (
      |  SELECT p, CAST(150000 + (85 * coalesce(s, 0)) // 100 AS BIGINT) AS r
      |  FROM nodes LEFT JOIN c1 ON p = v),
      |c2 AS (
      |  SELECT v, CAST(sum((r * w) // outw) AS BIGINT) AS s
      |  FROM e JOIN r1 ON r1.p = e.u GROUP BY 1),
      |r2 AS (
      |  SELECT p, CAST(150000 + (85 * coalesce(s, 0)) // 100 AS BIGINT) AS r
      |  FROM nodes LEFT JOIN c2 ON p = v)
      |SELECT p AS part_key, r AS rank FROM r2
      |""".stripMargin
}
