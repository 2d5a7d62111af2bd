package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Relational operators, batch 8: iterative graph traversal — the
  * recursive-query class (`WITH RECURSIVE` in SQL engines) expressed
  * the way a distributed engine actually runs it: a driver-side loop
  * of keyed joins with per-round lineage truncation, exactly the
  * device the dedup cluster resolvers (p20/p33) already use, applied
  * here to reachability with DISTANCE semantics (BFS min-hops), which
  * connected components cannot express.
  */
object Relational8 {

  /** Depth cap of the registered query — bounds the loop on
    * pathological graphs; the oracle carries the identical `dist < 10`
    * cap so both sides compute the same fixpoint prefix. On this graph
    * BFS exhausts at depth 8, so the cap never binds (the empty
    * frontier exits first — spec-pinned).
    */
  private val MaxHops = 10

  /** The traversal graph: a directed edge u→v for every adjacent event
    * pair where user u produced an `error` and user v produced the
    * next event as a `purchase` — an incident-propagation graph. The
    * adjacency join is keyed on event_id (consecutive ids), with both
    * type filters pushed below the join so each side scans pruned.
    */
  private[graft] def incidentEdges(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val a = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("eid"), col("user_id").as("src"))
    val b = ev.filter(col("event_type") === "purchase")
      .select((col("event_id") - 1).as("eid"), col("user_id").as("dst"))
    a.join(b, "eid").filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct()
  }

  /** BFS min-hop distances from a seed set over an edge frame.
    *
    * Each round is one keyed join (frontier ⋈ edges on src) + one
    * distinct + one anti-join against the visited set — all hash
    * shuffles on node ids, nothing global. `localCheckpoint` truncates
    * lineage every round so round N's plan never replays rounds
    * 1..N−1, and keeps every round's plan shape identical (the p20
    * codegen-cache argument). The loop exits on an empty frontier
    * (one cheap isEmpty action per round — the same driver-side
    * convergence probe the cluster resolvers use); `maxHops` bounds
    * runaway graphs. The frontier is anti-joined BEFORE dist labeling,
    * so a node is labeled exactly once, at its first (= minimum)
    * discovery depth — the BFS invariant, spec-pinned.
    *
    * At 1000-executor scale this is the textbook iterative-frontier
    * BFS: per-round shuffle volume is O(frontier × out-degree), the
    * visited set only ever grows by appending checkpointed blocks, and
    * a giant frontier is just a bigger keyed join — no step depends on
    * the graph fitting anywhere.
    */
  def bfsDistances(edges0: DataFrame, seeds: DataFrame,
                   maxHops: Int): DataFrame = {
    val edges = edges0.localCheckpoint()
    var visited = seeds.select(col("node"), lit(0).as("dist")).localCheckpoint()
    var frontier = visited.select(col("node"))
    var depth = 1
    while (depth <= maxHops && !frontier.isEmpty) {
      val next = frontier.join(edges, col("node") === col("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .localCheckpoint()
      visited = visited.union(next.withColumn("dist", lit(depth)))
        .localCheckpoint()
      frontier = next
      depth += 1
    }
    visited
  }

  /** q63: min-hop reachability from user 0 over the incident graph —
    * (node, dist) for every reachable user, checked against DuckDB's
    * `WITH RECURSIVE` on the identical edge derivation (UNION-dedup
    * recursion + min(dist) roll-up ≡ first-discovery BFS depth).
    */
  def q63Reachability(s: SparkSession, d: String): DataFrame =
    bfsDistances(incidentEdges(s, d),
        s.range(1).select(lit(0L).as("node")), MaxHops)
      .orderBy(col("node"))

  val q63Oracle: String =
    s"""WITH RECURSIVE edges AS (
       |  SELECT DISTINCT a.user_id AS src, b.user_id AS dst
       |  FROM events a JOIN events b ON b.event_id = a.event_id + 1
       |  WHERE a.event_type = 'error' AND b.event_type = 'purchase'
       |    AND a.user_id <> b.user_id),
       |bfs AS (
       |  SELECT CAST(0 AS BIGINT) AS node, 0 AS dist
       |  UNION
       |  SELECT e.dst, bfs.dist + 1
       |  FROM bfs JOIN edges e ON e.src = bfs.node
       |  WHERE bfs.dist < $MaxHops)
       |SELECT node, CAST(min(dist) AS INTEGER) AS dist
       |FROM bfs GROUP BY node ORDER BY node""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q63_reachability" -> (q63Reachability _),
  )

  val oracles: Map[String, String] = Map(
    "q63_reachability" -> q63Oracle,
  )
}
