package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over similarity/duplicate edge lists (the graphs this
  * engine already builds: MinHash near-dup pairs, SemDeDup cosine pairs —
  * see [[Dedup]]). Connected components live in [[Dedup]]; this adds the
  * triangle census, the standard density/clustering signal on a dup graph
  * (a triangle = three mutually-similar documents, the unit of "cluster
  * cohesion" that pair counts miss).
  */
object Graphs {

  /** Per-node triangle participation counts over an undirected edge list
    * (`aCol` < `bCol`, deduplicated). Returns (node, n_tri) for nodes in
    * at least one triangle.
    *
    * Uses the degree-ordered orientation (Suri–Vassilvitskii "Counting
    * Triangles and the Curse of the Last Reducer", WWW'11): orient every
    * edge from its lower-(degree, id) endpoint to the higher one, join
    * wedges u→v→w against oriented edge u→w. Each triangle is found
    * EXACTLY once, and the wedge fan-out per node is bounded by its
    * OUT-degree, which orientation caps at O(√|E|) even for hub nodes —
    * the property that keeps the shuffle finite on a power-law dup graph
    * at 100 TB (an unoriented wedge join explodes quadratically on the
    * biggest dup cluster). Three shuffles total: degree agg, wedge join,
    * closing join.
    */
  def triangleCounts(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .where(col("a") < col("b")).distinct().localCheckpoint(true)
    val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    // orient: u = endpoint with smaller (d, id), w = the other
    val withDeg = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        col("a")).otherwise(col("b")).as("u"),
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        col("b")).otherwise(col("a")).as("w"))
      .localCheckpoint(true) // feeds three join sides below
    // wedges u→v, v→w closed by u→w
    val tri = oriented.select(col("u"), col("w").as("v"))
      .join(oriented.select(col("u").as("v"), col("w")), "v")
      .join(oriented, Seq("u", "w"))
      .select(col("u"), col("v"), col("w"))
    tri.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }

  /** FIXED-POINT PageRank over a directed edge list — `rounds` power
    * iterations kept EXACT-integer so the result is deterministic
    * cross-engine (and hence oracle-checkable, unlike float PR whose sum
    * order drifts): scores live in parts-per-10¹², every division is a
    * truncating `div`, and each round is
    *
    *   p'(v) = (15 · (10¹² div n)) div 100
    *         + (85 · Σ_{u→v} (p(u) div outdeg(u))) div 100
    *
    * — the standard d=0.85 damping with the float ops replaced by integer
    * ones (mass leaks a few units per division; acceptable and, crucially,
    * IDENTICAL on every engine).
    *
    * PRECONDITION: every node has outdegree ≥ 1 (no dangling mass
    * redistribution is modeled — close the graph first, e.g. with
    * self-loops or hub edges, as q224's chain∪star construction does).
    *
    * Scale shape per round: one (p÷deg)-projection join on src (both sides
    * node-keyed), one dst-keyed partial agg, one node-keyed left join —
    * all standard shuffles on the node/edge domain; nothing driver-side.
    * Returns (id, pr_ppt) for every node. */
  def pageRankFixedPoint(
      edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int = 3): DataFrame = {
    require(rounds >= 1 && rounds <= 20, s"rounds $rounds out of range 1..20")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().localCheckpoint(true)
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("__deg"))
    val nRow = nodes.agg(count(lit(1)).as("__n"))
    // __n rides every row (a 1-row broadcast) so the per-round base term
    // needs no further joins
    var p = nodes.crossJoin(broadcast(nRow))
      .select(col("id"), expr("1000000000000L div __n").as("p"), col("__n"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val contrib = e
        .join(p.join(deg, "id").select(col("id").as("src"),
          expr("p div __deg").as("__c")), "src")
        .groupBy(col("dst")).agg(sum(col("__c")).as("__con"))
      p = p.join(contrib, p("id") === contrib("dst"), "left_outer")
        .select(col("id"),
          expr("(15L * (1000000000000L div __n)) div 100 + " +
               "(85L * coalesce(__con, 0L)) div 100").as("p"),
          col("__n"))
        .localCheckpoint(true)
    }
    p.select(col("id"), col("p").as("pr_ppt"))
  }

  /** k-CORE membership: the maximal subgraph in which every node keeps
    * degree ≥ k — the standard dense-cluster detector over a similarity
    * graph (template farms / bot rings survive the peel; incidental near-dup
    * pairs don't). Iterative peel: each round drops EVERY node whose current
    * degree is < k at once, so the round count is bounded by the graph's
    * degeneracy ordering depth (small for near-dup graphs), not the node
    * count. Per round: one degree agg + two semi-joins + a checkpoint —
    * all key-parallel, the components/Lloyd iteration discipline. The peel
    * is idempotent at the fixed point, which is what lets the SQL oracle
    * replay it as a fixed unrolled round ladder (extra rounds are no-ops).
    * Output: (id, core_degree) for every member of the k-core. */
  def kCore(
      edges: DataFrame, aCol: String, bCol: String,
      k: Int, maxIter: Int = 30): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    var e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
      .union(edges.select(col(bCol).as("a"), col(aCol).as("b")))
      .distinct().localCheckpoint(true)
    var n = e.count()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val keep = e.groupBy(col("a")).agg(count(lit(1)).as("__d"))
        .where(col("__d") >= k)
        .select(col("a").as("__k"))
        .localCheckpoint(true) // both semi-joins below read it
      val e2 = e
        .join(keep.select(col("__k").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("__k").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint(true)
      val n2 = e2.count()
      converged = n2 == n // dropping nodes only removes edges — stable count
      e = e2
      n = n2
      i += 1
    }
    if (sys.env.contains("SPARK_GRAFT_DEBUG_COMPONENTS"))
      System.err.println(s"[kCore] converged after $i rounds")
    require(converged,
      s"kCore did not converge in $maxIter peel rounds — the graph's " +
        "degeneracy ladder is implausibly deep; suspect a data bug first")
    e.groupBy(col("a").as("id")).agg(count(lit(1)).as("core_degree"))
  }
}
