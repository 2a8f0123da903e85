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
}
