package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Two paths:
  *
  *  - bruteForce: broadcast the (small) query set against the corpus; exact
  *    cosine; top-k per query via partitioned window. The corpus side streams
  *    — scales to any corpus size as long as the query set broadcasts.
  *  - ivf: IVF-style bucketing — assign every vector to its nearest of K
  *    pre-chosen centroid vectors (a projection), shuffle once on bucket id,
  *    and probe only the query's nearest `nprobe` buckets. Recall < 1,
  *    cost ~ nprobe/K of brute force — the standard scale path.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    * Output: (query_id, rank, neighbor_id, cosine). */
  def bruteForceKnn(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      sqrt(call_function("norm2_f32", col(vecCol))).as("cn"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      sqrt(call_function("norm2_f32", col(vecCol))).as("qn"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", call_function("dot_f32", col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Deterministic mini k-means for IVF centroids: init = the `k` vectors
    * with smallest ids, then `iters` Lloyd rounds (assign by cosine, mean
    * per bucket). Each round is one argmax projection + one
    * posexplode-groupBy (k×dim rows collected — bounded by model size, not
    * data). Deterministic: no sampling, fixed init, fixed iteration count. */
  def kmeansCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 3): Array[Array[Float]] = {
    import corpus.sparkSession.implicits._
    var cents: Array[Array[Float]] = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .orderBy("id").limit(k)
      .as[(Long, Seq[Float])].collect().map(_._2.toArray)
    val assignUdf = (cs: Array[Array[Float]]) => udf { (v: Seq[Float]) =>
      var best = 0
      var bestSim = Double.MinValue
      var c = 0
      while (c < cs.length) {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var j = 0
        val n = math.min(v.length, cs(c).length)
        while (j < n) {
          dot += v(j).toDouble * cs(c)(j); na += v(j).toDouble * v(j); nb += cs(c)(j).toDouble * cs(c)(j)
          j += 1
        }
        val sim = if (na == 0 || nb == 0) -2.0 else dot / math.sqrt(na * nb)
        if (sim > bestSim) { bestSim = sim; best = c }
        c += 1
      }
      best
    }
    for (_ <- 1 to iters) {
      val assigned = corpus.select(col(vecCol).as("v"))
        .withColumn("b", assignUdf(cents)(col("v")))
      val sums = assigned
        .select(col("b"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("b", "pos")
        .agg(sum(col("x").cast("double")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      sums.groupBy(_.getInt(0)).foreach { case (b, rows) =>
        rows.foreach { r =>
          next(b)(r.getInt(1)) = (r.getDouble(2) / r.getLong(3)).toFloat
        }
      }
      cents = next
    }
    cents
  }

  /** IVF-bucketed ANN: centroids = the embeddings of `centroidIds` (a cheap
    * deterministic stand-in; use [[kmeansCentroids]]+[[ivfKnnWithCentroids]]
    * for trained buckets); every corpus vector
    * is assigned to its nearest centroid (argmax cosine — pure projection,
    * no shuffle); queries probe their `nprobe` nearest centroid buckets only.
    * Output: (query_id, rank, neighbor_id, cosine) — approximate. */
  def ivfKnn(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroidIds: Seq[Long],
      nprobe: Int = 2): DataFrame = {
    val cents = corpus
      .where(col(idCol).isin(centroidIds: _*))
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_vec"))
      .collect()
      .map(r => r.getSeq[Float](1).toArray)
    require(cents.nonEmpty, "no centroid vectors found")
    ivfKnnWithCentroids(corpus, queries, idCol, vecCol, k, cents, nprobe)
  }

  /** IVF search against explicit centroid vectors (bucket id = index) —
    * pair with [[kmeansCentroids]] for trained buckets. */
  def ivfKnnWithCentroids(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroids: Array[Array[Float]],
      nprobe: Int = 2): DataFrame = {
    // Compiled assignment kernel: one JVM call per row against the captured
    // centroid model (round-1 lesson: nested HOF argmax is interpreted and
    // was the IVF hot-spot).
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      sqrt(call_function("norm2_f32", col(vecCol))).as("cn"))
      .withColumn("bucket", Vectors.nearestCentroids(centroids, 1)(col("cv"))(0))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      sqrt(call_function("norm2_f32", col(vecCol))).as("qn"))
      .withColumn("bucket", explode(Vectors.nearestCentroids(centroids, nprobe)(col("qv"))))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", call_function("dot_f32", col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }
}
