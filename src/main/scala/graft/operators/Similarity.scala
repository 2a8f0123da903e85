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

  /** IVF-bucketed ANN: centroids = the embeddings of `centroidIds` (a cheap
    * deterministic stand-in for k-means at this stage); every corpus vector
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
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    require(cents.nonEmpty, "no centroid vectors found")
    val centArr = array(cents.map { case (id, v) =>
      struct(lit(id).as("cid"), array(v.map(lit): _*).as("cvec"))
    }: _*)

    def bucketsOf(vec: org.apache.spark.sql.Column, n: Int) =
      slice(transform(
        array_sort(transform(centArr,
          c => struct((-Vectors.cosine(vec, c("cvec"))).as("negsim"), c("cid").as("cid")))),
        s => s("cid")), 1, n)

    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      sqrt(call_function("norm2_f32", col(vecCol))).as("cn"))
      .withColumn("bucket", bucketsOf(col("cv"), 1)(0))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      sqrt(call_function("norm2_f32", col(vecCol))).as("qn"))
      .withColumn("bucket", explode(bucketsOf(col("qv"), nprobe)))
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
