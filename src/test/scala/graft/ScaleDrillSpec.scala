package graft

/** CI leg of the empirical scale drill ([[ScaleDrill]]): the same
  * amplify-and-run code the committed SCALE_DRILL.json record uses at
  * sf0.1×20, exercised here at sf0.01×4 on the shared local[4] session —
  * small enough for the suite, large enough that a quadratic blowup or a
  * single-partition global window in any of the 10 kernels still shows.
  */
class ScaleDrillSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.01"

  test("all drill kernels complete at 4x amplification, no global-window flags") {
    val results = ScaleDrill.runAll(spark, dir, x = 4)
    assert(results.map(_.name) === Seq(
      "lsh_pairs", "components", "kcore", "group_kfold", "ordered_fill",
      "ordered_rank", "ordered_rank_str", "ivfpq_probe", "ivf_sampled_probe",
      "bm25", "interval_coverage", "distinctive_terms",
      "pagerank", "token_packing", "bigram_nll",
      "asof_join", "resample_uniform", "chunk_while",
      "containment_pairs", "containment_prune", "containment_capped",
      "decontamination",
      "lsh_index_publish", "lsh_index_append", "lsh_index_probe",
      "ivf_index_publish", "ivf_index_append", "ivf_index_probe",
      "pq_index_publish", "pq_index_append", "pq_index_compact", "pq_index_probe",
      "stream_state_rocksdb", "stream_neardup_keyed"))
    val st = results.find(_.name === "stream_state_rocksdb").get
    assert(st.extras.getOrElse("state_rows_peak", 0L) > 0, "no state-store rows recorded")
    assert(st.extras.getOrElse("batches", 0L) >= 2, "drill stream must span micro-batches")
    val nd = results.find(_.name === "stream_neardup_keyed").get
    assert(nd.extras.getOrElse("state_rows_peak", 0L) > 0, "no claim-cell state recorded")
    assert(nd.extras.getOrElse("batches", 0L) === 4L, "near-dup drill must span 4 batches")
    assert(nd.extras.contains("batch_ms_3"), "per-batch timings missing")
    // publishes/compactions report rows=0 by design (setup-cost records,
    // not results)
    val zeroRowOk = Set("lsh_index_publish", "ivf_index_publish",
      "pq_index_publish", "pq_index_compact")
    results.foreach { r =>
      assert(r.rows > 0 || zeroRowOk(r.name), s"${r.name}: empty result")
      assert(r.flags.isEmpty,
        s"${r.name}: unexpected unpartitioned window(s): ${r.flags.mkString("; ")}")
      // generous wall budget on 4 test cores — catches complexity blowups
      // (a kernel gone quadratic at 4x), not scheduler jitter
      assert(r.sec < 90.0, s"${r.name}: ${r.sec}s exceeds the 90s drill budget")
    }
  }

  test("amplified documents are exactly x independent copies of the base graph") {
    // replica vocabularies are disjoint, so the pair list must be exactly
    // x stacked copies of the base pair list (modulo the id salting)
    val basePairs = operators.Dedup
      .minhashLshPortable(Tables(spark, dir, "documents"), "doc_id", "text")
      .count()
    val ampPairs = operators.Dedup
      .minhashLshPortable(ScaleDrill.amplifyDocs(spark, dir, 3), "doc_id", "text")
      .count()
    assert(ampPairs === 3 * basePairs)
  }

  test("amplified ids are unique") {
    val docs = ScaleDrill.amplifyDocs(spark, dir, 3)
    assert(docs.count() === docs.select("doc_id").distinct().count())
    val li = ScaleDrill.amplifyLineitemSeries(spark, dir, 3)
    assert(li.count() === li.select("k").distinct().count())
  }
}
