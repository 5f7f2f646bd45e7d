package graft

import org.apache.spark.sql.functions._

/** Decode-once composition for the image family (r13 verdict item 6):
  * [[graft.ops.Multimodal.decodedPlanes]] is the shared decode stage;
  * both consumers must be bit-identical whether they run their own
  * lazy decode (the independent per-query gate shape) or read a
  * PERSISTED plane relation (the production decode-once shape). */
class SharedDecodeSpec extends SparkSpec {

  test("histogram and phash are bit-identical from a persisted shared decode") {
    val independentHist = graft.ops.Multimodal.imageHistogram(spark, sf0001)
      .collect().toSeq
    val independentPhash = graft.ops.Multimodal.phashDedup(spark, sf0001)
      .collect().toSeq
    Caches.releaseAll(); spark.catalog.clearCache()

    val planes = Caches.persistTracked(
      graft.ops.Multimodal.decodedPlanes(spark, sf0001))
    planes.count() // materialize: the decode runs exactly once here
    val sharedHist = graft.ops.Multimodal.imageHistogramFrom(spark, planes)
      .collect().toSeq
    val sharedPhash = graft.ops.Multimodal.phashDedupFrom(spark, planes)
      .collect().toSeq
    assert(sharedHist == independentHist)
    assert(sharedPhash == independentPhash)
    Caches.releaseAll(); spark.catalog.clearCache()
  }
}
