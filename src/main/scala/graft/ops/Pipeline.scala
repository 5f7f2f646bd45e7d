package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Composed corpus-curation pipeline — the C4-style filter chain every
  * LLM training-data build runs (quality gate → language gate →
  * near-dup canonicalization), expressed as ONE DataFrame plan over
  * the individual operators. Demonstrates that the operator family
  * composes: each stage is the already-oracle-checked op, the gates
  * are plain filters, and the duplicate drop is a left_anti against
  * the clustering's non-canonical members — so the whole chain stays
  * declarative and Catalyst plans it end-to-end (filters collapse into
  * the shared documents scan; no staging tables between stages).
  *
  * At 100 TB each stage keeps its own scale story (map-side scoring,
  * LSH pair generation, contraction clustering); the composition adds
  * two joins on doc_id — the natural partitioning key for all of them.
  */
object Pipeline {
  def corpusFilter(spark: SparkSession, dir: String): DataFrame = {
    val quality = TextAnalysis.quality(spark, dir)
      .select(col("doc_id"), col("quality_score"))
    val lang = TextAnalysis.langid(spark, dir)
      .select(col("doc_id"), col("predicted_lang"))
    // near-dup clustering keeps one canonical doc (the component min)
    // per duplicate group; every other member is dropped
    val nonCanonical = Dedup.components(spark, dir)
      .filter(col("doc_id") =!= col("component"))
      .select(col("doc_id"))
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(quality, "doc_id")
      .filter(col("quality_score") >= 0.3)
      .join(lang, "doc_id")
      .filter(col("predicted_lang") === "en")
      .join(nonCanonical, Seq("doc_id"), "left_anti")
      .orderBy(col("doc_id"))
  }
}
