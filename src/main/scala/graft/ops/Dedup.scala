package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operator family for a training-data pipeline: exact
  * (content hash), n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design (SURVEY.md §5): signatures (minhash/simhash) are pure
  * map-side array expressions — one projection over the scan, no
  * explode-shuffle per hash function. The only wide operations are the
  * candidate-generation joins, which shuffle on (shingle) or
  * (band, bucket) keys — exactly the joins you want at 100 TB because
  * their fan-in is bounded by collision rate, not corpus size.
  *
  * Hashing is engine-portable: H(s) = first 15 hex digits of md5(s) as
  * a 60-bit integer — bit-identical in Spark (`conv`) and DuckDB
  * (`::BIGINT` on a 0x literal), so even the sketch ops hash-match the
  * oracle.
  */
object Dedup {
  /** 60-bit portable content hash of a string expression (SQL fragment). */
  private def h60(s: String): String =
    s"CAST(conv(substr(md5($s), 1, 15), 16, 10) AS BIGINT)"

  /** distinct 3-token shingles of `text` as an array column (SQL). */
  private val shinglesSql =
    raw"""array_distinct(
      CASE WHEN size(regexp_extract_all(text, '\\S+', 0)) >= 3 THEN
        transform(
          sequence(0, size(regexp_extract_all(text, '\\S+', 0)) - 3),
          i -> concat(regexp_extract_all(text, '\\S+', 0)[i], ' ',
                      regexp_extract_all(text, '\\S+', 0)[i+1], ' ',
                      regexp_extract_all(text, '\\S+', 0)[i+2]))
      ELSE array(text) END)"""

  private def withShingles(df: DataFrame): DataFrame =
    df.select(col("doc_id"), expr(shinglesSql).as("shingles"))

  /** Exact dedup via content-hash groupBy. The corpus is doubled
    * (doc_id+100000) so the dedup actually collapses something: keep the
    * minimum doc_id per content hash, count copies. */
  def exact(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val doubled = docs.unionAll(
      docs.select((col("doc_id") + 100000).as("doc_id"), col("text")))
    doubled
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_doc_id"))
  }

  /** n-gram Jaccard near-dup pairs: explode distinct 3-token shingles,
    * self-join on shingle (the shuffle key), count common, Jaccard =
    * |∩| / (|A|+|B|-|∩|), threshold 0.8. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = withShingles(Tables.documents(spark, dir))
      .select(col("doc_id"), explode(col("shingles")).as("s"))
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    common
      .join(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(col("c").cast("double") / (col("na") + col("nb") - col("c")), 6).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** MinHash signatures (k=16, h_i(s) = (a_i·H(s) mod p + b_i) mod p)
    * computed as one map-side array expression, then LSH banding
    * (4 bands × 4 rows): docs sharing any band bucket are candidate
    * pairs. The band join is the only shuffle. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sigSql =
      s"""transform(sequence(0, 15), i ->
            array_min(transform(shingles, s ->
              ((1 + 2*i) * (${h60("s")} % 2147483647) + 7 + 11*i) % 2147483647)))"""
    val sig = withShingles(Tables.documents(spark, dir))
      .select(col("doc_id"), expr(sigSql).as("sig"))
    val bands = sig.select(col("doc_id"),
        explode(expr(
          """transform(sequence(0, 3), j ->
               struct(j AS band, md5(concat_ws(',', sig[4*j], sig[4*j+1], sig[4*j+2], sig[4*j+3])) AS bkey))"""))
          .as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bkey").as("bkey"))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 60-bit SimHash per doc (map-side nested fold over distinct tokens),
    * then near-dup pairs by Hamming distance ≤ 2 (the testdata vocabulary is tiny, so token-set simhashes are close; real corpora use a larger radius). Pairing here is a
    * self-join restricted by doc_id order; at 100 TB you'd band the
    * simhash into 4×15-bit chunks first (same LSH shape as minhash). */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val simSql =
      s"""aggregate(sequence(0, 59), CAST(0 AS BIGINT), (acc, j) ->
            acc + CASE WHEN aggregate(toks, 0, (a2, s) ->
                a2 + CASE WHEN shiftright(${h60("s")}, j) % 2 = 1 THEN 1 ELSE -1 END) > 0
              THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END)"""
    val sim = Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr(raw"array_distinct(regexp_extract_all(text, '\\S+', 0))").as("toks"))
      .select(col("doc_id"), expr(simSql).as("sim"))
    sim.as("a").join(sim.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 2)
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
