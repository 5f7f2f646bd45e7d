package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-pinned loaders for the driver-generated testdata tables.
  *
  * Reads go through `spark.read.parquet` so Catalyst handles column
  * pruning + predicate pushdown; callers select only what they need.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Timestamp literal cast to the actual type of `column` in `df` —
    * the testdata timestamps may surface as TIMESTAMP_NTZ (parquet
    * isAdjustedToUTC=false) and Spark refuses NTZ↔LTZ comparisons. */
  def tsLit(df: DataFrame, column: String, value: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.lit(value).cast(df.schema(column).dataType)

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` has shipped as both parquet INT64 TIMESTAMP(NANOS,false)
    * (which Spark only reads via `nanosAsLong`, as a raw Long) and as
    * plain TIMESTAMP(MICROS) / TIMESTAMP_NTZ. Branch on the surfaced
    * type — rebuild a micros timestamp only when the column arrives as
    * a Long (integer division: float division would lose precision
    * above 2^53 ns) — then normalize to TIMESTAMP (ltz): every
    * consumer (`unix_micros`, window frames, the DuckDB oracles) was
    * proven against that type, and with the UTC session timezone the
    * NTZ→LTZ cast is value-identical. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    val rebuilt = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn(
          "ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case _ => df
    }
    rebuilt.withColumn("ts",
      org.apache.spark.sql.functions.col("ts")
        .cast(org.apache.spark.sql.types.TimestampType))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view (plus the graft_* native
    * functions), so `spark.sql` works directly against the dataset —
    * the raw-SQL entry point a reference user expects alongside the
    * DataFrame API. `events` goes through its nanos-safe loader. */
  def registerAll(s: SparkSession, d: String): Unit = {
    graft.functions.GraftFunctions.register(s)
    all.foreach { name =>
      val df = if (name == "events") events(s, d) else load(s, d, name)
      df.createOrReplaceTempView(name)
    }
  }
}
