package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Query-level gate for the HIERARCHICAL kernel path. The DuckDB
  * oracle fixtures carry only 10 labels, so every oracle-gated run
  * routes through the FLAT CellIndex scan (< 64 cells) —
  * [[VectorKernelsSpec]] proves the hierarchy exact at the kernel
  * level, and this spec closes the remaining gap by running whole
  * trained-IVF QUERIES over a synthetic 100-label corpus (hierarchy
  * active end to end) against window-based references computed with
  * plain Spark ops. */
class HierarchicalRouteQuerySpec extends SparkSpec {

  /** 700 vectors, 100 labels, 16 dims — deterministic, clustered
    * around per-label anchors so cells are meaningful; written in the
    * testdata embeddings schema (vec_id long, label int,
    * embedding array<float>). */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("hier_route").toString
    val rows = (0 until 700).map { i =>
      val label = i % 100
      var s = (i * 2654435761L) ^ 0x5DEECE66DL
      def nxt(): Float = {
        s = s * 6364136223846793005L + 1442695040888963407L
        (((s >>> 11).toDouble / (1L << 53).toDouble) * 0.4 - 0.2).toFloat
      }
      val anchor = Array.tabulate(16)(j =>
        math.sin(label * 16 + j).toFloat)
      (i.toLong, label, anchor.map(a => a + nxt()).toSeq)
    }
    import spark.implicits._
    rows.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("sphericalKmeans over 100 labels matches the crossJoin+window reference") {
    val got = graft.ops.Similarity.sphericalKmeans(spark, dir).collect().toSeq
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(expr(
        "aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (a, z) -> a + z)")))
      .select(col("vec_id"), col("label"),
        expr("transform(v, x -> round(x / norm, 6))").as("u"))
    val centArr = e
      .select(col("label").as("cell"), posexplode(col("u")).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos").cast("long").as("pos"))
      .agg(round(avg(col("x")), 6).as("m"))
      .groupBy(col("cell"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)").as("cm"))
      .withColumn("cnorm", sqrt(expr(
        "aggregate(zip_with(cm, cm, (x, y) -> x * y), 0D, (a, z) -> a + z)")))
      .select(col("cell"), expr("transform(cm, x -> round(x / cnorm, 6))").as("cu"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cos").desc, col("cell"))
    val want = e.crossJoin(broadcast(centArr))
      .withColumn("cos", round(expr(
        "aggregate(zip_with(u, cu, (x, y) -> x * y), 0D, (a, z) -> a + z)"), 6))
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("vec_id"), col("cell"), col("cos").as("cos_to_cell"),
        (col("cell") === col("label")).as("matches_label"))
      .orderBy(col("vec_id")).collect().toSeq
    assert(got == want)
    Caches.releaseAll(); spark.catalog.clearCache()
  }

  test("annIvf over 100 labels matches the crossJoin+argmin-window reference") {
    val got = graft.ops.Similarity.annIvf(spark, dir).collect().toSeq

    // reference trained index: one Lloyd round via windows, no kernel
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("embedding").cast("array<double>").as("v"))
    def centArrOf(assign: org.apache.spark.sql.DataFrame) = assign
      .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos").cast("long").as("pos"))
      .agg(round(avg(col("x")), 6).as("m"))
      .groupBy(col("cell"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)").as("cv"))
    def assignTo(cent: org.apache.spark.sql.DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("dist"), col("cell"))
      e.crossJoin(broadcast(cent))
        .withColumn("dist", round(sqrt(expr(
          "aggregate(zip_with(v, cv, (x, y) -> (x - y) * (x - y)), 0D, (a, z) -> a + z)")), 6))
        .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("vec_id"), col("label"), col("v"), col("cell"), col("dist"))
    }
    val c0 = centArrOf(e.select(col("label").as("cell"), col("v")))
    val a1 = assignTo(c0).localCheckpoint(true)
    val c1 = centArrOf(a1.select(col("cell"), col("v")))
    val want = assignTo(c1)
      .select(col("vec_id"), col("cell"), col("dist").as("dist_to_cell"),
        (col("cell") === col("label")).as("matches_label"))
      .orderBy(col("vec_id")).collect().toSeq
    assert(got == want)
    Caches.releaseAll(); spark.catalog.clearCache()
  }

  test("semDedup over 100 computed cells stays cell-local and dup-consistent") {
    val out = graft.ops.Similarity.semDedup(spark, dir).collect()
    // structural invariants (the pairwise reference is annIvf's
    // assignment + in-cell pairs; here assert the decision semantics)
    val assigns = graft.ops.Similarity.semDedupAssignments(spark, dir)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (vec, cell, dupOf) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(assigns(vec) == cell)
      assert(assigns(dupOf) == cell, "reported partner must share the cell")
      assert(dupOf < vec, "partner is the smallest smaller-id in-cell dup")
    }
    Caches.releaseAll(); spark.catalog.clearCache()
  }
}
