package graft

import org.apache.spark.sql.functions._

/** Regression gate for SILENT interpreted-eval fallbacks in the native
  * Catalyst kernels. Round 13 shipped a CodeRoute doGenCode that
  * spliced the JVM binary array name (`[Lgraft.functions.CellIndex;`)
  * into the generated cast — janino failed to parse it and Spark
  * quietly fell back to interpreter mode on EVERY PQ encode (686
  * warnings per test run) while all correctness gates stayed green.
  *
  * This spec makes that failure mode loud: with
  * `spark.sql.codegen.factoryMode=CODEGEN_ONLY` a failed expression
  * compile THROWS instead of falling back, and with
  * `spark.sql.codegen.fallback=false` a failed whole-stage compile
  * does too. Every query family that routes through a custom
  * expression (CellRoute, CodeRoute, DotProduct, L2Squared,
  * BloomProbe-free paths) must complete under both settings. */
class CodegenNoFallbackSpec extends SparkSpec {

  private def strictCodegen[T](body: => T): T = {
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body finally {
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
      Caches.releaseAll(); spark.catalog.clearCache()
    }
  }

  test("PQ family (CodeRoute) compiles under CODEGEN_ONLY — no interpreted fallback") {
    strictCodegen {
      for (q <- Seq("ann_pq_adc", "ann_ivf_pq", "ann_ivf_pq_residual",
          "embed_pq_code_entropy")) {
        val n = SparkEntry.queries(q)(spark, sf0001).count()
        assert(n > 0, s"$q returned no rows under strict codegen")
        Caches.releaseAll()
      }
    }
  }

  test("IVF routing family (CellRoute, hierarchy active) compiles under CODEGEN_ONLY") {
    strictCodegen {
      for (q <- Seq("ann_ivf", "ann_ivf_topk", "ann_hier_route",
          "dedup_semdedup", "embed_spherical_kmeans")) {
        val n = SparkEntry.queries(q)(spark, sf0001).count()
        assert(n > 0, s"$q returned no rows under strict codegen")
        Caches.releaseAll()
      }
    }
  }

  test("vector scalar kernels (graft_dot / graft_l2sq) compile under CODEGEN_ONLY") {
    strictCodegen {
      graft.functions.GraftFunctions.register(spark)
      val row = Tables.embeddings(spark, sf0001)
        .select(col("embedding").cast("array<double>").as("v"))
        .selectExpr("round(graft_dot(v, v), 6) AS d",
          "round(graft_l2sq(v, v), 6) AS z")
        .agg(sum(col("d")).as("sd"), sum(col("z")).as("sz"))
        .collect()(0)
      assert(row.getDouble(0) > 0.0 && row.getDouble(1) == 0.0)
    }
  }
}
