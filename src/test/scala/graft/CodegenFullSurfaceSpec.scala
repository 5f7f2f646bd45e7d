package graft

/** FULL-SURFACE codegen-honesty gate (VERDICT r14 item 1).
  *
  * [[CodegenNoFallbackSpec]] proves three expression families compile
  * under strict codegen; this spec extends the protection to EVERY
  * registered query: with `spark.sql.codegen.factoryMode=CODEGEN_ONLY`
  * a failed expression compile THROWS instead of silently interpreting
  * (the r13 CodeRoute failure mode — 686 warnings per test run, all
  * correctness gates green, every PQ encode ~10× slower for four
  * rounds), and `spark.sql.codegen.fallback=false` does the same for
  * whole-stage compiles. Any future edit to ANY custom Catalyst
  * expression (H60 / SimHash60 / MinHashSig / GraftBloom / TopKAgg /
  * VectorKernels' CellRoute/CodeRoute/DotProduct/L2Squared) that
  * breaks generated code now fails THIS test instead of shipping as a
  * silent 10× regression.
  *
  * Runs at sf0.001 with the production optimizer mode (extensions +
  * top-k rewrite ON — the rewritten plans are the ones that must
  * compile). Failures are collected, not fail-fast, so one broken
  * expression reports every query it poisons.
  */
class CodegenFullSurfaceSpec extends SparkSpec {

  test("all registered queries complete under CODEGEN_ONLY + fallback=false") {
    GraftExtensions.install(spark)
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    val prevTopK = spark.conf.getOption("spark.graft.topkRewrite.enabled")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.graft.topkRewrite.enabled", "true")
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try fn(spark, sf0001).count()
        catch { case e: Throwable =>
          failures(name) =
            Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
        }
        Caches.releaseAll()
        spark.catalog.clearCache()
      }
    } finally {
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
      prevTopK.fold(spark.conf.unset("spark.graft.topkRewrite.enabled"))(
        spark.conf.set("spark.graft.topkRewrite.enabled", _))
      Caches.releaseAll(); spark.catalog.clearCache()
    }
    assert(failures.isEmpty,
      s"${failures.size}/${SparkEntry.queries.size} queries failed under " +
        "strict codegen:\n" +
        failures.map { case (k, v) => s"  $k: $v" }.mkString("\n"))
  }
}
