package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow

import graft.functions.{CellIndex, VectorKernels}

/** The routing kernel's one load-bearing property: the hierarchical
  * (triangle-inequality-pruned) scan is bit-identical to the flat
  * exhaustive scan — for every metric, every k, and adversarial
  * near-tie inputs. Oracles gate the CONSUMERS at sf0.01; this spec
  * gates the kernel itself across the size threshold where the
  * hierarchy switches on (|cells| ≥ 64), which the tiny oracle
  * fixtures never cross. */
class VectorKernelsSpec extends SparkSpec {

  private def arr(xs: Array[Double]): GenericArrayData =
    new GenericArrayData(xs.map(_.asInstanceOf[Any]))

  /** flat reference: argsort by (round6(key), cell) lexicographic. */
  private def flatRoute(x: Array[Double], cells: Array[Long],
      cents: Array[Array[Double]], k: Int, metric: Int): Seq[(Double, Long, Double)] = {
    val scored = cells.indices.map { c =>
      val cv = cents(c)
      val raw =
        if (metric == VectorKernels.MetricDot)
          x.indices.map(i => x(i) * cv(i)).sum
        else x.indices.map(i => { val d = x(i) - cv(i); d * d }).sum
      val key = VectorKernels.round6(
        if (metric == VectorKernels.MetricL2) math.sqrt(raw) else raw)
      (key, cells(c), raw)
    }
    val sorted =
      if (metric == VectorKernels.MetricDot)
        scored.sortBy { case (key, cell, _) => (-key, cell) }
      else scored.sortBy { case (key, cell, _) => (key, cell) }
    sorted.take(math.min(k, cells.length))
  }

  private def kernelRoute(x: Array[Double], idx: CellIndex, k: Int,
      metric: Int): Seq[(Double, Long, Double)] = {
    val out = VectorKernels.cellRoute(arr(x), idx, k, metric)
    (0 until out.numElements()).map { j =>
      val r = out.getStruct(j, 3).asInstanceOf[InternalRow]
      (r.getDouble(0), r.getLong(1), r.getDouble(2))
    }
  }

  // deterministic pseudo-random doubles (no Math.random in tests that
  // must reproduce)
  private def prng(seed: Long): Iterator[Double] = {
    var s = seed
    Iterator.continually {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
  }

  private def mkIndex(m: Int, dim: Int, seed: Long): (Array[Long], Array[Array[Double]]) = {
    val it = prng(seed)
    val cents = Array.fill(m)(Array.fill(dim)(it.next()))
    // non-contiguous, unsorted-ish cell ids exercised via odd spacing
    val cells = Array.tabulate(m)(i => i.toLong * 3 + 7)
    (cells, cents)
  }

  test("hierarchical route is bit-identical to the flat scan (all metrics, ks)") {
    val dim = 16
    // 4500 cells ⇒ ⌈√4500⌉ = 68 ≥ 64 groups ⇒ the THIRD level builds;
    // the equivalence below therefore covers 1-, 2- AND 3-level scans
    for (m <- Seq(5, 63, 64, 200, 500, 4500)) {
      val (cells, cents) = mkIndex(m, dim, seed = m)
      val idx = new CellIndex(cells, cents)
      if (m >= 64) assert(idx.hierarchy != null) else assert(idx.hierarchy == null)
      if (m >= 4096) assert(idx.hierarchy.parentCents != null,
        s"m=$m must build the 3rd level")
      else if (m >= 64) assert(idx.hierarchy.parentCents == null)
      val probes = Iterator.range(0, 40).map { i =>
        val it = prng(1000L + i) // one stream per probe, fresh value per
        Array.fill(dim)(it.next() * 2) // component (not a constant vector)
      }.toSeq
      for {
        metric <- Seq(VectorKernels.MetricL2Sq, VectorKernels.MetricL2,
          VectorKernels.MetricDot)
        k <- Seq(1, 2, 5, m + 3)
        x <- probes
      } {
        val got = kernelRoute(x, idx, k, metric)
        val want = flatRoute(x, cells, cents, k, metric)
        assert(got == want, s"m=$m metric=$metric k=$k")
      }
    }
  }

  test("near-tie candidates at the 6-dp rounding boundary resolve by cell id") {
    // centroids engineered so several distances round to the SAME 6-dp
    // value: the winner must be the smallest cell id among the rounded
    // ties, regardless of scan order (the hierarchy visits groups in
    // bound order, not cell order — lexicographic insertion is what
    // keeps this exact)
    val dim = 4
    val m = 128
    val it = prng(42)
    val cents = Array.tabulate(m) { i =>
      val base = Array.fill(dim)(it.next())
      // half the cells sit at distance ~1.0000004x of each other's key
      if (i % 2 == 0) base else base.map(_ * (1.0 + 1e-9 * (i % 7)))
    }
    val cells = Array.tabulate(m)(i => (m - i).toLong) // DESCENDING ids
    val idx = new CellIndex(cells, cents)
    assert(idx.hierarchy != null)
    for (p <- 0 until 30) {
      val pit = prng(99L + p)
      val x = Array.fill(dim)(pit.next())
      for (metric <- Seq(VectorKernels.MetricL2Sq, VectorKernels.MetricL2,
          VectorKernels.MetricDot); k <- Seq(1, 3)) {
        assert(kernelRoute(x, idx, k, metric) ==
          flatRoute(x, cells, cents, k, metric), s"p=$p metric=$metric k=$k")
      }
    }
  }

  test("duplicate centroids (exact key ties) keep the smaller cell id") {
    val dim = 8
    val m = 100
    val it = prng(7)
    val base = Array.fill(m / 2)(Array.fill(dim)(it.next()))
    val cents = base ++ base.map(_.clone()) // every centroid twice
    val cells = Array.tabulate(m)(i => (i * 13 % m).toLong * 2 + 1)
    val idx = new CellIndex(cells, cents)
    for (p <- 0 until 10; metric <- Seq(VectorKernels.MetricL2,
        VectorKernels.MetricDot)) {
      val pit = prng(555L + p)
      val x = Array.fill(dim)(pit.next())
      assert(kernelRoute(x, idx, 4, metric) ==
        flatRoute(x, cells, cents, 4, metric))
    }
  }

  test("spherical k-means assignment matches the crossJoin+window form") {
    import org.apache.spark.sql.functions._
    val df = graft.ops.Similarity.sphericalKmeans(spark, sf0001)
    // reference: the pre-kernel shape — normalize, per-label unit
    // centroids, argmax by (round(dot,6) desc, cell) window
    val e = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(expr("aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (a, z) -> a + z)")))
      .select(col("vec_id"), col("label"),
        expr("transform(v, x -> round(x / norm, 6))").as("u"))
    val centArr = e
      .select(col("label").as("cell"), posexplode(col("u")).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos").cast("long").as("pos"))
      .agg(round(avg(col("x")), 6).as("m"))
      .groupBy(col("cell"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)").as("cm"))
      .withColumn("cnorm", sqrt(expr("aggregate(zip_with(cm, cm, (x, y) -> x * y), 0D, (a, z) -> a + z)")))
      .select(col("cell"), expr("transform(cm, x -> round(x / cnorm, 6))").as("cu"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cos").desc, col("cell"))
    val ref = e.crossJoin(broadcast(centArr))
      .withColumn("cos", round(
        expr("aggregate(zip_with(u, cu, (x, y) -> x * y), 0D, (a, z) -> a + z)"), 6))
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("vec_id"), col("cell"), col("cos").as("cos_to_cell"),
        (col("cell") === col("label")).as("matches_label"))
      .orderBy(col("vec_id"))
    assert(df.collect().toSeq == ref.collect().toSeq)
    Caches.releaseAll()
  }

  test("lpa/walk_corpus plans carry no WindowGroupLimit (argmax is an agg)") {
    for (q <- Seq("graph_lpa", "graph_walk_corpus")) {
      val df = SparkEntry.queries(q)(spark, sf0001)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("WindowGroupLimit"), s"$q plan buffers per-task: $plan")
      assert(df.count() > 0)
      Caches.releaseAll()
    }
  }
}
