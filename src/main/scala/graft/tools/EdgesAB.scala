package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B of the co-occurrence edge build — the relation all 18 graph
  * queries rebuild per fresh-JVM gate entry, so its wall multiplies
  * across the family. Times the r14 basket-expansion form (one
  * |items| shuffle + map-side C(k,2) expansion + pair distinct)
  * against the retired self-join form (distinct(order, part) →
  * self equi-join → distinct), same JVM, alternating, count() as the
  * action.
  *
  *   runMain graft.tools.EdgesAB <sfDir>
  */
object EdgesAB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(form: String): (Double, Long) = {
      graft.Caches.releaseAll(blocking = true)
      spark.catalog.clearCache()
      System.gc()
      val df = if (form == "expand") graft.ops.Graph.coOccurrenceEdges(spark, dir)
        else graft.ops.Graph.coOccurrenceEdgesJoinForm(spark, dir)
      val t0 = System.nanoTime()
      val n = df.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }

    run("expand") // JVM/JIT/file-meta warmup, discarded
    val passes = Seq("join", "expand", "join", "expand", "join", "expand")
      .map(f => f -> run(f))
    val joinT = passes.filter(_._1 == "join").map(_._2._1)
    val expT = passes.filter(_._1 == "expand").map(_._2._1)
    val ns = passes.map(_._2._2).distinct
    require(ns.size == 1, s"edge counts diverge: $ns")
    val fmt = (xs: Seq[Double]) => xs.map(t => f"$t%.2f").mkString(",")
    println(f"""{"tool":"edges_ab","sf_dir":"$dir","edges":${ns.head},"join_form":[${fmt(joinT)}],"expand_form":[${fmt(expT)}],"join_min":${joinT.min}%.2f,"expand_min":${expT.min}%.2f}""")
    spark.stop()
  }
}
