package graft

import org.apache.spark.sql.functions._

import graft.ops.{Pipeline, Similarity}

/** Round-6 additions: the Matryoshka coarse→exact rerank funnel and
  * the deterministic epoch shuffle. Each is checked against an
  * independent in-memory recomputation, not just for shape. */
class QualityOpsR6Spec extends SparkSpec {

  private def cos(a: Array[Double], b: Array[Double], dims: Int): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (i <- 0 until dims) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i) }
    d / math.sqrt(na * nb)
  }

  test("annMatryoshkaRerank: candidates are the prefix top-20, scores are exact full-dim") {
    try {
      val out = Similarity.annMatryoshkaRerank(spark, sf0001).collect()
        .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"),
          r.getAs[Double]("cosine"), r.getAs[Long]("coarse_rk"), r.getAs[Long]("rk")))
      assert(out.nonEmpty, "empty rerank output")
      val e = Tables.embeddings(spark, sf0001)
        .selectExpr("vec_id", "cast(embedding as array<double>) as v").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      val probes = e.keys.filter(_ < 25)
      // stage-1 truth: top-20 by 16-dim prefix cosine (rounded like the op)
      val coarse = probes.map { p =>
        p -> e.keys.filter(_ != p).toSeq
          .sortBy(w => (-BigDecimal(cos(e(p), e(w), 16)).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble, w)).take(20).toSet
      }.toMap
      out.foreach { case (p, v, c, crk, rk) =>
        assert(coarse(p).contains(v), s"probe $p kept $v, not a prefix top-20 candidate")
        assert(crk >= 1 && crk <= 20 && rk >= 1 && rk <= 5)
        val exact = BigDecimal(cos(e(p), e(v), e(p).length))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(c - exact) < 1e-9,
          s"probe $p -> $v: reported $c, exact full-dim $exact")
      }
      // per probe: exactly 5 rows, rk dense, cosine non-increasing in rk
      out.groupBy(_._1).values.foreach { rows =>
        assert(rows.length == 5)
        val byRk = rows.sortBy(_._5)
        assert(byRk.map(_._5).toSeq == (1L to 5L))
        byRk.sliding(2).foreach { case Array(a, b) =>
          assert(a._3 >= b._3, "rerank order must be cosine-descending")
        }
      }
    } finally { Caches.releaseAll(); spark.catalog.clearCache() }
  }

  test("epochShuffle: per-epoch permutation, hash-derived shards, dense per-shard positions") {
    try {
      val out = Pipeline.epochShuffle(spark, sf0001).collect()
        .map(r => (r.getAs[Long]("epoch"), r.getAs[Long]("shard"),
          r.getAs[Long]("pos"), r.getAs[Long]("doc_id")))
      val nDocs = Tables.documents(spark, sf0001).count()
      assert(out.length == 2 * nDocs, "each doc must appear once per epoch")
      (0L to 1L).foreach { ep =>
        val rows = out.filter(_._1 == ep)
        assert(rows.map(_._4).distinct.length == nDocs, s"epoch $ep is not a permutation")
        // shard matches an independent md5-nibble recomputation
        rows.foreach { case (_, sh, _, id) =>
          val hex = java.security.MessageDigest.getInstance("MD5")
            .digest(s"ep$ep:$id".getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          assert(sh == "0123456789abcdef".indexOf(hex.charAt(0)) % 8,
            s"doc $id epoch $ep: shard $sh disagrees with md5 nibble")
        }
        // dense positions per shard
        rows.groupBy(_._2).values.foreach { srows =>
          assert(srows.map(_._3).sorted.toSeq == (1L to srows.length))
        }
      }
      // the two epochs must order docs differently (different hash keys)
      val ord0 = out.filter(_._1 == 0L).sortBy(r => (r._2, r._3)).map(_._4).toSeq
      val ord1 = out.filter(_._1 == 1L).sortBy(r => (r._2, r._3)).map(_._4).toSeq
      assert(ord0 != ord1, "epochs produced identical orders")
    } finally { Caches.releaseAll(); spark.catalog.clearCache() }
  }
}
