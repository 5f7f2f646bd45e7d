package graft

import org.apache.spark.sql.functions._

import graft.etl.EventsEtl
import graft.ops.{Pipeline, TextAnalysis}
import graft.operators.Relational

/** Property tests for the round-4 curation / maintenance operators —
  * invariants the DuckDB oracle can't phrase (plan shape, structural
  * bounds, cross-operator consistency). */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences: offsets stay inside the budget and are dense per shard") {
    val rows = Pipeline.packSequences(spark, sf0001)
      .join(Tables.documents(spark, sf0001).select("doc_id", "n_chars"), "doc_id")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val off = r.getAs[Long]("pack_offset")
      assert(off >= 0 && off < 2048, s"offset $off out of [0, 2048)")
    }
    // within a shard, consecutive docs' start offsets tile end-to-end:
    // pack_id*budget + offset must equal the running sum of n_chars
    rows.groupBy(r => r.getAs[Long]("shard")).foreach { case (_, docs) =>
      val inOrder = docs.sortBy(_.getAs[Long]("doc_id"))
      var running = 0L
      inOrder.foreach { r =>
        val start = r.getAs[Long]("pack_id") * 2048 + r.getAs[Long]("pack_offset")
        assert(start == running, s"doc ${r.getAs[Long]("doc_id")} start $start != $running")
        running += r.getAs[Long]("n_chars")
      }
    }
  }

  test("stratifiedSample keeps strata at their configured rates (±tolerance)") {
    val total = Tables.documents(spark, sf0001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Pipeline.stratifiedSample(spark, sf0001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // deterministic hash ⇒ the rate concentrates; allow wide slack at
    // tiny SF, but the ordering en > others must hold
    val enRate = kept.getOrElse("en", 0L).toDouble / total("en")
    assert(enRate > 0.3 && enRate < 0.7, s"en rate $enRate far from 0.5")
    total.keys.filterNot(Set("en", "de")).foreach { l =>
      val r = kept.getOrElse(l, 0L).toDouble / total(l)
      assert(r < enRate, s"stratum $l rate $r not below en rate $enRate")
    }
  }

  test("piiScrub finds the planted email+phone in every doc and removes them") {
    val rows = TextAnalysis.piiScrub(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_emails") >= 1, "planted email not detected")
      assert(r.getAs[Long]("n_phones") >= 1, "planted phone not detected")
    }
  }

  test("topBigrams returns exactly k rows in count-then-lexicographic order") {
    val rows = TextAnalysis.topBigrams(spark, sf0001).collect()
    assert(rows.length == 25)
    val keys = rows.map(r => (-r.getAs[Long]("n"), r.getString(0), r.getString(1)))
    assert(keys.sameElements(keys.sorted), "top-k order not deterministic")
  }

  test("incrementalAgg merge equals a single full-history aggregation") {
    val merged = EventsEtl.incrementalAgg(spark, sf0001).collect()
    val direct = Tables.events(spark, sf0001)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"),
        min(unix_timestamp($"ts")).as("first_sec"),
        max(unix_timestamp($"ts")).as("last_sec"))
      .orderBy($"user_id").collect()
    assert(merged.sameElements(direct))
  }

  test("intervalJoin labels every event with exactly one session") {
    val n = Tables.events(spark, sf0001).count()
    val joined = EventsEtl.intervalJoin(spark, sf0001)
    assert(joined.count() == n, "event lost or duplicated by the binned join")
    assert(joined.select("event_id").distinct().count() == n)
    // and no BroadcastNestedLoopJoin in the plan — that is the whole point
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), "binned join fell back to BNLJ")
  }

  test("marketShare values are shares: every year in (0, 1)") {
    val rows = Relational.qMarketShare(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Double]("mkt_share")
      assert(s >= 0.0 && s <= 1.0, s"share $s outside [0,1]")
    }
  }
}
