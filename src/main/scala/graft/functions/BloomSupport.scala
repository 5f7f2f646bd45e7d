package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graft.GraftShim
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Codegen-native bloom-filter membership for semi-join pruning.
  *
  * The probe goes through Spark's own [[BloomFilterMightContain]]
  * expression (the one behind `spark.sql.optimizer.runtime.bloomFilter`)
  * with the serialized filter inlined as a binary literal — so the
  * membership test participates in whole-stage codegen and the filter
  * deserializes once per task, not per row. A Scala UDF here would
  * break codegen fusion in exactly the 100 TB scan stage the bloom
  * exists to keep tight.
  */
object BloomSupport {

  /** Distributed build over a LONG key column; sized from the actual
    * key count unless the caller knows better. An undersized bloom
    * degrades silently toward fpp→1 (every probe falls through to the
    * exact join), which erases the optimization — so auto-sizing is the
    * default, at the cost of one count() over the (small) key side. */
  def buildLong(keys: DataFrame, keyCol: String,
      expectedItems: Option[Long] = None, fpp: Double = 0.01): Array[Byte] = {
    val n = expectedItems.getOrElse(keys.select(keyCol).count())
    val bloom = keys.stat.bloomFilter(keyCol, math.max(n, 1L), fpp)
    serialize(bloom)
  }

  def serialize(bloom: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** `might_contain(<serialized bloom>, value)` as a Column predicate.
    * `value` must be LongType (the sketch hashes longs); hash wider
    * keys with xxhash64 first — on BOTH the build and probe sides. */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    GraftShim.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType), GraftShim.expression(value)))
}
