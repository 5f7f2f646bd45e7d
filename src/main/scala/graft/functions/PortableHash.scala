package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native (codegen'd) kernels for the hash-heavy dedup operators.
  *
  * The sketch computations (60-bit md5-derived hash, SimHash fold,
  * MinHash signature) are semantically expressible with Spark's
  * higher-order functions, but `transform`/`aggregate` lambdas are
  * interpreted (CodegenFallback) — measured 30-50s/query at sf0.1.
  * These Expressions compute the same values in tight JVM loops inside
  * whole-stage codegen (one static call per row).
  *
  * H60(s) is bit-identical to the SQL spec the DuckDB oracle uses:
  * `CAST(conv(substr(md5(s),1,15),16,10) AS BIGINT)` — the first 15 hex
  * digits (= top 60 bits) of md5.
  */
object PortableHashImpl {
  private val digest = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** top 60 bits of md5(s), as a non-negative long. */
  def md5h60(s: UTF8String): Long = md5h60(s.getBytes)

  /** same, over raw bytes (SQL md5(string) arrives as Md5(Cast(s AS
    * BINARY)) — the rewrite rule feeds us the binary child). */
  def md5h60(bytes: Array[Byte]): Long = {
    val d = digest.get()
    d.reset()
    val b = d.digest(bytes)
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (b(i) & 0xff); i += 1 }
    acc >>> 4
  }

  /** h60 of every element of a string array. */
  def md5h60Array(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = md5h60(arr.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 60-bit SimHash over a token array: bit j of the result is set iff
    * the count of tokens with h60 bit j set exceeds half. Matches the
    * SQL spec: sum over tokens of ±1 per bit, bit set when sum > 0. */
  def simhash60(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = md5h60(tokens.getUTF8String(i))
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 60) {
      if (counts(j) > 0) sim |= (1L << j)
      j += 1
    }
    sim
  }

  /** Winnowing fingerprints (MOSS-style): h60 of every k-char gram,
    * then the minimum of each w-length window of those hashes; distinct
    * mins, sorted. Portable spec — DuckDB reproduces it with
    * substr+md5 list ops. Text shorter than k fingerprints as one
    * whole-text hash. */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val t = text.toString
    val n = t.length
    if (n < k) return new GenericArrayData(Array(md5h60(text)))
    val m = n - k + 1
    val h = new Array[Long](m)
    var i = 0
    while (i < m) {
      h(i) = md5h60(UTF8String.fromString(t.substring(i, i + k)))
      i += 1
    }
    val nw = math.max(1, m - w + 1)
    val mins = new java.util.TreeSet[java.lang.Long]()
    var j = 0
    while (j < nw) {
      var mn = Long.MaxValue
      var x = j
      val end = math.min(j + w, m)
      while (x < end) { if (h(x) < mn) mn = h(x); x += 1 }
      mins.add(mn)
      j += 1
    }
    val out = new Array[Long](mins.size)
    var z = 0
    val it = mins.iterator()
    while (it.hasNext) { out(z) = it.next(); z += 1 }
    new GenericArrayData(out)
  }

  private val P = 2147483647L

  /** k-element MinHash signature over a shingle array:
    * sig_i = min over shingles of ((1+2i)·(h60 mod p) + 7+11i) mod p. */
  def minhashSig(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    val sig = Array.fill[Long](k)(Long.MaxValue)
    var s = 0
    while (s < n) {
      val hm = md5h60(shingles.getUTF8String(s)) % P
      var i = 0
      while (i < k) {
        val v = ((1L + 2L * i) * hm + 7L + 11L * i) % P
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      s += 1
    }
    new GenericArrayData(sig)
  }
}

/** h60(string|binary) → long. */
case class H60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => PortableHashImpl.md5h60(s)
    case b: Array[Byte] => PortableHashImpl.md5h60(b)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHashImpl.md5h60($c)")
  override protected def withNewChildInternal(c: Expression): H60 = copy(child = c)
}

/** h60 applied elementwise: array<string> → array<long>. */
case class H60Array(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    PortableHashImpl.md5h60Array(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHashImpl.md5h60Array($c)")
  override protected def withNewChildInternal(c: Expression): H60Array = copy(child = c)
}

/** SimHash60(array<string>) → long. */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    PortableHashImpl.simhash60(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHashImpl.simhash60($c)")
  override protected def withNewChildInternal(c: Expression): SimHash60 = copy(child = c)
}

/** MinHashSig(array<string>, k=16) → array<long>. */
case class MinHashSig(child: Expression, k: Int = 16) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    PortableHashImpl.minhashSig(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHashImpl.minhashSig($c, $k)")
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** WinnowFingerprint(string, k, w) → sorted array<long> of distinct
  * window-min k-gram hashes. */
case class WinnowFingerprint(child: Expression, k: Int = 8, w: Int = 4)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    PortableHashImpl.winnow(v.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHashImpl.winnow($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): WinnowFingerprint = copy(child = c)
}

/** SQL registration so the expressions are usable from `expr(...)` and
  * spark.sql without depending on version-specific Column internals. */
object GraftFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_h60", es => H60(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_h60_array", es => H60Array(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_simhash60", es => SimHash60(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_minhash_sig", es => MinHashSig(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_winnow", es => WinnowFingerprint(es.head), "scala_udf")
    // wider grams for pairwise copy detection: the 8-char gram space is
    // tiny on a small vocabulary (huge df ⇒ quadratic candidate joins);
    // 16 chars ≈ a 3-word shingle
    reg.createOrReplaceTempFunction("graft_winnow16",
      es => WinnowFingerprint(es.head, k = 16, w = 4), "scala_udf")
    reg.createOrReplaceTempFunction("graft_dot", es => DotProduct(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_l2sq", es => L2Squared(es(0), es(1)), "scala_udf")
    // raw AggregateFunction — the analyzer wraps it in AggregateExpression
    reg.createOrReplaceTempFunction("graft_topk",
      es => TopKTriples(es(0), es(1), es(2), es(3)), "scala_udf")
  }
}
