package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Portable (engine-independent) content hashes used by the dedup operators.
  *
  * All are derived from MD5 hex digests so an external SQL engine (the DuckDB
  * oracle, or any warehouse) can reproduce them exactly:
  * `hash32(s)  = int(md5(s)[0,8), base16)`   — 32-bit, non-negative
  * `hash60(s)  = int(md5(s)[0,15), base16)`  — 60-bit, non-negative
  *
  * For pure-Spark pipelines where cross-engine parity is not needed,
  * `xxhash64` is the faster choice; these exist so dedup decisions are
  * reproducible outside Spark (a property a training-data pipeline wants when
  * audits re-run in a different engine).
  */
object PortableHash {
  private val md5tl = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))
  private val hexDigits = "0123456789abcdef".toCharArray

  def md5Hex(s: String): String = {
    val d = md5tl.get()
    d.reset()
    val bytes = d.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def hash32(s: String): Long = java.lang.Long.parseLong(md5Hex(s).substring(0, 8), 16)
  def hash60(s: String): Long = java.lang.Long.parseLong(md5Hex(s).substring(0, 15), 16)
}

/** MinHash signature over the DISTINCT elements of an array<string>.
  *
  * Output: array<long> of length `numHashes`; element i is
  * `min over tokens t of hash32(i + ":" + t)`, the classic k-permutation
  * MinHash estimator of Jaccard similarity (Broder '97). Empty/null token
  * arrays yield null (no signature).
  *
  * Per-row scalar — no shuffle; banding/bucketing for LSH happens on top in
  * [[graft.operators.Dedup.minHashLshPairs]].
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<string>, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val seen = new java.util.HashSet[String]()
    var j = 0
    while (j < n) {
      val t = arr.getUTF8String(j)
      if (t != null) seen.add(t.toString)
      j += 1
    }
    if (seen.isEmpty) return null
    // One portable MD5-derived base hash per token, then k universal-hash
    // mixes ((2i+1)*h + i*40503) mod p — the classic a*h+b family. 16x less
    // hashing than k independent MD5s, still reproducible in any SQL engine.
    val sig = Array.fill[Long](numHashes)(Long.MaxValue)
    val it = seen.iterator()
    while (it.hasNext) {
      val h = PortableHash.hash32(it.next())
      var i = 0
      while (i < numHashes) {
        val v = ((2L * i + 1L) * h + i.toLong * 40503L) % MinHashSignature.Prime
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
  override def prettyName: String = "minhash_signature"
}

object MinHashSignature {
  /** First prime above 2^32 — keeps (2i+1)*h + i*b < 2^38 exactly
    * representable everywhere, including engines computing in doubles.
    */
  val Prime = 4294967311L
}

/** 60-bit SimHash (Charikar '02) over an array<string> of tokens (duplicates
  * kept — token frequency weights the vote). Bit j of the result is 1 iff the
  * sum over tokens of (+1 if bit j of hash60(token) else -1) is positive.
  * 60 bits (15 md5 hex chars) keeps the value positive in a signed 64-bit
  * integer on every engine. Null/empty input => null.
  */
case class SimHash60(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash60 expects array<string>, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val acc = new Array[Int](60)
    var j = 0
    var any = false
    while (j < n) {
      val t = arr.getUTF8String(j)
      if (t != null) {
        any = true
        val h = PortableHash.hash60(t.toString)
        var b = 0
        while (b < 60) {
          if (((h >> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    if (!any) return null
    var out = 0L
    var b = 0
    while (b < 60) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): SimHash60 = copy(child = c)
  override def prettyName: String = "simhash60"
}

/** Polynomial rolling-hash fingerprint of a string:
  * `h = fold(chars)(h * 257 + codepoint) mod (2^31 - 1)`.
  * The classic Rabin-Karp document fingerprint; cheap, order-sensitive, and
  * reproducible anywhere (intermediates stay < 2^40).
  */
case class PolyHash(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"poly_hash expects string, got ${t.sql}")
  }

  private final val Mod = 2147483647L // 2^31 - 1

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * 257L + s.charAt(i).toLong) % Mod
      i += 1
    }
    h
  }

  override protected def withNewChildInternal(c: Expression): PolyHash = copy(child = c)
  override def prettyName: String = "poly_hash"
}

object TextHashFunctions {
  def minhashSignature(tokens: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(tokens), numHashes))

  def simhash60(tokens: Column): Column =
    ColumnBridge.column(SimHash60(ColumnBridge.expression(tokens)))

  def polyHash(text: Column): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(text)))

  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "simhash60", es => SimHash60(es.head), "built-in")
    reg.createOrReplaceTempFunction(
      "poly_hash", es => PolyHash(es.head), "built-in")
  }
}
