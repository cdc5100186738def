package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the operators Spark's built-ins genuinely
  * can't express (SURVEY §7.3). Both are codegen'd (`doGenCode`) so they stay
  * inside whole-stage codegen on the 100 TB hot path — no UDF serialization,
  * no codegen fence.
  */

/** 64-bit Karp–Rabin polynomial rolling hash of a string:
  * `h = Σ bytes[i] * B^(n-1-i) (mod 2^64)`, B = 1000003.
  * The document-fingerprinting primitive (content-defined chunking /
  * shift-resistant signatures). Deterministic, engine-independent.
  */
case class RollingHash(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    RollingHash.hashBytes(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |byte[] rhBytes = $c.getBytes();
         |long rhAcc = 0L;
         |for (int rhI = 0; rhI < rhBytes.length; rhI++) {
         |  rhAcc = rhAcc * ${RollingHash.Base}L + (long)(rhBytes[rhI] & 0xFF);
         |}
         |${ev.value} = rhAcc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  final val Base = 1000003L
  def hashBytes(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) { acc = acc * Base + (bytes(i) & 0xff); i += 1 }
    acc
  }
}

/** 64-bit SimHash over an array of string tokens: each token is hashed
  * (xxhash-style 64-bit avalanche of the token's rolling hash); bit i of the
  * result is 1 iff Σ_tokens (bit_i(h) ? +1 : -1) > 0. Near-duplicate docs
  * differ in few bits → Hamming-ball lookup. Charikar (2002), "Similarity
  * estimation techniques from rounding algorithms".
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects ARRAY<STRING>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = SimHash64.tokenHash(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    SimHash64.collapse(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val simHashCls = SimHash64.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |int[] shCounts = new int[64];
         |for (int shI = 0; shI < $c.numElements(); shI++) {
         |  if (!$c.isNullAt(shI)) {
         |    long shH = $simHashCls.MODULE$$.tokenHash($c.getUTF8String(shI).getBytes());
         |    for (int shB = 0; shB < 64; shB++) {
         |      if (((shH >>> shB) & 1L) == 1L) shCounts[shB]++; else shCounts[shB]--;
         |    }
         |  }
         |}
         |${ev.value} = $simHashCls.MODULE$$.collapse(shCounts);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

object SimHash64 {
  /** Rolling hash + 64-bit finalizer (xxhash/murmur-style avalanche). */
  def tokenHash(bytes: Array[Byte]): Long = {
    var h = RollingHash.hashBytes(bytes) + 0x9e3779b97f4a7c15L
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }
  def collapse(counts: Array[Int]): Long = {
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }
  /** Hamming distance between two simhashes. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}

/** Column-API entry points. */
object exprs {
  import org.apache.spark.sql.GraftShim
  /** 64-bit rolling-hash fingerprint of a string column. */
  def rolling_hash(c: Column): Column =
    GraftShim.column(RollingHash(GraftShim.expression(c)))
  /** 64-bit SimHash of an array<string> token column. */
  def simhash64(c: Column): Column =
    GraftShim.column(SimHash64(GraftShim.expression(c)))
  /** Hamming distance between two long columns (built-ins: popcount of xor). */
  def hamming64(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))
}
