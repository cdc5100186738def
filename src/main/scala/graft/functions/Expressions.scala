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
      // freshName: two instances of this expression can share one generated
      // method — fixed local names would declare twice and throw janino
      // back to the interpreter for the whole stage
      val bytes = ctx.freshName("rhBytes")
      val acc = ctx.freshName("rhAcc")
      val i = ctx.freshName("rhI")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $acc = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $acc = $acc * ${RollingHash.Base}L + (long)($bytes[$i] & 0xFF);
         |}
         |${ev.value} = $acc;
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

/** 64-bit SimHash over an array of string tokens: each token hashes to the
  * first 8 bytes (big-endian) of its md5 — i.e. the value of the md5 hex
  * string's first 16 chars — and bit i of the result is 1 iff
  * Σ_tokens (bit_i(h) ? +1 : -1) > 0. Near-duplicate docs differ in few
  * bits → Hamming-ball lookup. Charikar (2002), "Similarity estimation
  * techniques from rounding algorithms".
  *
  * md5 (not a bespoke avalanche) is deliberate: the signature is then
  * ENGINE-REPRODUCIBLE — DuckDB computes the identical bit votes from
  * `md5(token)`, which upgrades the SimHash driver query from rows-only to
  * a full value-checked oracle. md5 costs ~100ns/token, dwarfed by the
  * banded join it feeds. */
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
      // freshName for the same duplicate-declaration reason as RollingHash
      val counts = ctx.freshName("shCounts")
      val i = ctx.freshName("shI")
      val h = ctx.freshName("shH")
      val b = ctx.freshName("shB")
      s"""
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if (!$c.isNullAt($i)) {
         |    long $h = $simHashCls.MODULE$$.tokenHash($c.getUTF8String($i).getBytes());
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
         |    }
         |  }
         |}
         |${ev.value} = $simHashCls.MODULE$$.collapse($counts);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

object SimHash64 {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 bytes of md5(token), big-endian — `substr(md5(t),1,16)` read
    * as a 64-bit integer, bit-identical across engines. */
  def tokenHash(bytes: Array[Byte]): Long = {
    val md = md5.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
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
  /** Single-pass codegen'd cosine similarity of two numeric array columns. */
  def cosine_sim(a: Column, b: Column): Column =
    GraftShim.column(CosineSim(GraftShim.expression(a), GraftShim.expression(b)))
  /** Single-pass codegen'd dot product of two numeric array columns. */
  def dot_prod(a: Column, b: Column): Column =
    GraftShim.column(DotProd(GraftShim.expression(a), GraftShim.expression(b)))
  /** All-k MinHash signature of an array<bigint> hashed-shingle column. */
  def minhash_sig(c: Column, k: Int): Column =
    GraftShim.column(MinHashSig(GraftShim.expression(c), k))
  /** Distinct word-n-gram shingle hashes of a raw text column (one pass,
    * no token/shingle string materialization). */
  def shingle_hashes(c: Column, n: Int): Column =
    GraftShim.column(ShingleHashes(GraftShim.expression(c), n))
  /** Ordered per-position sliding-window hashes of an array<string> token
    * column (rolling combine — no window string materialization). */
  def token_window_hashes(c: Column, window: Int): Column =
    GraftShim.column(TokenWindowHashes(GraftShim.expression(c), window))
  /** DSIR hashed-n-gram feature buckets of an array<string> token column:
    * one md5 top-`nibbles` bucket per unigram AND per adjacent bigram, in
    * one scan — value-identical to exploding the token/bigram strings
    * through `conv(substring(md5(f),1,nibbles),16,10)`. */
  def dsir_buckets(c: Column, nibbles: Int): Column =
    GraftShim.column(DsirBuckets(GraftShim.expression(c), nibbles))
  /** Unicode-normalize a string column (NFC/NFKC/NFD/NFKD), optionally
    * stripping combining marks after NFD (accent folding). */
  def unicode_normalize(c: Column, form: String = "NFC",
                        stripAccents: Boolean = false): Column =
    GraftShim.column(NormalizeText(GraftShim.expression(c), form, stripAccents))
  /** Single-scan fingerprint normalization (lowercase, keep [a-z0-9],
    * collapse separators) — value-identical to the two-regex chain. */
  def fingerprint_norm(c: Column): Column =
    GraftShim.column(FingerprintNorm(GraftShim.expression(c)))
  /** Equi-depth bucket id of a double column against sorted boundaries
    * (binary search; null → 0, NaN → top). */
  def range_bucket(c: Column, boundaries: Array[Double]): Column =
    GraftShim.column(RangeBucket(GraftShim.expression(c), boundaries))
  /** Morton z-value interleaving `bitsPerDim` bits of each element of an
    * array<int> bucket-id column. */
  def z_value(c: Column, bitsPerDim: Int): Column =
    GraftShim.column(ZValue(GraftShim.expression(c), bitsPerDim))
}

/** Equi-depth bucket id of a numeric value against a SORTED boundaries array
  * (typically approxQuantile output): the count of boundaries at or below
  * the value, via binary search. Null buckets to 0 (nulls cluster at the
  * z-curve origin), NaN to the top bucket — a LAYOUT op only needs a
  * monotone, total assignment, never an exact one. Boundaries ride the plan
  * as a reference object (bounded: ≤ 2^bits − 1 doubles, unlike per-query
  * payloads that grow with the workload). */
case class RangeBucket(child: Expression, boundaries: Array[Double])
    extends UnaryExpression {
  require(boundaries.nonEmpty, "empty boundaries")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"range_bucket expects DOUBLE, got ${child.dataType.catalogString}")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else RangeBucket.bucket(boundaries, v.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val cls = RangeBucket.getClass.getName.stripSuffix("$") + "$"
    val bounds = ctx.addReferenceObj("rbBounds", boundaries, "double[]")
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        |${c.code}
        |int ${ev.value} = ${c.isNull} ? 0 :
        |  $cls.MODULE$$.bucket($bounds, ${c.value});
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): RangeBucket =
    copy(child = newChild)
  override def prettyName: String = "range_bucket"
}

object RangeBucket {
  /** Count of boundaries ≤ v (rightmost insertion point). */
  def bucket(bounds: Array[Double], v: Double): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }
}

/** Morton (z-order) value of an array of per-dimension bucket ids:
  * bit j of dimension d lands at output bit j·k + d, so files cut from a
  * z-sorted stream carry narrow min/max ranges in EVERY dimension — the
  * multi-column data-skipping layout (Delta/Iceberg OPTIMIZE ZORDER analog).
  * Null elements bucket to 0; k·bitsPerDim must fit in 63 bits. */
case class ZValue(child: Expression, bitsPerDim: Int)
    extends UnaryExpression {
  require(bitsPerDim > 0 && bitsPerDim <= 32, "bitsPerDim out of range")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"z_value expects ARRAY<INT>, got ${t.catalogString}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else ZValue.interleave(v.asInstanceOf[ArrayData], bitsPerDim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val cls = ZValue.getClass.getName.stripSuffix("$") + "$"
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        |${c.code}
        |long ${ev.value} = ${c.isNull} ? 0L :
        |  $cls.MODULE$$.interleave(${c.value}, $bitsPerDim);
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ZValue =
    copy(child = newChild)
  override def prettyName: String = "z_value"
}

object ZValue {
  def interleave(arr: ArrayData, bitsPerDim: Int): Long = {
    val k = arr.numElements()
    require(k.toLong * bitsPerDim <= 63,
      s"z_value: $k dims × $bitsPerDim bits exceeds 63")
    var out = 0L
    var d = 0
    while (d < k) {
      val v = if (arr.isNullAt(d)) 0L
        else arr.getInt(d).toLong & ((1L << bitsPerDim) - 1)
      var j = 0
      while (j < bitsPerDim) {
        out |= ((v >>> j) & 1L) << (j * k + d)
        j += 1
      }
      d += 1
    }
    out
  }
}

/** Unicode normalization of a string (java.text.Normalizer), with optional
  * accent folding: decompose (NFD), drop combining marks (Mn), then
  * recompose via the requested form — 'café' and 'café' normalize
  * identically, and with `stripAccents` both become 'cafe'. The text-prep
  * step that belongs BEFORE tokenization/fingerprinting in a corpus
  * pipeline: byte-level dedup and md5 fingerprints treat the two encodings
  * of 'café' as different documents without it.
  *
  * Spark has no normalization built-in (collations normalize for COMPARES,
  * not for output); a Scala UDF would fence codegen on exactly the hot
  * full-corpus path this runs on — hence a codegen'd expression. The ICU
  * behavior matches DuckDB's `nfc_normalize`/`strip_accents`, so queries
  * over it keep full value oracles. */
case class NormalizeText(child: Expression, form: String,
                         stripAccents: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize expects STRING, got ${child.dataType.catalogString}")
    else if (!NormalizeText.Forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"unknown normalization form '$form' (one of ${NormalizeText.Forms.mkString(", ")})")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(NormalizeText.normalize(
      input.asInstanceOf[UTF8String].toString, form, stripAccents))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NormalizeText.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  $cls.MODULE$$.normalize($c.toString(), "$form", $stripAccents));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
  override def prettyName: String = "unicode_normalize"
}

object NormalizeText {
  import java.text.Normalizer
  final val Forms = Set("NFC", "NFKC", "NFD", "NFKD")

  def normalize(s: String, form: String, stripAccents: Boolean): String = {
    if (!stripAccents)
      return Normalizer.normalize(s, Normalizer.Form.valueOf(form))
    // decompose, drop combining marks, recompose in the requested form
    val decomposed = Normalizer.normalize(s,
      if (form == "NFKC" || form == "NFKD") Normalizer.Form.NFKD
      else Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var i = 0
    while (i < decomposed.length) {
      val cp = decomposed.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    if (form == "NFC" || form == "NFKC")
      Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
    else sb.toString
  }
}

/** Fingerprint normalization in ONE scan — the exact value of
  * `trim(regexp_replace(regexp_replace(lower(s), "[^a-z0-9\\s]", " "),
  * "\\s+", " "))` without the two Java-regex passes, which measured ~0.9 ms
  * of cpu per document and made the fingerprint pass the dominant cost of
  * every exact-dedup/star-collapse consumer at the 100× bench point
  * (fingerprint agg over 400 k docs: 11 s wall / ~350 exec-s).
  *
  * Equivalence argument: lowercase goes through `UTF8String.toLowerCase` —
  * the same full-string unicode mapping Spark's `lower()` uses (a per-char
  * `Character.toLowerCase` would diverge on one-to-many mappings like İ).
  * In the regex chain every character of the lowered string that is not
  * [a-z0-9] ends up a space — either replaced by the first regex or
  * already whitespace — and `\s+`→' ' collapses each separator RUN to one
  * space, with trim dropping the ends; so a single scan that keeps
  * [a-z0-9] and emits one ' ' between kept runs is value-identical
  * (surrogate pairs: both halves are non-[a-z0-9] separators, same
  * collapse). The DuckDB oracle keeps replaying the regex SQL — values
  * match by this argument. */
case class FingerprintNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"fingerprint_norm expects STRING, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      FingerprintNorm.normalize(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = FingerprintNorm.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  $cls.MODULE$$.normalize($c));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): FingerprintNorm =
    copy(child = newChild)
  override def prettyName: String = "fingerprint_norm"
}

object FingerprintNorm {
  def normalize(s: UTF8String): String = {
    val lower = s.toLowerCase.toString
    val sb = new java.lang.StringBuilder(lower.length)
    var pendingSep = false
    var i = 0
    while (i < lower.length) {
      val c = lower.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSep && sb.length > 0) sb.append(' ')
        sb.append(c)
        pendingSep = false
      } else pendingSep = true
      i += 1
    }
    sb.toString
  }
}

/** Single-pass cosine similarity of two numeric arrays (float or double
  * elements), accumulating dot, |a|², |b|² in one loop — replaces the
  * three `aggregate(zip_with(...))` higher-order passes, whose lambdas are
  * interpreted per element and fence codegen. NULL if either side is null,
  * the lengths differ, or any element is null — exactly the composed
  * `aggregate(zip_with(...))` semantics (silently truncating to the shorter
  * array or counting nulls as 0.0 would return a plausible-but-wrong
  * similarity instead of surfacing the data problem). 0 denominators yield
  * NaN exactly like the composed form.
  */
case class CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects ARRAY<FLOAT|DOUBLE>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    val lf = isFloat(left); val rf = isFloat(right)
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = if (isFloat(left)) "(double)%s.getFloat(%s)" else "%s.getDouble(%s)"
    val getB = if (isFloat(right)) "(double)%s.getFloat(%s)" else "%s.getDouble(%s)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val x = ctx.freshName("csX")
      val y = ctx.freshName("csY")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $ab = 0.0, $aa = 0.0, $bb = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
         |    else {
         |      double $x = ${getA.format(a, i)};
         |      double $y = ${getB.format(b, i)};
         |      $ab += $x * $y; $aa += $x * $x; $bb += $y * $y;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $ab / (Math.sqrt($aa) * Math.sqrt($bb));
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_sim"
}

/** Single-pass dot product of two numeric arrays (float or double). NULL on
  * length mismatch or null elements — see [[CosineSim]]. */
case class DotProd(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  // any fixed-width numeric element: float/double embeddings, AND the
  // integral code arrays of the quantized ANN paths (int8 scalar
  // quantization dots two tinyint vectors — exact in double up to 2^53)
  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(ByteType | ShortType | IntegerType | LongType |
                   FloatType | DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_prod expects arrays of a fixed-width numeric type, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def getD(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType   => a.getFloat(i).toDouble
    case DoubleType  => a.getDouble(i)
    case ByteType    => a.getByte(i).toDouble
    case ShortType   => a.getShort(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case _           => a.getLong(i).toDouble
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    val lt = elemType(left); val rt = elemType(right)
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += getD(a, i, lt) * getD(b, i, rt)
      i += 1
    }
    acc
  }

  private def getter(t: DataType): String = t match {
    case FloatType   => "(double)%s.getFloat(%s)"
    case DoubleType  => "%s.getDouble(%s)"
    case ByteType    => "(double)%s.getByte(%s)"
    case ShortType   => "(double)%s.getShort(%s)"
    case IntegerType => "(double)%s.getInt(%s)"
    case _           => "(double)%s.getLong(%s)"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = getter(elemType(left))
    val getB = getter(elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
         |    else { $acc += (${getA.format(a, i)}) * (${getB.format(b, i)}); }
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProd =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_prod"
}

/** All-k MinHash signature from PRE-HASHED shingles in ONE pass: for each
  * 64-bit shingle hash x and permutation j, h_j = splitmix64(x ^ seed_j);
  * the result is array<long> of the k per-permutation minima. Replaces k
  * separate `array_min(transform(...))` higher-order expressions (k array
  * traversals with interpreted lambdas) with a single generated loop.
  * Empty input → all Long.MaxValue (deterministic).
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {
  require(k > 0, "k must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects ARRAY<BIGINT>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    val seeds = MinHashSig.seeds(k)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val x = arr.getLong(i)
        var j = 0
        while (j < k) {
          val h = MinHashSig.mix(x ^ seeds(j))
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("mhSeeds", MinHashSig.seeds(k), "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val mins = ctx.freshName("mins")
      val h = ctx.freshName("h")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if (!$c.isNullAt($i)) {
         |    long mhX = $c.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $h = mhX ^ $seedsRef[$j];
         |      $h = ($h ^ ($h >>> 30)) * 0xbf58476d1ce4e5b9L;
         |      $h = ($h ^ ($h >>> 27)) * 0x94d049bb133111ebL;
         |      $h = $h ^ ($h >>> 31);
         |      if ($h < $mins[$j]) $mins[$j] = $h;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  /** splitmix64 finalizer. */
  def mix(v: Long): Long = {
    var h = v
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }
  /** Deterministic per-permutation seeds (golden-ratio sequence, mixed). */
  def seeds(k: Int): Array[Long] =
    Array.tabulate(k)(j => mix(0x9e3779b97f4a7c15L * (j + 1)))
}

/** Distinct word-n-gram shingle HASHES of a raw text column, computed in one
  * pass with zero string materialization: bytes are scanned once, ASCII
  * letters are lowercased, `[a-z0-9]+` runs become rolling token hashes, and
  * each n-token window combines into one 64-bit gram hash (polynomial +
  * splitmix finalizer). Token/shingle strings are never built.
  *
  * Matches the token semantics of [[graft.functions.TextFunctions.tokens]]
  * for ASCII input (non-ASCII bytes are separators either way; locale-special
  * Unicode lowercasing differences only perturb candidate generation, never
  * verification, which stays on the string path). Fewer than n tokens →
  * one gram over all tokens; no tokens → empty array.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, "n must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      ShingleHashes.compute(input.asInstanceOf[UTF8String].getBytes, n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ShingleHashes.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $cls.MODULE$$.compute($c.getBytes(), $n));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {
  private final val TokB = 1000003L   // token rolling-hash base (= RollingHash)
  private final val GramB = 0x100000001b3L // gram combine base (FNV prime)

  /** Distinct n-gram hashes of the [a-z0-9]+ token stream of `bytes`. */
  def compute(bytes: Array[Byte], n: Int): Array[Long] = {
    // pass 1: token hashes
    var tokCount = 0
    var tokHashes = new Array[Long](math.max(8, bytes.length / 4))
    var acc = 0L
    var inTok = false
    var i = 0
    while (i <= bytes.length) {
      val b = if (i < bytes.length) bytes(i) else ' '.toByte
      val lower = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
      val isTok = (lower >= 'a' && lower <= 'z') || (lower >= '0' && lower <= '9')
      if (isTok) {
        // token bytes hashed exactly like RollingHash over the lowercase run,
        // with a separating space contribution handled at gram level
        acc = acc * TokB + (lower & 0xff)
        inTok = true
      } else if (inTok) {
        if (tokCount == tokHashes.length)
          tokHashes = java.util.Arrays.copyOf(tokHashes, tokCount * 2)
        tokHashes(tokCount) = acc
        tokCount += 1
        acc = 0L
        inTok = false
      }
      i += 1
    }
    // zero tokens → ONE empty-stream gram, mirroring the string form's
    // single `concat_ws(' ', [])` = "" shingle: empty docs still become
    // candidates of each other (verification then scores them exactly)
    if (tokCount == 0) return Array(MinHashSig.mix(0L))

    // pass 2: gram hashes over n-token windows (single gram if short)
    val span = if (tokCount >= n) n else tokCount
    val nGrams = if (tokCount >= n) tokCount - n + 1 else 1
    val grams = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      var h = 0L
      var j = 0
      while (j < span) {
        h = h * GramB + tokHashes(g + j)
        j += 1
      }
      grams(g) = MinHashSig.mix(h)
      g += 1
    }
    distinctSorted(grams)
  }

  /** Sort + dedup in place (shingle sets are small; avoids boxing). */
  private def distinctSorted(a: Array[Long]): Array[Long] = {
    java.util.Arrays.sort(a)
    var w = 0
    var i = 0
    while (i < a.length) {
      if (w == 0 || a(w - 1) != a(i)) { a(w) = a(i); w += 1 }
      i += 1
    }
    if (w == a.length) a else java.util.Arrays.copyOf(a, w)
  }
}

/** Per-position 64-bit hashes of every `window`-token sliding window of an
  * array<string> token column — the span-dedup frequency-prefilter primitive
  * (Lee et al. 2022's repeat detection needs POSITIONS, so unlike
  * [[ShingleHashes]] the output is ordered and not distinct: element p is
  * the hash of tokens [p, p+window)).
  *
  * Purely numeric inside: each token hashes once ([[RollingHash.hashBytes]]
  * + one avalanche), windows combine with a ROLLING polynomial — O(n) total,
  * not O(n·window) — and the only allocations are two long arrays. The
  * string formulation this replaces (`transform(sequence(...), p =>
  * xxhash64(concat_ws(' ', slice(toks, p+1, w))))`) materialized every
  * window as a string: ~window× the corpus text in young-gen garbage PER
  * PASS, twice per span-dedup run — measured as 9% of executor time in GC
  * at the 100× bench point. Values are internal (count pass + Bloom gate
  * must agree — same expression both sides); 64-bit collisions only create
  * candidate ghosts the exact md5 verify kills. */
case class TokenWindowHashes(child: Expression, window: Int)
    extends UnaryExpression {
  require(window > 0, "window must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_window_hashes expects ARRAY<STRING>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TokenWindowHashes.compute(input.asInstanceOf[ArrayData], window))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TokenWindowHashes.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $cls.MODULE$$.compute($c, $window));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : TokenWindowHashes = copy(child = newChild)
  override def prettyName: String = "token_window_hashes"
}

object TokenWindowHashes {
  private final val B = 0x100000001b3L // window combine base (FNV prime)

  /** Hashes of each `window`-token window; empty when fewer tokens. */
  def compute(arr: ArrayData, window: Int): Array[Long] = {
    val n = arr.numElements()
    if (n < window) return Array.emptyLongArray
    // pass 1: one avalanche-mixed hash per token (mix spreads rolling-hash
    // deltas of short tokens across all 64 bits before the combine)
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) =
        if (arr.isNullAt(i)) 0L
        else MinHashSig.mix(RollingHash.hashBytes(arr.getUTF8String(i).getBytes))
      i += 1
    }
    // pass 2: rolling polynomial h(p+1) = (h(p) − th(p)·B^(w−1))·B + th(p+w)
    var topPow = 1L
    var j = 1
    while (j < window) { topPow *= B; j += 1 }
    val out = new Array[Long](n - window + 1)
    var h = 0L
    var p = 0
    while (p < window) { h = h * B + th(p); p += 1 }
    out(0) = h
    var q = 1
    while (q <= n - window) {
      h = (h - th(q - 1) * topPow) * B + th(q + window - 1)
      out(q) = h
      q += 1
    }
    out
  }
}

/** DSIR hashed-n-gram feature buckets in ONE scan over the token array:
  * for each unigram and each adjacent bigram ("t1 t2"), the top `nibbles`
  * hex digits of its md5 as a base-16 number — bit-identical to the former
  * `conv(substring(md5(f), 1, nibbles), 16, 10)` over a UNION of two
  * explodes, which tokenized every document twice and paid a 32-char hex
  * string + a base-16 string parse per feature (~200 feature strings per
  * document at the 100× bench point). The digest is the same md5 over the
  * same UTF-8 bytes (bigrams feed the digest as t1, ' ', t2 — no concat
  * allocation); only the hex round-trip is gone, so the DuckDB oracle
  * keeps replaying the SQL chain and values match exactly.
  * Ref bucketing: Xie et al. 2023 (DSIR), hashed n-gram features. */
case class DsirBuckets(child: Expression, nibbles: Int)
    extends UnaryExpression {
  require(nibbles >= 1 && nibbles <= 4, s"nibbles $nibbles outside [1,4]")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dsir_buckets expects ARRAY<STRING>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      DsirBuckets.compute(input.asInstanceOf[ArrayData], nibbles))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = DsirBuckets.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $cls.MODULE$$.compute($c, $nibbles));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : DsirBuckets = copy(child = newChild)
  override def prettyName: String = "dsir_buckets"
}

object DsirBuckets {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private final val Space = Array(' '.toByte)

  /** Top `nibbles` hex digits of the digest as a base-16 number — exactly
    * `conv(substring(hex, 1, nibbles), 16, 10)`. */
  private def topNibbles(digest: Array[Byte], nibbles: Int): Long = {
    var v = 0L
    var i = 0
    while (i < nibbles) {
      val nib = (digest(i >> 1) >>> (4 * (1 - (i & 1)))) & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }

  /** Unigram buckets (one per token) then bigram buckets (len-1 of them
    * when len ≥ 2); null tokens digest as empty strings (tokenizers here
    * never emit them — defensive only). */
  def compute(arr: ArrayData, nibbles: Int): Array[Long] = {
    val n = arr.numElements()
    if (n == 0) return Array.emptyLongArray
    val md = md5.get()
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      bytes(i) =
        if (arr.isNullAt(i)) Array.emptyByteArray
        else arr.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Long](if (n >= 2) 2 * n - 1 else n)
    i = 0
    while (i < n) {
      md.reset()
      out(i) = topNibbles(md.digest(bytes(i)), nibbles)
      i += 1
    }
    var j = 0
    while (j < n - 1) {
      md.reset()
      md.update(bytes(j)); md.update(Space); md.update(bytes(j + 1))
      out(n + j) = topNibbles(md.digest(), nibbles)
      j += 1
    }
    out
  }
}
