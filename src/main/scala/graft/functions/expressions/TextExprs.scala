package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{column => _, _}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the three profiled-hot text/vector
  * signature computations. The pure-`Column` higher-order-function versions
  * (Dedup.simhash64Hof, nested transform/aggregate lambdas) evaluate
  * interpreted, re-materializing arrays per lambda step — profiling at sf0.1
  * showed 6–30 s per 5000-document pass. These expressions run one tight
  * JVM loop per row and participate in whole-stage codegen via a static
  * `compute` call (generated code: `TextExprs.simhash64(input)`), which is
  * the SURVEY §2.11 "promote to Expression when profiling demands" tier.
  *
  * Hashing uses Spark's own XxHash64Function — deterministic, seed-stable,
  * no external dependency.
  */
object TextExprs {
  import org.apache.spark.sql.catalyst.expressions.XxHash64Function

  private def hashString(s: String, seed: Long): Long =
    XxHash64Function.hash(UTF8String.fromString(s), StringType, seed)

  private def hashLong(v: Long, seed: Long): Long =
    XxHash64Function.hash(v, LongType, seed)

  /** Tokenization identical to split(lower(trim(text)), "\\s+"). */
  def tokens(text: UTF8String): Array[String] = {
    // SQL trim strips ONLY spaces (not \t), unlike String.trim.
    var s = text.toString
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    s = s.substring(lo, hi).toLowerCase
    s.split("\\s+", -1)
  }

  /** 64-bit SimHash: per-bit ±1 majority over token hashes. */
  def simhash64(text: UTF8String): Long = {
    val toks = tokens(text)
    val counts = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = hashString(toks(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** k-permutation MinHash over distinct word n-shingles. One pass: for each
    * shingle, k seeded hashes, running min.
    */
  def minhashSig(text: UTF8String, n: Int, k: Int): ArrayData = {
    val toks = tokens(text)
    val sig = Array.fill(k)(Long.MaxValue)
    if (toks.length >= n) {
      val seen = new java.util.HashSet[String]()
      var i = 0
      while (i + n <= toks.length) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        val sh = sb.toString
        if (seen.add(sh)) {
          var p = 0
          while (p < k) {
            val h = hashString(sh, p.toLong)
            if (h < sig(p)) sig(p) = h
            p += 1
          }
        }
        i += 1
      }
    }
    new GenericArrayData(sig)
  }

  /** Sign-random-projection LSH keys: `bands` keys of `bits` Rademacher
    * sign bits each; plane component sign from XXH64(plane, dim, seed).
    */
  def srpKeys(vec: ArrayData, bands: Int, bits: Int, seed: Int): ArrayData = {
    val v = vec.toFloatArray()
    val keys = new Array[Long](bands)
    var band = 0
    while (band < bands) {
      var key = 0L
      var bit = 0
      while (bit < bits) {
        val plane = band * bits + bit
        var proj = 0.0
        var d = 0
        while (d < v.length) {
          val h = hashLong((plane.toLong << 32) | (d.toLong & 0xFFFFFFFFL), seed.toLong)
          val sign = if ((h & 1L) == 0L) 1.0 else -1.0
          proj += v(d).toDouble * sign
          d += 1
        }
        if (proj > 0) key |= (1L << bit)
        bit += 1
      }
      keys(band) = key
      band += 1
    }
    new GenericArrayData(keys)
  }

  /** Symmetric per-vector int8 quantization: q[i] = round(v[i] · 127/max|v|)
    * ∈ [-127, 127]. The scale is PER VECTOR and cancels out of the cosine
    * (dot/|a||b|), so quantized cosine needs no side table of scales — the
    * whole index is 1 byte/dim, 4× less scan bandwidth than float32 in the
    * candidate-scoring loop. A zero vector quantizes to zeros (its cosine is
    * 0 against everything, matching the float path's convention).
    */
  def quantize8(vec: ArrayData): ArrayData = {
    val v = vec.toFloatArray()
    var maxAbs = 0f
    var i = 0
    while (i < v.length) { val a = math.abs(v(i)); if (a > maxAbs) maxAbs = a; i += 1 }
    val q = new Array[Byte](v.length)
    if (maxAbs > 0f) {
      val s = 127.0 / maxAbs
      i = 0
      while (i < v.length) { q(i) = math.round(v(i) * s).toByte; i += 1 }
    }
    new GenericArrayData(q)
  }

  /** Cosine over int8-quantized vectors — pure integer accumulation (a
    * 64-dim dot of ±127 values peaks at ~10^6, nowhere near Long range),
    * one divide + two sqrts per pair.
    */
  def quantCosine(a: ArrayData, b: ArrayData): Double = {
    val x = a.toByteArray()
    val y = b.toByteArray()
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    while (i < x.length) {
      dot += x(i).toLong * y(i)
      na += x(i).toLong * x(i)
      nb += y(i).toLong * y(i)
      i += 1
    }
    if (na == 0L || nb == 0L) 0.0
    else dot / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  /** Squared L2 distance over float arrays, double accumulation — the
    * quantizer-training metric (PQ codebooks encode by nearest-in-L2).
    */
  def l2Sq(a: ArrayData, b: ArrayData): Double = {
    val x = a.toFloatArray()
    val y = b.toFloatArray()
    var s = 0.0
    var i = 0
    while (i < x.length) {
      val d = x(i).toDouble - y(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  /** Plain dot product over float arrays, double accumulation — the ADC
    * lookup-table entry (approximate dot(query, vec) = Σ per-subspace
    * dot(query_sub, codeword)).
    */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val x = a.toFloatArray()
    val y = b.toFloatArray()
    var s = 0.0
    var i = 0
    while (i < x.length) { s += x(i).toDouble * y(i).toDouble; i += 1 }
    s
  }

  /** Exact cosine similarity, double accumulation in ascending index order —
    * bit-identical to the sequential SQL formulation the DuckDB oracle runs.
    */
  def cosineSim(a: ArrayData, b: ArrayData): Double = {
    val x = a.toFloatArray()
    val y = b.toFloatArray()
    var dot = 0.0
    var i = 0
    while (i < x.length) { dot += x(i).toDouble * y(i).toDouble; i += 1 }
    var na = 0.0
    i = 0
    while (i < x.length) { na += x(i).toDouble * x(i).toDouble; i += 1 }
    var nb = 0.0
    i = 0
    while (i < y.length) { nb += y(i).toDouble * y(i).toDouble; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // --- text-stat kernels (the quality-filter hot path) --------------------
  //
  // Native, codegen'd byte-scan twins of the Column formulations in
  // graft.functions.Text (optimization guide §4: eliminate interpreted
  // higher-order functions / per-row regex passes in the hot path). Each is
  // VALUE-IDENTICAL to the expression it replaces — the equivalences are
  // spelled out per function and pinned by TextNativeStatsSpec against the
  // original Column formulations on a randomized corpus; the text_stats /
  // text_quality / text_quality_filter / text_sql_quality oracle gates pin
  // them against DuckDB end-to-end.

  /** ASCII whitespace exactly as Java regex \s: [ \t\n\x0B\f\r]. */
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** ASCII \p{Punct} (Java regex, non-UNICODE_CHARACTER_CLASS): 33-47,
    * 58-64, 91-96, 123-126.
    */
  @inline private def isPunct(b: Byte): Boolean = {
    val c = b & 0xFF
    (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
      (c >= 91 && c <= 96) || (c >= 123 && c <= 126)
  }

  /** == when(length(trim(text)) = 0, 0).otherwise(size(split(trim(text),
    * "\\s+"))): SQL trim strips ONLY spaces; Java split with limit -1 keeps
    * leading/trailing empty segments, so the segment count is (number of
    * \s-runs) + 1 on a non-empty space-trimmed string.
    */
  def tokenCountNat(text: UTF8String): Int = {
    val b = text.getBytes
    var lo = 0
    var hi = b.length
    while (lo < hi && b(lo) == ' ') lo += 1
    while (hi > lo && b(hi - 1) == ' ') hi -= 1
    if (lo == hi) return 0
    var runs = 0
    var inWs = false
    var i = lo
    while (i < hi) {
      val ws = isWs(b(i))
      if (ws && !inWs) runs += 1
      inWs = ws
      i += 1
    }
    runs + 1
  }

  /** == length(regexp_replace(text, "\\s+", "")) / greatest(tokenCount, 1):
    * the numerator is chars minus \s chars (each ASCII ws char is one byte
    * AND one char; multi-byte chars are never \s).
    */
  def meanTokenLenNat(text: UTF8String): Double = {
    val b = text.getBytes
    var ws = 0
    var i = 0
    while (i < b.length) { if (isWs(b(i))) ws += 1; i += 1 }
    (text.numChars() - ws).toDouble /
      math.max(tokenCountNat(text), 1).toDouble
  }

  /** == (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))) /
    * greatest(length(text), 1): punct chars are single ASCII bytes.
    */
  def punctRatioNat(text: UTF8String): Double = {
    val b = text.getBytes
    var p = 0
    var i = 0
    while (i < b.length) { if (isPunct(b(i))) p += 1; i += 1 }
    p.toDouble / math.max(text.numChars(), 1).toDouble
  }

  /** == length(regexp_replace(text, "[^A-Za-z]", "")) /
    * greatest(length(text), 1).
    */
  def alphaRatioNat(text: UTF8String): Double = {
    val b = text.getBytes
    var a = 0
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) a += 1
      i += 1
    }
    a.toDouble / math.max(text.numChars(), 1).toDouble
  }

  private val StopwordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("the", "a", "an", "of", "to", "in", "and", "is",
      "it", "that", "for", "on", "with", "as", "at", "by", "or", "be")
      .foreach(s.add)
    s
  }

  /** == size(filter(split(lower(trim(text)), "\\s+"), t =>
    * array_contains(Stopwords, t))) / greatest(size(split(...)), 1).
    * Tokenization goes through UTF8String.trim/toLowerCase — the EXACT
    * kernels Spark's trim()/lower() call — then the same Java regex split,
    * so token sets are bit-identical; the interpreted per-token
    * filter × array_contains(18) HOF becomes one hash-set probe per token.
    */
  def stopwordRatioNat(text: UTF8String): Double = {
    val toks = text.trim().toLowerCase.toString.split("\\s+", -1)
    var n = 0
    var i = 0
    while (i < toks.length) { if (StopwordSet.contains(toks(i))) n += 1; i += 1 }
    n.toDouble / math.max(toks.length, 1).toDouble
  }

  // --- Column API ---------------------------------------------------------

  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  def tokenCountCol(text: Column): Column =
    column(TokenCountNatExpr(expression(text)))
  def meanTokenLenCol(text: Column): Column =
    column(MeanTokenLenNatExpr(expression(text)))
  def punctRatioCol(text: Column): Column =
    column(PunctRatioNatExpr(expression(text)))
  def alphaRatioCol(text: Column): Column =
    column(AlphaRatioNatExpr(expression(text)))
  def stopwordRatioCol(text: Column): Column =
    column(StopwordRatioNatExpr(expression(text)))

  def cosineSimCol(a: Column, b: Column): Column =
    column(CosineSimExpr(expression(a), expression(b)))
  def simhash64Col(text: Column): Column = column(SimHash64Expr(expression(text)))
  def minhashSigCol(text: Column, n: Int, k: Int): Column =
    column(MinHashSigExpr(expression(text), n, k))
  def srpKeysCol(vec: Column, bands: Int, bits: Int, seed: Int): Column =
    column(SrpKeysExpr(expression(vec), bands, bits, seed))
  def quantize8Col(vec: Column): Column = column(Quantize8Expr(expression(vec)))
  def quantCosineCol(a: Column, b: Column): Column =
    column(QuantCosineExpr(expression(a), expression(b)))
  def l2SqCol(a: Column, b: Column): Column =
    column(L2SqExpr(expression(a), expression(b)))
  def dotCol(a: Column, b: Column): Column =
    column(DotExpr(expression(a), expression(b)))
}

case class CosineSimExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextExprs.cosineSim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.TextExprs.cosineSim($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
    copy(left = l, right = r)
}

case class SimHash64Expr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextExprs.simhash64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TextExprs.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

case class MinHashSigExpr(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextExprs.minhashSig(input.asInstanceOf[UTF8String], n, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TextExprs.minhashSig($c, $n, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

case class L2SqExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextExprs.l2Sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.TextExprs.l2Sq($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2SqExpr =
    copy(left = l, right = r)
}

case class DotExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextExprs.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.TextExprs.dotF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotExpr =
    copy(left = l, right = r)
}

case class Quantize8Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextExprs.quantize8(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TextExprs.quantize8($c)")
  override protected def withNewChildInternal(newChild: Expression): Quantize8Expr =
    copy(child = newChild)
}

case class QuantCosineExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextExprs.quantCosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.TextExprs.quantCosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantCosineExpr =
    copy(left = l, right = r)
}

case class SrpKeysExpr(child: Expression, bands: Int, bits: Int, seed: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextExprs.srpKeys(input.asInstanceOf[ArrayData], bands, bits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TextExprs.srpKeys($c, $bands, $bits, $seed)")
  override protected def withNewChildInternal(newChild: Expression): SrpKeysExpr =
    copy(child = newChild)
}

case class TokenCountNatExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullSafeEval(input: Any): Any =
    TextExprs.tokenCountNat(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TextExprs.tokenCountNat($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenCountNatExpr =
    copy(child = newChild)
}

case class MeanTokenLenNatExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    TextExprs.meanTokenLenNat(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TextExprs.meanTokenLenNat($c)")
  override protected def withNewChildInternal(newChild: Expression): MeanTokenLenNatExpr =
    copy(child = newChild)
}

case class PunctRatioNatExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    TextExprs.punctRatioNat(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TextExprs.punctRatioNat($c)")
  override protected def withNewChildInternal(newChild: Expression): PunctRatioNatExpr =
    copy(child = newChild)
}

case class AlphaRatioNatExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    TextExprs.alphaRatioNat(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TextExprs.alphaRatioNat($c)")
  override protected def withNewChildInternal(newChild: Expression): AlphaRatioNatExpr =
    copy(child = newChild)
}

case class StopwordRatioNatExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    TextExprs.stopwordRatioNat(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TextExprs.stopwordRatioNat($c)")
  override protected def withNewChildInternal(newChild: Expression): StopwordRatioNatExpr =
    copy(child = newChild)
}
