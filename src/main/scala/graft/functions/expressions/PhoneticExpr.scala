package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** GREL `phonetic(s, mode)` (reference GRELFunctions.java:655-670) as a
  * codegen'd expression over the commons-codec language encoders that ship
  * on Spark's own classpath (no added dependency). Modes: soundex,
  * metaphone, doublemetaphone, cologne. The reference also names
  * "metaphone3", whose canonical implementation is not freely licensed —
  * requesting it fails loudly at plan time rather than silently aliasing
  * another algorithm.
  *
  * The codec objects hold only configuration state (maxCodeLen), but
  * commons-codec documents no thread-safety guarantee for encode — Spark
  * shares generated code across a task thread only, yet the static helper
  * here may be hit from many tasks, so instances are per-thread.
  */
object Phonetic {
  private def tl[T <: AnyRef](mk: => T) = ThreadLocal.withInitial(() => mk)
  private val soundex = tl(new org.apache.commons.codec.language.Soundex())
  private val metaphone = tl(new org.apache.commons.codec.language.Metaphone())
  private val doubleMetaphone = tl(new org.apache.commons.codec.language.DoubleMetaphone())
  private val cologne = tl(new org.apache.commons.codec.language.ColognePhonetic())

  def validateMode(mode: String): String = mode match {
    case "soundex" | "metaphone" | "doublemetaphone" | "cologne" => mode
    case "metaphone3" => throw new IllegalArgumentException(
      "phonetic mode 'metaphone3' has no freely-licensed implementation; use 'doublemetaphone'")
    case other => throw new IllegalArgumentException(s"unknown phonetic mode: $other")
  }

  /** Soundex/Metaphone accept only A-Z: commons-codec throws
    * IllegalArgumentException on any other letter ("José" would fail the
    * whole job). Fold diacritics to their base letters (NFD + strip marks)
    * and drop what remains non-ASCII — the lossy-but-total behavior a
    * phonetic key wants.
    */
  private def asciiLetters(s: String): String = {
    val folded = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(folded.length)
    var i = 0
    while (i < folded.length) {
      val ch = folded.charAt(i)
      if ((ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z') || ch == ' ') sb.append(ch)
      i += 1
    }
    sb.toString
  }

  // Per-mode entry points (same pattern as [[EscapeText]]): the mode is a
  // CONSTANT of the expression, so it resolves to a method name once at plan
  // time — the per-row path is one static call, no mode-string allocation or
  // comparison chain on the hot path.
  def soundexEnc(s: UTF8String): UTF8String =
    UTF8String.fromString(soundex.get.encode(asciiLetters(s.toString)))
  def metaphoneEnc(s: UTF8String): UTF8String =
    UTF8String.fromString(metaphone.get.encode(asciiLetters(s.toString)))
  def doubleMetaphoneEnc(s: UTF8String): UTF8String =
    UTF8String.fromString(doubleMetaphone.get.encode(s.toString))
  def cologneEnc(s: UTF8String): UTF8String =
    UTF8String.fromString(cologne.get.encode(s.toString))

  // ONE dispatch table: method name (codegen) and implementation
  // (interpreted eval) in the same entry, so the two paths cannot diverge.
  private val impls: Map[String, (String, UTF8String => UTF8String)] = Map(
    "soundex" -> (("soundexEnc", soundexEnc)),
    "metaphone" -> (("metaphoneEnc", metaphoneEnc)),
    "doublemetaphone" -> (("doubleMetaphoneEnc", doubleMetaphoneEnc)),
    "cologne" -> (("cologneEnc", cologneEnc)))

  /** The resolved (static-method name, implementation) for a validated mode. */
  def resolve(mode: String): (String, UTF8String => UTF8String) =
    impls(validateMode(mode))
}

case class PhoneticExpr(child: Expression, mode: String) extends UnaryExpression {
  private val fnName = Phonetic.resolve(mode)._1 // validates at construction
  @transient private lazy val fn = Phonetic.resolve(mode)._2
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any = fn(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.Phonetic.$fnName($c)")
  override protected def withNewChildInternal(newChild: Expression): PhoneticExpr =
    copy(child = newChild)
}

object PhoneticExpr {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
  def phoneticCol(c: Column, mode: String): Column =
    column(PhoneticExpr(expression(c), mode))
  def reinterpretCol(c: Column, charset: String): Column =
    column(ReinterpretExpr(expression(c), charset))
  def unescapeJsCol(c: Column): Column = column(UnescapeJsExpr(expression(c)))
}

/** GREL `reinterpret(s, charset)` (reference GRELFunctions.java:673-683):
  * round-trip through `charset` with Java String.getBytes replace semantics
  * (unmappable characters become '?'), matching OpenRefine. Spark 4's own
  * encode() is strict (MALFORMED_CHARACTER_CODING) — the wrong contract here.
  */
object Reinterpret {
  def validate(charset: String): String = { java.nio.charset.Charset.forName(charset); charset }

  /** Serializable charset holder: `Charset` itself is not Serializable, so
    * the expression references THIS (name travels, instance re-resolves
    * lazily per JVM) — the per-row path never calls Charset.forName.
    */
  final class Resolved(val name: String) extends Serializable {
    @transient lazy val cs: java.nio.charset.Charset =
      java.nio.charset.Charset.forName(name)
  }

  def reinterpret(s: UTF8String, r: Resolved): UTF8String =
    UTF8String.fromString(new String(s.toString.getBytes(r.cs), r.cs))
}

/** GREL escape/unescape for html | xml | javascript via commons-text — the
  * reference's own backend chain (GRELFunctions.java:602-623 → io.fno.grel
  * StringFunctions → commons-text StringEscapeUtils), which already ships
  * on Spark's classpath. Chained entity replaces cannot reproduce
  * escapeHtml4's full HTML4 entity table ("é" → "&eacute;"), ecmascript's
  * \uXXXX/non-ASCII escaping, or numeric-entity decoding — delegating to
  * the exact library the reference calls makes divergence impossible.
  * unescape("javascript") stays on [[UnescapeJs]]: commons-text throws on
  * malformed \uXXXX, and the pipeline contract is lenient. The translator
  * objects behind the static methods are immutable — thread-safe.
  */
object EscapeText {
  import org.apache.commons.text.StringEscapeUtils
  // Per-mode entry points: (mode, un) is a CONSTANT of the expression, so it
  // resolves to a method name once at plan time — the per-row path is a
  // single static call, no mode-string allocation or comparison chain.
  def escapeHtml(s: UTF8String): UTF8String =
    UTF8String.fromString(StringEscapeUtils.escapeHtml4(s.toString))
  def escapeXml(s: UTF8String): UTF8String =
    UTF8String.fromString(StringEscapeUtils.escapeXml11(s.toString))
  def escapeJs(s: UTF8String): UTF8String =
    UTF8String.fromString(StringEscapeUtils.escapeEcmaScript(s.toString))
  def unescapeHtml(s: UTF8String): UTF8String =
    UTF8String.fromString(StringEscapeUtils.unescapeHtml4(s.toString))
  def unescapeXml(s: UTF8String): UTF8String =
    UTF8String.fromString(StringEscapeUtils.unescapeXml(s.toString))

  // ONE dispatch table: method name (for codegen) and implementation (for
  // interpreted eval) live in the same entry, so the two execution paths
  // cannot diverge when a mode is added.
  private val impls: Map[(String, Boolean), (String, UTF8String => UTF8String)] = Map(
    ("html", false) -> (("escapeHtml", escapeHtml)),
    ("xml", false) -> (("escapeXml", escapeXml)),
    ("javascript", false) -> (("escapeJs", escapeJs)),
    ("html", true) -> (("unescapeHtml", unescapeHtml)),
    ("xml", true) -> (("unescapeXml", unescapeXml)))

  /** The resolved (static-method name, implementation) for (mode, un);
    * rejects unsupported combinations at plan time (unescape("javascript")
    * lives on [[UnescapeJs]] — commons-text throws on malformed \uXXXX and
    * the pipeline contract is lenient).
    */
  def resolve(mode: String, un: Boolean): (String, UTF8String => UTF8String) =
    impls.getOrElse((mode, un), throw new IllegalArgumentException(
      s"unsupported EscapeText mode: $mode (un=$un)"))
}

case class EscapeTextExpr(child: Expression, mode: String, un: Boolean)
    extends UnaryExpression {
  private val fnName = EscapeText.resolve(mode, un)._1 // validates at construction
  @transient private lazy val fn = EscapeText.resolve(mode, un)._2
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any = fn(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.EscapeText.$fnName($c)")
  override protected def withNewChildInternal(newChild: Expression): EscapeTextExpr =
    copy(child = newChild)
}

object EscapeTextExpr {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
  def escapeCol(c: Column, mode: String): Column =
    column(EscapeTextExpr(expression(c), mode, un = false))
  def unescapeCol(c: Column, mode: String): Column =
    column(EscapeTextExpr(expression(c), mode, un = true))
}

/** GREL `unescape(s, "javascript")` — a real single-pass decoder. Chained
  * regexp replaces cannot decode backslash escapes correctly (the tail byte
  * of an escaped backslash gets re-read as the start of "\n"), and a
  * sentinel-character workaround silently corrupts inputs that already
  * contain the sentinel. A linear scan has neither problem.
  *
  * Semantics match commons-text 1.14 `unescapeEcmaScript` (the reference's
  * backend via io.fno.grel StringFunctions), verified empirically against
  * that library: named escapes, `\uXXXX` (including the multi-u and plus
  * forms `\uuXXXX` / `\u+XXXX`), octal `\0`–`\377` (3rd digit only
  * when the first is ≤ 3), unknown escapes DROP the backslash (`\q` → `q`,
  * `\x42` → `x42` — commons-text does NOT hex-decode \x), and a trailing
  * backslash is dropped. ONE deliberate deviation: malformed `\uXXXX`
  * passes through verbatim where commons-text throws
  * IllegalArgumentException — a pipeline must not fail the job on one bad
  * string (same lenient contract as the rest of the GREL surface).
  */
object UnescapeJs {
  /** Parse `n` hex digits at `from`; -1 if any is not a hex digit. */
  private def hex(in: String, from: Int, n: Int): Int = {
    if (from + n > in.length) return -1
    var v = 0
    var i = from
    while (i < from + n) {
      val d = Character.digit(in.charAt(i), 16)
      if (d < 0) return -1
      v = (v << 4) | d
      i += 1
    }
    v
  }

  private def isOct(c: Char): Boolean = c >= '0' && c <= '7'

  def unescape(s: UTF8String): UTF8String = {
    val in = s.toString
    if (in.indexOf('\\') < 0) return s
    val sb = new java.lang.StringBuilder(in.length)
    var i = 0
    while (i < in.length) {
      val ch = in.charAt(i)
      if (ch == '\\' && i + 1 < in.length) {
        in.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '"' => sb.append('"'); i += 2
          case '\'' => sb.append('\''); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '/' => sb.append('/'); i += 2
          case 'u' =>
            // commons-text accepts a run of 'u's then one optional '+'
            // before the 4 hex digits (\uu0041, \u+0041 → 'A') — verified
            var j = i + 2
            while (j < in.length && in.charAt(j) == 'u') j += 1
            if (j < in.length && in.charAt(j) == '+') j += 1
            val cp = hex(in, j, 4)
            if (cp >= 0) { sb.append(cp.toChar); i = j + 4 }
            else { sb.append(ch).append('u'); i += 2 } // deviation: lenient
          case d if isOct(d) =>
            var v = d - '0'
            var len = 1
            if (i + 2 < in.length && isOct(in.charAt(i + 2))) {
              v = v * 8 + (in.charAt(i + 2) - '0'); len = 2
              if (d <= '3' && i + 3 < in.length && isOct(in.charAt(i + 3))) {
                v = v * 8 + (in.charAt(i + 3) - '0'); len = 3
              }
            }
            sb.append(v.toChar); i += 1 + len
          case other => sb.append(other); i += 2 // unknown: backslash dropped
        }
      } else if (ch == '\\') {
        i += 1 // trailing backslash dropped (commons-text)
      } else { sb.append(ch); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }
}

case class UnescapeJsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UnescapeJs.unescape(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.UnescapeJs.unescape($c)")
  override protected def withNewChildInternal(newChild: Expression): UnescapeJsExpr =
    copy(child = newChild)
}

case class ReinterpretExpr(child: Expression, charset: String) extends UnaryExpression {
  Reinterpret.validate(charset)
  @transient private lazy val csResolved = new Reinterpret.Resolved(charset)
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    Reinterpret.reinterpret(input.asInstanceOf[UTF8String], csResolved)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val csRef = ctx.addReferenceObj("reinterpretCharset",
      new Reinterpret.Resolved(charset), classOf[Reinterpret.Resolved].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.Reinterpret.reinterpret($c, $csRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): ReinterpretExpr =
    copy(child = newChild)
}
