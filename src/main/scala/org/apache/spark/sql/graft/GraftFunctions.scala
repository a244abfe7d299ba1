package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing PortableHash's polynomial
  * rolling hash: H(s) = fold over code points of (acc·31 + cp) mod P.
  *
  * Same value as the higher-order-function formulation
  * (`aggregate(split(s,''), ...)`, `PortableHash.polyHashHofSql`) and as
  * the DuckDB oracle twin (`PortableHash.duckPolyHash`), but executed as
  * one codegen'd JVM loop per value instead of an interpreted Catalyst
  * lambda per CHARACTER. `doGenCode` delegates to a static helper, so
  * hashing stays inside whole-stage codegen spans. */
case class PolyHash(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  protected override def nullSafeEval(input: Any): Any =
    PolyHash.compute(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.spark.sql.graft.PolyHash.compute($c)")

  protected override def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val P: Long = 1000000007L

  /** Static helper the generated code calls (the companion class gets a
    * static forwarder, so `...graft.PolyHash.compute` is valid Java).
    * Iterates CODE POINTS to match `ascii()` / DuckDB `ord()`. */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      acc = (acc * 31 + cp) % P
    }
    acc
  }
}

/** Native Catalyst expression emitting the distinct hashed word
  * W-shingles of a text column as `array<long>` — the fused form of
  *
  * {{{ transform(array_distinct(shingles(tokens(text))), polyhash) }}}
  *
  * Semantics replicate the built-in pipeline exactly (and therefore the
  * DuckDB oracle): lower-case, collapse `[\p{Punct} ]+` runs to one
  * space, split on single spaces keeping boundary empties (Java
  * `split(" ", -1)` — same as Spark's `split`), join each W-token
  * window with single spaces, PolyHash the joined string, distinct.
  * Texts shorter than W tokens yield one hash of the whole normalized
  * string.
  *
  * Why native: the HOF formulation is interpreted per shingle AND
  * Catalyst's CollapseProject inlines the token-array expression at each
  * of its three use sites, re-running the regexp per row per site —
  * measured 7.3s/pass at sf0.1 vs ~0.3s for this expression. One
  * compiled pass, no intermediate shingle strings, stays inside
  * whole-stage codegen. */
case class ShingleHashes(child: Expression, width: Int = 5)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  protected override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], width)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.ShingleHashes.compute($c, $width)")

  protected override def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private final val P = PolyHash.P

  /** Java-regex `\p{Punct}` = the 32 ASCII punctuation chars, i.e.
    * 0x21..0x7E minus letters/digits. DEL (0x7F) is NOT punct in either
    * Java or DuckDB's `[[:punct:]]`, so the range is open at 127. */
  private def isPunctOrSpace(cp: Int): Boolean =
    cp == ' ' || (cp > 32 && cp < 127 && !Character.isLetterOrDigit(cp))

  /** Shared normalize→tokenize pass: lower-case, collapse
    * `[\p{Punct} ]+` runs to one space, split on single spaces keeping
    * boundary empties (Java `split(" ", -1)`, same as Spark's `split`
    * and DuckDB's `string_split`). */
  private def normTokens(s: UTF8String): Array[String] = {
    val str = s.toLowerCase.toString
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    var inRun = false
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      if (isPunctOrSpace(cp)) {
        if (!inRun) { sb.append(' '); inRun = true }
      } else { sb.appendCodePoint(cp); inRun = false }
    }
    sb.toString.split(" ", -1)
  }

  private def hashOf(sh: String): Long = {
    var acc = 0L
    var j = 0
    while (j < sh.length) {
      val cp = sh.codePointAt(j)
      j += Character.charCount(cp)
      acc = (acc * 31 + cp) % P
    }
    acc
  }

  /** POSITIONAL variant: one hash per W-token window in document
    * order, NO dedup — entry k is the shingle starting at token k.
    * Texts shorter than W tokens yield one hash of the whole
    * normalized string (position 0). `posexplode` over this array is
    * the (position, passage-hash) index that substring-level dedup
    * builds on. */
  def computePos(s: UTF8String, width: Int): ArrayData = {
    val tokens = normTokens(s)
    def shingleStr(from: Int, until: Int): String = {
      val b = new java.lang.StringBuilder()
      var t = from
      while (t < until) {
        if (t > from) b.append(' ')
        b.append(tokens(t))
        t += 1
      }
      b.toString
    }
    val n = if (tokens.length >= width) tokens.length - width + 1 else 1
    val arr = new Array[Long](n)
    var w = 0
    while (w < n) {
      arr(w) = hashOf(shingleStr(w, math.min(w + width, tokens.length)))
      w += 1
    }
    new GenericArrayData(arr)
  }

  def compute(s: UTF8String, width: Int): ArrayData = {
    val tokens = normTokens(s)
    // Dedup by shingle STRING (not by hash): `array_distinct` and the
    // oracle's `list_distinct` both dedup the strings BEFORE hashing,
    // so two distinct shingles colliding mod P must yield two (equal)
    // entries here too — dedup-by-hash would drop one and silently
    // shrink union sizes / df counts relative to the oracle.
    val seen = new java.util.LinkedHashSet[String]()
    def shingleStr(from: Int, until: Int): String = {
      val b = new java.lang.StringBuilder()
      var t = from
      while (t < until) {
        if (t > from) b.append(' ')
        b.append(tokens(t))
        t += 1
      }
      b.toString
    }
    if (tokens.length >= width) {
      var w = 0
      while (w <= tokens.length - width) {
        seen.add(shingleStr(w, w + width))
        w += 1
      }
    } else {
      seen.add(shingleStr(0, tokens.length))
    }
    val arr = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      arr(k) = hashOf(it.next())
      k += 1
    }
    new GenericArrayData(arr)
  }
}

/** Positional sibling of [[ShingleHashes]]: entry k is the hash of the
  * W-token shingle STARTING AT TOKEN k, document order, no dedup —
  * `array<long>` of length `max(1, n_tokens − W + 1)`. `posexplode`
  * over it yields the (position, passage-hash) index that
  * substring-level dedup (Lee et al. 2022-style) builds on: a window
  * repeated across documents covers tokens `[k, k+W)` of each. Same
  * tokenizer, same PolyHash, same short-text fallback as the distinct
  * form, so the two expressions agree wherever both are defined. */
case class ShingleHashesPos(child: Expression, width: Int = 5)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes_pos"

  protected override def nullSafeEval(input: Any): Any =
    ShingleHashes.computePos(input.asInstanceOf[UTF8String], width)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.ShingleHashes.computePos($c, $width)")

  protected override def withNewChildInternal(newChild: Expression): ShingleHashesPos =
    copy(child = newChild)
}

/** Native float-vector dot product in DOUBLE precision: the fused,
  * codegen'd form of
  *
  * {{{ aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, (acc,v) -> acc+v) }}}
  *
  * Bit-identical to that HOF formulation and to the DuckDB oracle's
  * `list_reduce` twin — a strict left fold of `acc + a(i)·b(i)` with
  * each float widened to double — but one compiled loop per pair
  * instead of ~2·dim interpreted lambda frames. Folds over the shorter
  * length if the arrays disagree (zip semantics). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"org.apache.spark.sql.graft.DotProduct.compute($a, $b)")

  protected override def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}

/** Threshold-bounded Levenshtein distance tuned for near-dup CONFIRM
  * workloads: `graft_bounded_editdist(a, b, t)` = the exact edit
  * distance when it is ≤ t, −1 otherwise (the same contract as
  * Spark's three-arg `levenshtein`). Two properties make it the
  * confirm-stage engine where the builtin is O(|a|·|b|) DP cells per
  * pair regardless of how similar the strings are:
  *
  *  1. common prefix AND suffix are stripped first (unit-cost edit
  *     distance is invariant under both) — LSH-confirmed candidates
  *     are near-identical, so the surviving middle is typically a few
  *     edits long, not the whole document;
  *  2. the DP that remains runs on the Ukkonen band of width 2t+1 —
  *     O(t · middle) cells with an early −1 exit on the length gap —
  *     so even the adversarial middle (edits at both ends of the doc)
  *     costs t·n, not n².
  *
  * Operates on Unicode code points (the builtin's unit), so values
  * agree with `levenshtein(a, b, t)` on any input — spec-asserted
  * against the builtin on ASCII and astral-plane pairs. */
case class BoundedEditDist(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType, IntegerType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bounded_editdist"

  protected override def nullSafeEval(a: Any, b: Any, t: Any): Any =
    BoundedEditDist.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], t.asInstanceOf[Int])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, t) => s"org.apache.spark.sql.graft.BoundedEditDist.compute($a, $b, $t)")

  protected override def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BoundedEditDist =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BoundedEditDist {
  private final val Inf = Int.MaxValue / 2

  def compute(ua: UTF8String, ub: UTF8String, t: Int): Int = {
    if (t < 0) return -1
    val a = ua.toString.codePoints().toArray
    val b = ub.toString.codePoints().toArray
    // strip the common prefix, then the common suffix of the remainder
    var lo = 0
    var aHi = a.length
    var bHi = b.length
    while (lo < aHi && lo < bHi && a(lo) == b(lo)) lo += 1
    while (aHi > lo && bHi > lo && a(aHi - 1) == b(bHi - 1)) { aHi -= 1; bHi -= 1 }
    // keep the shorter middle on the row axis: O(short · (2t+1)) cells
    val aShort = aHi - lo <= bHi - lo
    val s = if (aShort) a else b
    val l = if (aShort) b else a
    val sHi = if (aShort) aHi else bHi
    val lHi = if (aShort) bHi else aHi
    val n = sHi - lo
    val m = lHi - lo
    if (m - n > t) return -1
    if (n == 0) return m // m - 0 <= t guaranteed by the gap check
    val band = math.min(t, m)
    // two-row band DP; each row writes its full read-window (boundary
    // cell, band cells, one Inf sentinel), so a reference swap carries
    // exactly the cells the next row reads
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= band) j else Inf; j += 1 }
    var i = 1
    while (i <= n) {
      val jLo = math.max(1, i - band)
      val jHi = math.min(m, i + band)
      cur(jLo - 1) = if (jLo == 1 && i <= band) i else Inf
      val si = s(lo + i - 1)
      j = jLo
      while (j <= jHi) {
        val sub = prev(j - 1) + (if (si == l(lo + j - 1)) 0 else 1)
        val del = (if (j < i + band) prev(j) else Inf) + 1
        val ins = cur(j - 1) + 1
        cur(j) = math.min(sub, math.min(del, ins))
        j += 1
      }
      if (jHi < m) cur(jHi + 1) = Inf
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    if (prev(m) <= t) prev(m) else -1
  }
}

/** Native single-pass token counter: `graft_token_counts(text)` =
  * `struct<ws_tokens: bigint, bpe_tokens: bigint>` where
  *
  *  - `ws_tokens`  = `size(split(trim(text), '\s+'))` — whitespace
  *    token count over the space-trimmed text, and
  *  - `bpe_tokens` = `size(regexp_extract_all(text,
  *    '[a-zA-Z0-9_]+|[^a-zA-Z0-9_\s]'))` — the GPT-2-style
  *    pre-tokenizer shape (word-char runs plus single non-space
  *    symbols) over the ORIGINAL text,
  *
  * replicated exactly (PropertySpec-asserted against the regex forms)
  * but computed in ONE compiled scan of the string with no regex
  * engine, no intermediate token arrays, and no per-match object
  * churn. Both regex formulations walk the text independently and
  * allocate an array of token strings only to take its `size`; at
  * 100 TB token counting is pure per-row compute amortizing nothing
  * (sweep ratio 4.39× in round 8), so the constant factor IS the cost.
  *
  * Semantics notes pinned by the spec:
  *  - `trim` strips 0x20 SPACES only (Spark/DuckDB `trim` semantics),
  *    so a text starting with `\t` still yields a leading empty token —
  *    `ws_tokens` counts maximal Java-`\s` runs + 1 on the trimmed
  *    text, which reproduces `split(..., -1)` boundary-empty behavior.
  *  - Word chars are ASCII `[a-zA-Z0-9_]` (the regex is explicit, not
  *    `\w`); any other non-`\s` code point counts as one symbol token,
  *    including non-ASCII letters and Unicode whitespace (U+00A0 is
  *    NOT Java `\s`).
  */
case class TokenCounts(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("ws_tokens", LongType, nullable = false),
    StructField("bpe_tokens", LongType, nullable = false)))
  override def prettyName: String = "graft_token_counts"

  protected override def nullSafeEval(input: Any): Any =
    TokenCounts.compute(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.spark.sql.graft.TokenCounts.compute($c)")

  protected override def withNewChildInternal(newChild: Expression): TokenCounts =
    copy(child = newChild)
}

object TokenCounts {
  /** Java regex `\s` — exactly `[ \t\n\x0B\f\r]`, NOT Unicode spaces. */
  private def isJavaWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  private def isWordChar(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
      (cp >= '0' && cp <= '9') || cp == '_'

  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    // trim = strip leading/trailing 0x20 only (for the ws count)
    var lo = 0
    var hi = str.length
    while (lo < hi && str.charAt(lo) == ' ') lo += 1
    while (hi > lo && str.charAt(hi - 1) == ' ') hi -= 1
    var ws = 1L      // fields = whitespace runs + 1 (split keeps empties)
    var inWsRun = false
    var i = lo
    while (i < hi) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      if (isJavaWs(cp)) {
        if (!inWsRun) { ws += 1; inWsRun = true }
      } else inWsRun = false
    }
    // bpe pass over the ORIGINAL text (regexp_extract_all is untrimmed)
    var bpe = 0L
    var inWordRun = false
    i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      if (isWordChar(cp)) {
        if (!inWordRun) { bpe += 1; inWordRun = true }
      } else {
        inWordRun = false
        if (!isJavaWs(cp)) bpe += 1
      }
    }
    new GenericInternalRow(Array[Any](ws, bpe))
  }
}

/** Registers graft's native Catalyst expressions in a session's
  * FunctionRegistry so they are usable from `expr(...)` strings
  * (including inside higher-order-function lambdas).
  *
  * Lives under `org.apache.spark.sql` because `SparkSession.sessionState`
  * and `AbstractDataType` are `private[sql]`; this is the standard
  * library-extension seam when the session is handed to us already built
  * (the driver contract passes a ready SparkSession, so a
  * `spark.sql.extensions` injection point isn't available). Registration
  * is idempotent and per-session. */
object GraftFunctions {

  /** The three injectable functions, shared by both registration paths. */
  private[graft] val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
      (children: Seq[Expression]) => PolyHash(children.head)),
    (FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      (children: Seq[Expression]) => ShingleHashes(children.head)),
    (FunctionIdentifier("graft_shingle_hashes_pos"),
      new ExpressionInfo(classOf[ShingleHashesPos].getName, "graft_shingle_hashes_pos"),
      (children: Seq[Expression]) => ShingleHashesPos(children.head)),
    (FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKByScore].getName, "graft_topk"),
      (children: Seq[Expression]) => TopKByScore(children(0), children(1), children(2))),
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))),
    (FunctionIdentifier("graft_token_counts"),
      new ExpressionInfo(classOf[TokenCounts].getName, "graft_token_counts"),
      (children: Seq[Expression]) => TokenCounts(children.head)),
    (FunctionIdentifier("graft_bounded_editdist"),
      new ExpressionInfo(classOf[BoundedEditDist].getName, "graft_bounded_editdist"),
      (children: Seq[Expression]) => BoundedEditDist(children(0), children(1), children(2))),
    (FunctionIdentifier("graft_html_elements"),
      new ExpressionInfo(classOf[HtmlElements].getName, "graft_html_elements"),
      (children: Seq[Expression]) => HtmlElements(children.head)),
    (FunctionIdentifier("graft_html_links"),
      new ExpressionInfo(classOf[HtmlLinks].getName, "graft_html_links"),
      (children: Seq[Expression]) => HtmlLinks(children.head)),
    // Spark's own runtime-filter bloom expressions, exposed by name so
    // an OPERATOR can build/apply a semi-join reduction filter
    // explicitly (InjectRuntimeFilter only fires on shapes the
    // optimizer recognizes; the explicit form covers the rest — see
    // RelationalExt.j8BloomJoin). The aggregate returns the serialized
    // filter (mergeable partial aggregation); might_contain
    // deserializes its foldable bloom argument ONCE per task and stays
    // inside whole-stage codegen.
    (FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (children: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children(0), children(1), children(2))),
    (FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_bloom_contains"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (id, info, builder) =>
      if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
    }
  }
}

/** `spark.sql.extensions` injection point — the config-driven
  * alternative to `GraftFunctions.register` for sessions the library
  * gets to build itself:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => PolyHashRewrite)
    ext.injectOptimizerRule(_ => MatViewRewrite)
  }
}
