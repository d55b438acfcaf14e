package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE tokenizer APPLICATION: `graft_bpe_encode(text, merges)`
  * returns the subword tokens of `text` under a learned byte-pair-
  * encoding merge table — the apply half of the tokenizer story whose
  * training half is q98 (pair counting). One expression call replaces
  * the whitespace proxy (q49) with real subword counts for packing
  * (q77), chunking (q87), and token budgeting, with no UDF and no
  * token-array shuffle: the merge loop runs inside whole-stage codegen
  * per row.
  *
  * Semantics (public BPE-apply algorithm, merges.txt convention):
  * words are `split(lower(trim(text)), " ")` — the corpus-wide
  * tokenization convention shared by q49/q98/[[QualityScore]]; each
  * word starts as its code-point sequence and repeatedly merges the
  * adjacent pair with the LOWEST rank in the table (all non-overlapping
  * occurrences left-to-right per round) until no adjacent pair is
  * ranked. A merge entry is the space-separated pair `"left right"` —
  * unambiguous because tokens never contain spaces. Empty words
  * (consecutive spaces, all-space text) contribute zero subwords.
  * Output is the flat subword sequence in document order.
  *
  * The merge table is DATA (a one-row broadcast from q98's output —
  * model fit → model apply, no driver collect). Building the rank map
  * per row would be wasteful for large tables, so `compute` keeps a
  * per-thread memo of the last table keyed by byte-equality: under the
  * broadcast crossJoin every row carries the same entries and the map
  * builds once per task. Null merge entries are ignored.
  */
case class BpeEncode(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  override def inputTypes = Seq(StringType, ArrayType(StringType))

  override def nullSafeEval(text: Any, merges: Any): Any =
    BpeEncode.compute(text.asInstanceOf[UTF8String],
      merges.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, m) => s"graft.functions.BpeEncode.compute($t, $m)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeEncode =
    copy(left = newLeft, right = newRight)
}

object BpeEncode {
  def apply(text: Column, merges: Column): Column =
    ColumnBridge.column(
      BpeEncode(ColumnBridge.expression(text), ColumnBridge.expression(merges)))

  /** Last-seen merge table per thread: (owned entry copies, rank map).
    * Byte-equality guarded, so a changed table can never serve stale
    * ranks; the guard is a no-alloc UTF8String compare per entry. (No
    * reference-identity fast path on purpose: ArrayData instances can
    * be reused row buffers whose CONTENT changes under the same
    * reference, and a stale rank map silently mis-tokenizes.) */
  private final class Table(val entries: Array[UTF8String],
                            val rank: java.util.HashMap[String, Integer])
  private val memo = new ThreadLocal[Table]

  private def table(merges: ArrayData): java.util.HashMap[String, Integer] = {
    val n = merges.numElements()
    val cached = memo.get()
    if (cached != null && cached.entries.length == n) {
      var i = 0
      var same = true
      while (same && i < n) {
        val e = if (merges.isNullAt(i)) null else merges.getUTF8String(i)
        same = if (e == null) cached.entries(i) == null
               else e.equals(cached.entries(i))
        i += 1
      }
      if (same) return cached.rank
    }
    val entries = new Array[UTF8String](n)
    val rank = new java.util.HashMap[String, Integer](n * 2)
    var i = 0
    while (i < n) {
      if (!merges.isNullAt(i)) {
        // clone: ArrayData may be backed by a reused row buffer
        entries(i) = merges.getUTF8String(i).clone()
        rank.putIfAbsent(entries(i).toString, Integer.valueOf(i))
      }
      i += 1
    }
    memo.set(new Table(entries, rank))
    rank
  }

  /** Shared by interpreted eval and generated code. */
  def compute(text: UTF8String, merges: ArrayData): ArrayData = {
    val rank = table(merges)
    val str = text.trim().toLowerCase().toString
    val out = new java.util.ArrayList[UTF8String]()
    var wordStart = 0
    var i = 0
    val len = str.length
    while (i <= len) {
      if (i == len || str.charAt(i) == ' ') {
        if (i > wordStart) encodeWord(str.substring(wordStart, i), rank, out)
        wordStart = i + 1
      }
      i += 1
    }
    val arr = new Array[AnyRef](out.size())
    out.toArray(arr)
    new GenericArrayData(arr)
  }

  private def encodeWord(word: String, rank: java.util.HashMap[String, Integer],
                         out: java.util.ArrayList[UTF8String]): Unit = {
    // seed: one token per code point
    var tokens = new java.util.ArrayList[String]()
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val cc = Character.charCount(cp)
      tokens.add(word.substring(i, i + cc))
      i += cc
    }
    // greedy loop: merge every occurrence of the best-ranked pair, repeat
    var done = tokens.size() < 2
    while (!done) {
      var best = -1
      var bestPair: String = null
      var j = 0
      while (j < tokens.size() - 1) {
        val p = tokens.get(j) + " " + tokens.get(j + 1)
        val r = rank.get(p)
        if (r != null && (best < 0 || r < best)) { best = r; bestPair = p }
        j += 1
      }
      if (best < 0) done = true
      else {
        val sp = bestPair.indexOf(' ')
        val a = bestPair.substring(0, sp)
        val b = bestPair.substring(sp + 1)
        val merged = new java.util.ArrayList[String](tokens.size())
        var k = 0
        while (k < tokens.size()) {
          if (k < tokens.size() - 1 &&
              tokens.get(k) == a && tokens.get(k + 1) == b) {
            merged.add(a + b)
            k += 2
          } else {
            merged.add(tokens.get(k))
            k += 1
          }
        }
        tokens = merged
        if (tokens.size() < 2) done = true
      }
    }
    var m = 0
    while (m < tokens.size()) {
      out.add(UTF8String.fromString(tokens.get(m)))
      m += 1
    }
  }
}
