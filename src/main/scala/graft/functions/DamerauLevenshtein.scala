package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unrestricted Damerau-Levenshtein edit distance (Lowrance & Wagner,
  * "An extension of the string-to-string correction problem", JACM 1975):
  * insert / delete / substitute / transpose-of-adjacent, where a
  * transposed pair MAY be edited again later — unlike the restricted
  * OSA variant (e.g. CA→ABC is 2 here, 3 under OSA). Spark ships only
  * plain `levenshtein`; this fills the record-linkage gap with the same
  * semantics as DuckDB's `damerau_levenshtein`, which is what the
  * driver oracle cross-checks.
  *
  * The hot loop is the classic (la+2)×(lb+2) DP with the last-seen-row
  * char map. Codegen delegates to the static method — the standard
  * pattern for non-trivial string kernels (Spark's own `levenshtein`
  * codegens to `UTF8String.levenshteinDistance`); the loop allocates
  * one int matrix per evaluation, which for the short keys this is
  * built for (names, tokens) stays in TLAB and never escapes.
  */
object DamerauLev {
  /** Inputs above this length fail fast: unrestricted DL requires the
    * FULL (la+2)×(lb+2) matrix (the transpose rule reaches back to an
    * arbitrary earlier row via the last-seen map, so no two-row
    * reduction exists), and a document-sized pair would allocate
    * gigabytes per row before OOMing the executor (ADVICE r9). 10k
    * covers every record-linkage key; compare documents with the
    * shingle/minhash family instead. */
  val MaxLen = 10000

  def dist(a: String, b: String): Int = {
    val la = a.length
    val lb = b.length
    if (la > MaxLen || lb > MaxLen)
      throw new IllegalArgumentException(
        s"edit_dl: input length ${math.max(la, lb)} exceeds $MaxLen " +
          "chars; the unrestricted Damerau-Levenshtein matrix would " +
          "allocate O(la*lb) ints per row — use minhash/shingle " +
          "similarity for document-scale text")
    if (la == 0) return lb
    if (lb == 0) return la
    val maxd = la + lb
    val h = Array.ofDim[Int](la + 2, lb + 2)
    h(0)(0) = maxd
    var i = 0
    while (i <= la) { h(i + 1)(0) = maxd; h(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= lb) { h(0)(j + 1) = maxd; h(1)(j + 1) = j; j += 1 }
    val lastRow = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= la) {
      var lastCol = 0
      j = 1
      while (j <= lb) {
        val k = lastRow.getOrDefault(b.charAt(j - 1), 0).intValue()
        val l = lastCol
        var cost = 1
        if (a.charAt(i - 1) == b.charAt(j - 1)) { cost = 0; lastCol = j }
        val sub = h(i)(j) + cost
        val ins = h(i + 1)(j) + 1
        val del = h(i)(j + 1) + 1
        val trans = h(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        h(i + 1)(j + 1) =
          math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      lastRow.put(a.charAt(i - 1), i)
      i += 1
    }
    h(la + 1)(lb + 1)
  }
}

/** `edit_dl(s1, s2)` — see [[DamerauLev]]. */
case class DamerauLevenshteinExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"edit_dl expects (STRING, STRING), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DamerauLev.dist(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DamerauLev.dist(" +
        s"$a.toString(), $b.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(newLeft, newRight)
}
