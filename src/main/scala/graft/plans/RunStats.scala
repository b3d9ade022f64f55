package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: run-length character statistics of a SORTED
  * string array — the kernel of the Gopher-style repetition quality
  * metrics (`q_repetition`). For each run of equal adjacent elements with
  * length r over a gram of c characters:
  *
  *   - `top_chars` = max over runs of r·c — the character mass of the
  *     "most frequent n-gram" (char-mass maximum makes ties
  *     deterministic, engine-portable: no arbitrary pick among
  *     equal-count grams);
  *   - `dup_chars` = sum over runs with r ≥ 2 of r·c — the character
  *     mass inside DUPLICATED n-grams.
  *
  * The input must be sorted (`array_sort`) so equal grams are adjacent:
  * counting runs on a sorted array replaces the hash-map histogram a
  * per-doc groupBy would shuffle for — one linear generated loop, zero
  * exchanges, O(1) allocation.
  *
  * Why a custom `Expression`: the column formulation is an `aggregate()`
  * fold building a 4-field struct per element — a CodegenFallback lambda
  * chain allocating an InternalRow per gram (`TextAnalysis
  * .runStatsViaColumns`, retained as the independent bit-identity
  * cross-check).
  *
  * Semantics: empty array → (0, 0); null input → null; a null ELEMENT →
  * null result (`word_shingles` never produces one). Characters are
  * counted as codepoints (`UTF8String.numChars`), matching SQL `length()`.
  */
case class RunStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("top_chars", LongType, nullable = false),
    StructField("dup_chars", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "run_stats"

  override def nullSafeEval(arrAny: Any): Any = {
    val arr = arrAny.asInstanceOf[ArrayData]
    val len = arr.numElements()
    var top = 0L
    var dup = 0L
    var i = 0
    while (i < len) {
      if (arr.isNullAt(i)) return null
      val g = arr.getUTF8String(i)
      var j = i + 1
      while (j < len && !arr.isNullAt(j) && g.equals(arr.getUTF8String(j))) j += 1
      val chars = (j - i).toLong * g.numChars()
      if (chars > top) top = chars
      if (j - i >= 2) dup += chars
      i = j
    }
    InternalRow(top, dup)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val len = ctx.freshName("len")
      val top = ctx.freshName("top")
      val dup = ctx.freshName("dup")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val g = ctx.freshName("g")
      val chars = ctx.freshName("chars")
      val hadNull = ctx.freshName("hadNull")
      val utf8 = classOf[UTF8String].getName
      s"""
         |int $len = $arr.numElements();
         |long $top = 0L;
         |long $dup = 0L;
         |boolean $hadNull = false;
         |int $i = 0;
         |while ($i < $len) {
         |  if ($arr.isNullAt($i)) { $hadNull = true; break; }
         |  $utf8 $g = $arr.getUTF8String($i);
         |  int $j = $i + 1;
         |  while ($j < $len && !$arr.isNullAt($j) && $g.equals($arr.getUTF8String($j))) $j++;
         |  long $chars = (long) ($j - $i) * $g.numChars();
         |  if ($chars > $top) $top = $chars;
         |  if ($j - $i >= 2) $dup += $chars;
         |  $i = $j;
         |}
         |if ($hadNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |      new Object[]{$top, $dup});
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RunStats {
  /** Column API. Requires `GraftExtensions` installed in the session. */
  def runStats(sortedGrams: Column): Column =
    call_function("run_stats", sortedGrams)
}
