package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: per-gram character statistics of a string
  * array — the kernel of the Gopher-style repetition quality metrics
  * (`q_repetition`). The input is sorted INTERNALLY (a compiled
  * `Arrays.sort` over `UTF8String`, which is `Comparable`) so equal grams
  * form runs; for a run of length r over a gram of c characters:
  *
  *   - `top_chars` = r·c of the MOST FREQUENT gram (max r; equal-count
  *     ties resolved to the larger char mass — deterministic,
  *     engine-portable);
  *   - `dup_chars` = sum over runs with r ≥ 2 of r·c — the character
  *     mass inside DUPLICATED n-grams, counting every occurrence.
  *
  * Counting runs on a sorted copy replaces the hash-map histogram a
  * per-doc groupBy would shuffle the corpus for — and sorting inside the
  * expression keeps the whole pipeline compiled: the `array_sort`
  * alternative is a CodegenFallback higher-order function in Spark 4.x,
  * an interpreted comparator lambda per comparison.
  *
  * Why a custom `Expression`: the column formulation is `array_sort`
  * plus an `aggregate()` fold building a 5-field struct per element —
  * two CodegenFallback lambda chains (`TextAnalysis.runStatsViaColumns`,
  * retained as the independent bit-identity cross-check).
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

  // registered as a user-callable SQL function (GraftExtensions): misuse
  // must fail at ANALYSIS with a readable message, not as a runtime
  // ClassCastException inside the generated code
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(arrAny: Any): Any = {
    val arr = arrAny.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val grams = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      if (arr.isNullAt(i)) return null
      grams(i) = arr.getUTF8String(i)
      i += 1
    }
    java.util.Arrays.sort(grams.asInstanceOf[Array[AnyRef]])
    var bestRun = 0L
    var top = 0L
    var dup = 0L
    i = 0
    while (i < len) {
      val g = grams(i)
      var j = i + 1
      while (j < len && g.equals(grams(j))) j += 1
      val run = (j - i).toLong
      val chars = run * g.numChars()
      if (run > bestRun || (run == bestRun && chars > top)) {
        bestRun = run
        top = chars
      }
      if (run >= 2) dup += chars
      i = j
    }
    InternalRow(top, dup)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val len = ctx.freshName("len")
      val grams = ctx.freshName("grams")
      val bestRun = ctx.freshName("bestRun")
      val top = ctx.freshName("top")
      val dup = ctx.freshName("dup")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val run = ctx.freshName("run")
      val chars = ctx.freshName("chars")
      val hadNull = ctx.freshName("hadNull")
      val utf8 = classOf[UTF8String].getName
      s"""
         |int $len = $arr.numElements();
         |$utf8[] $grams = new $utf8[$len];
         |boolean $hadNull = false;
         |for (int $i = 0; $i < $len; $i++) {
         |  if ($arr.isNullAt($i)) { $hadNull = true; break; }
         |  $grams[$i] = $arr.getUTF8String($i);
         |}
         |if ($hadNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  java.util.Arrays.sort((Object[]) $grams);
         |  long $bestRun = 0L;
         |  long $top = 0L;
         |  long $dup = 0L;
         |  int $i = 0;
         |  while ($i < $len) {
         |    int $j = $i + 1;
         |    while ($j < $len && $grams[$i].equals($grams[$j])) $j++;
         |    long $run = (long) ($j - $i);
         |    long $chars = $run * $grams[$i].numChars();
         |    if ($run > $bestRun || ($run == $bestRun && $chars > $top)) {
         |      $bestRun = $run;
         |      $top = $chars;
         |    }
         |    if ($run >= 2) $dup += $chars;
         |    $i = $j;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |      new Object[]{$top, $dup});
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RunStats {
  /** Column API (grams in any order — sorted internally). Requires
    * `GraftExtensions` installed in the session.
    */
  def runStats(grams: Column): Column =
    call_function("run_stats", grams)
}
