package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: per-document token-distribution statistics
  * for the Shannon-entropy quality signal — the lexical-diversity gate a
  * curation pipeline runs beside the Gopher repetition filters (a
  * low-entropy doc is boilerplate/keyword stuffing even when no single
  * gram dominates). One shuffle-free compiled pass; the compositional
  * formulation (`explode` → `groupBy(doc_id, term)` → `groupBy(doc_id)`)
  * shuffles the corpus-wide (doc, term) stream twice for a purely
  * per-row statistic.
  *
  * Returns `struct(dl, n_terms, s_micros)`:
  *
  *   - `dl`      — token count (Σ run lengths);
  *   - `n_terms` — distinct token count (number of runs);
  *   - `s_micros` — Σ over runs of `run · round(ln(run)·1e6)`, an EXACT
  *     integer so downstream summation/serving is order-independent.
  *     `H = ln(dl) − (s_micros/1e6)/dl` is assembled (and 6-dp rounded)
  *     in the query layer, where the float-op order is spelled once and
  *     mirrored verbatim by the DuckDB oracle. `ln(run) ≥ 0` for every
  *     run ≥ 1, so JVM `Math.round` (half-up) and SQL `round(x·1e6, 0)`
  *     (half away from zero) agree on every carry.
  *
  * The input is sorted INTERNALLY (compiled `Arrays.sort` over
  * `UTF8String`) so equal tokens form runs — the `RunStats` design: a
  * hash-map histogram per row allocates per token, and the `array_sort`
  * column route is a CodegenFallback comparator lambda in Spark 4.x.
  *
  * Semantics: empty array → (0, 0, 0); null input → null; a null
  * ELEMENT → null result (`Text.tokenize` never produces one).
  */
case class EntropyStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("dl", LongType, nullable = false),
    StructField("n_terms", LongType, nullable = false),
    StructField("s_micros", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "entropy_stats"

  // registered as a user-callable SQL function (GraftExtensions): misuse
  // must fail at ANALYSIS with a readable message
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
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      if (arr.isNullAt(i)) return null
      toks(i) = arr.getUTF8String(i)
      i += 1
    }
    java.util.Arrays.sort(toks.asInstanceOf[Array[AnyRef]])
    var nTerms = 0L
    var sMicros = 0L
    i = 0
    while (i < len) {
      val t = toks(i)
      var j = i + 1
      while (j < len && t.equals(toks(j))) j += 1
      val run = (j - i).toLong
      nTerms += 1L
      sMicros += run * Math.round(Math.log(run.toDouble) * 1000000.0)
      i = j
    }
    InternalRow(len.toLong, nTerms, sMicros)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val len = ctx.freshName("len")
      val toks = ctx.freshName("toks")
      val nTerms = ctx.freshName("nTerms")
      val sMicros = ctx.freshName("sMicros")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val run = ctx.freshName("run")
      val hadNull = ctx.freshName("hadNull")
      val utf8 = classOf[UTF8String].getName
      s"""
         |int $len = $arr.numElements();
         |$utf8[] $toks = new $utf8[$len];
         |boolean $hadNull = false;
         |for (int $i = 0; $i < $len; $i++) {
         |  if ($arr.isNullAt($i)) { $hadNull = true; break; }
         |  $toks[$i] = $arr.getUTF8String($i);
         |}
         |if ($hadNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  java.util.Arrays.sort((Object[]) $toks);
         |  long $nTerms = 0L;
         |  long $sMicros = 0L;
         |  int $i = 0;
         |  while ($i < $len) {
         |    int $j = $i + 1;
         |    while ($j < $len && $toks[$i].equals($toks[$j])) $j++;
         |    long $run = (long) ($j - $i);
         |    $nTerms += 1L;
         |    $sMicros += $run * Math.round(Math.log((double) $run) * 1000000.0);
         |    $i = $j;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |      new Object[]{(long) $len, $nTerms, $sMicros});
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EntropyStats {
  /** Column API (tokens in any order — sorted internally). Requires
    * `GraftExtensions` installed in the session.
    */
  def entropyStats(toks: Column): Column =
    call_function("entropy_stats", toks)
}
