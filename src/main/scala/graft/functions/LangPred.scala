package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native language-ID argmax over marker-word profiles — the one-pass
  * kernel behind `TextStats.langPred`'s HOF spelling.
  *
  * Semantics replicated EXACTLY from the HOF form (and its DuckDB
  * mirror): tokenize on single spaces (split limit −1: empty tokens
  * survive, match nothing), count per-language marker hits, then pick
  * the maximum of the (score, lang) structs under the same DESCENDING
  * struct sort both engines use — so score ties resolve to the
  * LEXICOGRAPHICALLY LARGEST language code, and zero hits everywhere
  * yields "und". Any change to that tie rule would diverge from the
  * oracle's `list_sort(..., 'DESC')[1]`.
  *
  * Why native: the HOF form re-walks the token array once per language
  * through interpreted lambdas (5 filter/array_contains passes + a
  * struct sort per row), and a filter on the result gets pushdown-
  * substituted and evaluated twice. Here the row pays ONE token walk
  * with hash-set probes, inside whole-stage codegen (the generated code
  * calls back into [[predict]] via a reference object — the expression
  * stays codegen-compatible, no fallback).
  *
  * Scale note: stateless per-row projection, embarrassingly parallel.
  */
case class LangPred(child: Expression, langs: Seq[(String, Seq[String])])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StringType

  override def prettyName: String = "lang_pred"

  @transient private lazy val langNames: Array[String] = langs.map(_._1).toArray

  @transient private lazy val markerSets: Array[java.util.HashSet[String]] =
    langs.map { case (_, ms) =>
      val s = new java.util.HashSet[String]()
      ms.foreach(s.add)
      s
    }.toArray

  @transient private lazy val und = UTF8String.fromString("und")

  /** One-pass scoring + the exact (score, lang) DESC-sort argmax. */
  def predict(text: UTF8String): UTF8String = {
    val k = langNames.length
    val counts = new Array[Int](k)
    // replicate split(text, " ") limit -1: scan space-delimited slices
    val s = text.toString
    var start = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) {
          val tok = s.substring(start, i)
          var j = 0
          while (j < k) {
            if (markerSets(j).contains(tok)) counts(j) += 1
            j += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    // max by (score, lang) — lang compared as a string, ties to the
    // LARGER lang (the DESC struct sort both engines apply)
    var best = 0
    var j = 1
    while (j < k) {
      if (counts(j) > counts(best) ||
        (counts(j) == counts(best) && langNames(j).compareTo(langNames(best)) > 0))
        best = j
      j += 1
    }
    if (counts(best) > 0) UTF8String.fromString(langNames(best)) else und
  }

  override protected def nullSafeEval(input: Any): Any =
    predict(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langPred", this, classOf[LangPred].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.predict($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): LangPred =
    copy(child = newChild)
}
