package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for pipeline filtering: language ID,
  * quality scoring, token stats. All pure Catalyst column expressions
  * (codegen'd, partial-agg friendly); deterministic across engines.
  */
object TextFunctions {

  val enStop = Seq("the", "a", "and", "of", "to", "is", "in", "it")
  val deStop = Seq("der", "die", "das", "und", "ist", "ein", "nicht")
  val frStop = Seq("le", "la", "les", "et", "est", "un", "une")

  private def inList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Count of tokens present in a stopword list. */
  def stopHits(wordsCol: String, stops: Seq[String]): Column =
    expr(s"size(filter($wordsCol, w -> w IN ${inList(stops)}))")

  /** N-gram/stopword-heuristic language ID over 3 candidate languages.
    * Deterministic argmax with fixed tie-break order en > de > fr. */
  def langId(en: Column, de: Column, fr: Column): Column =
    when(en >= de && en >= fr && en > 0, "en")
      .when(de >= fr && de > 0, "de")
      .when(fr > 0, "fr")
      .otherwise("und")

  /** Truncated-to-2dp ratio (cross-engine deterministic). */
  def ratio2(num: Column, den: Column): Column =
    floor(num.cast("double") * 100 / den) / 100.0

  /** Composite quality score in [0,100]: lexical diversity (50%),
    * stopword presence (20%), length saturation at 100 tokens (30%).
    * Integer-exact inputs, one final floor. */
  def qualityScore(nDistinct: Column, nTokens: Column, stopHits: Column): Column =
    floor((nDistinct.cast("double") / nTokens) * 50.0 +
          (stopHits.cast("double") / nTokens) * 20.0 +
          (least(nTokens, lit(100)).cast("double") / 100.0) * 30.0).cast("int")
}
