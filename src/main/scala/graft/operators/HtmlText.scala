package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTML → training-text extraction — the most-executed op of a
  * web-scale pipeline: every crawled response body passes through it
  * between the container index (x12) and every text-quality gate
  * (t-family). Three rules, all in the Java∩RE2 regex subset so the
  * DuckDB oracle runs the identical patterns:
  *
  *   1. script/style blocks are stripped WHOLESALE (tag-stripping alone
  *      would leak JS/CSS payloads into the corpus as "text");
  *   2. block elements (`p`/`div`) are tag-stripped to whitespace-
  *      normalized text;
  *   3. the link-density boilerplate rule: a block whose anchor text is
  *      ≥ half its text is navigation chrome, not content — dropped
  *      with its char mass accounted (the CCNet/jusText-class
  *      heuristic, public knowledge).
  *
  * Scale shape: map-only until the final per-doc aggregate — the regex
  * work is codegen'd per row, block explode fans out bounded per-page
  * block counts, and the ONE hash shuffle carries (doc, pos, txt)
  * rows. kept_md5 pins the extracted bytes exactly (a tag-strip
  * off-by-one breaks the hash, not just a count). */
object HtmlText {

  private val scriptPat = "(?s)<script[^>]*>.*?</script>"
  private val stylePat = "(?s)<style[^>]*>.*?</style>"
  private val blockPat = "(?s)<(?:p|div)[^>]*>.*?</(?:p|div)>"
  private val tagPat = "<[^>]*>"
  private val anchorPat = "<a [^>]*>([^<]*)</a>"

  /** Per-doc extraction accounting: (doc_id, n_blocks, n_kept,
    * kept_chars, dropped_chars, kept_md5). kept text is the in-order
    * space-joined text of the blocks below the 50% link-density
    * threshold. */
  def extract(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val blocks = df
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(expr(
          s"regexp_extract_all(regexp_replace(regexp_replace($htmlCol, " +
            s"'$scriptPat', ' '), '$stylePat', ' '), '$blockPat', 0)"))
          .as(Seq("pos", "blk")))
    val per = blocks
      .withColumn("txt", trim(regexp_replace(
        regexp_replace(col("blk"), tagPat, " "), "\\s+", " ")))
      .withColumn("ac", expr(
        s"aggregate(regexp_extract_all(blk, '$anchorPat', 1), " +
          "CAST(0 AS BIGINT), (a, x) -> a + length(x))"))
      .withColumn("tc", length(col("txt")).cast("long"))
      .withColumn("keep", col("ac") * 2 < col("tc"))
    per.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_blocks"),
        sum(when(col("keep"), 1).otherwise(0)).cast("int").as("n_kept"),
        collect_list(when(col("keep"),
          struct(col("pos").as("p"), col("txt").as("t")))).as("_kept"),
        sum(when(!col("keep"), col("tc")).otherwise(0L)).as("dropped_chars"))
      .withColumn("_kept_text",
        concat_ws(" ", expr("transform(array_sort(_kept), x -> x.t)")))
      .select(col("doc_id"), col("n_blocks"), col("n_kept"),
        length(col("_kept_text")).cast("long").as("kept_chars"),
        col("dropped_chars"), md5(col("_kept_text")).as("kept_md5"))
  }
}
