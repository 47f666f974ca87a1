package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication at pipeline scale.
  *
  * Scale posture: exact/normalized dedup are single hash-shuffle
  * groupBys; MinHash-LSH replaces the O(n²) pairwise scan with a
  * band-bucket equi-join (linear-ish in corpus size, bounded per-bucket
  * fan-out); exact Jaccard verification runs only on LSH candidates.
  *
  * Oracle determinism: shingle hashing uses salted md5 (identical hex in
  * every engine) and signatures are lexicographic mins of hex strings —
  * no engine-specific hash functions anywhere.
  */
object Dedup {

  /** Whitespace-normalized lowercase text (the canonical form). */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Word array (trim + split on whitespace runs). */
  def words(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct word-3-gram shingles of the named string column. */
  def shingles(textCol: String): Column = {
    val w = s"split(trim($textCol), '\\\\s+')"
    // guard: sequence(1,0) in Spark descends instead of being empty
    array_distinct(expr(
      s"CASE WHEN size($w) >= 3 THEN transform(sequence(1, size($w) - 2), " +
      s"i -> concat_ws(' ', element_at($w, i), element_at($w, i+1), element_at($w, i+2))) " +
      s"ELSE array() END"))
  }

  /** Exact dedup: keep min id per key; emits (key survivors with copy
    * counts). One hash-shuffle; map-side partial agg applies. */
  def exactDedup(df: DataFrame, key: Column, id: Column): DataFrame =
    df.groupBy(key.as("dedup_key"))
      .agg(min(id).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** LSH candidate pairs: band the signature, bucket-join, emit ordered
    * distinct pairs. bands*rows must equal the signature length. */
  def lshCandidates(docs: DataFrame, idCol: String, textCol: String,
      bands: Int, rows: Int): DataFrame = {
    val sigs = docs
      .withColumn("_shingles", shingles(textCol))
      .filter(size(col("_shingles")) > 0)
      .withColumn("_sig", expr(
        s"transform(sequence(0, ${bands * rows - 1}), h -> " +
        "array_min(transform(_shingles, s -> md5(concat(cast(h as string), '|', s)))))"))
    val banded = sigs.select(col(idCol), posexplode(expr(
      s"transform(sequence(0, ${bands - 1}), b -> " +
      s"concat(cast(b as string), ':', concat_ws('', slice(_sig, b * $rows + 1, $rows))))"))
      .as(Seq("_band", "_key")))
      .select(col(idCol), col("_key"))
    val a = banded.toDF("id_a", "k")
    val b = banded.toDF("id_b", "k")
    a.join(b, Seq("k")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Exact word-3-gram Jaccard for candidate pairs (array intersect /
    * union on the bounded candidate set, not the full corpus). */
  def jaccardVerify(candidates: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, threshold: Double): DataFrame = {
    val sets = docs.select(col(idCol).as("_id"), shingles(textCol).as("_set"))
    candidates
      .join(sets.toDF("_id", "set_a"), col("id_a") === col("_id")).drop("_id")
      .join(sets.toDF("_id", "set_b"), col("id_b") === col("_id")).drop("_id")
      .withColumn("jaccard",
        size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
        size(array_union(col("set_a"), col("set_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 16-bit SimHash over distinct tokens, md5-nibble bit source.
    * Pure codegen'd expression tree (nested higher-order functions). */
  def simhash16(textCol: String): Column = {
    val tokens = s"array_distinct(split(trim($textCol), '\\\\s+'))"
    // bit b of md5(token): nibble = hex digit at position 1 + b/4,
    // bit = (nibble div 2^(3 - b%4)) % 2; balance = sum(+1/-1); out bit = balance > 0
    expr(
      s"""aggregate(
         |  transform(sequence(0, 15), b ->
         |    CASE WHEN aggregate($tokens, 0, (acc, t) ->
         |      acc + CASE WHEN (
         |        (instr('0123456789abcdef', substr(md5(t), 1 + cast(b / 4 as int), 1)) - 1)
         |        div CASE WHEN b % 4 = 0 THEN 8 WHEN b % 4 = 1 THEN 4
         |                 WHEN b % 4 = 2 THEN 2 ELSE 1 END) % 2 = 1
         |      THEN 1 ELSE -1 END) > 0
         |    THEN shiftleft(1, 15 - b) ELSE 0 END),
         |  0, (acc, x) -> acc + x)""".stripMargin)
  }
}
