package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-LAYOUT operators (q85): the file-skipping story every 100-TB
  * lakehouse lives on. A table's scan cost under a selective predicate
  * is decided by how rows were SORTED into files when written: zone
  * maps (per-file min/max, what parquet footers and Delta/Iceberg
  * manifests store) let the planner skip whole files, and a Z-ORDER
  * (Morton space-filling-curve) sort keeps BOTH dimensions of a
  * 2-predicate workload local — a linear sort concentrates one
  * dimension and smears the other across every file.
  *
  * Everything here is exact integer arithmetic (bit interleave, ranks,
  * min/max) — cross-engine oracle-safe; shifts stay ≤ 62 (the x16/d12
  * wrap lesson). */
object Layout {

  /** Morton (Z-order) code: interleave the low `bits` bits of x and y
    * (x gets even positions, y odd).
    *
    * Implemented as the classic 4-step magic-number bit SPREAD (the
    * "Part1By1" parallel-prefix form, public bit-twiddling folklore),
    * not a per-bit extract-shift-or chain. The per-bit chain is
    * 4·bits ≈ 56 expression nodes; Catalyst's projection collapse and
    * filter inference then INLINE that tree at every reference (q85's
    * inner join infers isnotnull(shiftright(morton, 23)) and pushes the
    * whole inlined tree into the scan-stage filter NEXT TO the
    * projection's own copy) — the duplicated ~300-node codegen method
    * crossed the JVM's JIT method-size bailout and the whole scan stage
    * ran INTERPRETED: the z-order fileIds measured 4.2 s vs 0.6 s for
    * the linear layout on identical row counts (r15 probe). The spread
    * form is ~12 nodes per coordinate, stays compiled wherever it is
    * inlined, and computes the identical value: zorderIds 4.2 → 0.7 s.
    */
  def morton(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 16, "morton supports 1..16 bits per key")
    def spread(v: Column): Column = {
      // keep the low `bits` bits, then spread low 16 to even positions
      val m = (1L << bits) - 1
      val s0 = v.bitwiseAND(lit(m))
      val s1 = s0.bitwiseOR(shiftleft(s0, 8)).bitwiseAND(lit(0x00FF00FFL))
      val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
      s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(x).bitwiseOR(shiftleft(spread(y), 1))
  }

  /** Assign file ids under a given sort order WITHOUT a global
    * single-partition sort (p25's two-level TeraSort rank on a NUMERIC
    * key): bucket by the key's high bits (`bucketShift`), rank within
    * each bucket in parallel, lift to a global rank with a broadcast
    * bucket-offset cumsum, then file = rank / rowsPerFile. Ties must be
    * fully determined by `ties` (both engines must agree on every
    * row's file, or zone maps diverge). */
  def fileIds(df: DataFrame, key: Column, ties: Seq[Column],
      bucketShift: Int, rowsPerFile: Int): DataFrame =
    Relational.bucketedGlobalRankBy(df.withColumn("_k", key),
        shiftright(col("_k"), bucketShift), col("_k") +: ties,
        groupCols = Nil, outCol = "_grank")
      .withColumn("_file", (col("_grank") / rowsPerFile).cast("long"))
      .drop("_grank", "_k")

  /** Zone-map skip accounting for a box predicate x∈[x1,x2], y∈[y1,y2]
    * over a file layout: per-file min/max zones (what a manifest
    * stores), then ONE row — files total/scanned and rows
    * scanned/matched. `rows_matched` is layout-invariant (the true
    * result); `files_scanned`/`rows_scanned` is what the layout buys. */
  def zoneMapStats(withFiles: DataFrame, xCol: Column, yCol: Column,
      x1: Long, x2: Long, y1: Long, y2: Long, label: String): DataFrame = {
    val zones = withFiles.groupBy(col("_file"))
      .agg(min(xCol).as("_xmin"), max(xCol).as("_xmax"),
        min(yCol).as("_ymin"), max(yCol).as("_ymax"),
        count(lit(1)).as("_rows"),
        sum(when(xCol.between(x1, x2) && yCol.between(y1, y2), 1L)
          .otherwise(0L)).as("_hits"))
    val scanned = col("_xmax") >= x1 && col("_xmin") <= x2 &&
      col("_ymax") >= y1 && col("_ymin") <= y2
    zones.agg(
        count(lit(1)).as("n_files"),
        sum(when(scanned, 1L).otherwise(0L)).as("files_scanned"),
        sum(when(scanned, col("_rows")).otherwise(0L)).as("rows_scanned"),
        sum(col("_hits")).as("rows_matched"))
      .withColumn("layout", lit(label))
      .select(col("layout"), col("n_files"), col("files_scanned"),
        col("rows_scanned"), col("rows_matched"))
  }
}
