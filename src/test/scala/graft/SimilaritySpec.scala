package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.functions.TextFunctions

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = GraftSession.local()

  private def vecs = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, 0.1f, 0.0f, 0.0f)),   // bucket: dims 0,1 >= 0
      (1L, Array(1.0f, 0.2f, 0.0f, 0.0f)),   // same orthant as 0
      (2L, Array(-1.0f, -0.2f, 0.0f, 0.0f))  // opposite orthant
    ).toDF("vec_id", "embedding")
  }

  test("sign-LSH search only sees same-bucket candidates") {
    import spark.implicits._
    val q = vecs.filter($"vec_id" === 0)
    val r = Similarity.lshTopK(vecs, q, "vec_id", "embedding", bits = 2, k = 5)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(r == Set(1L)) // vec 2 lives in a different sign bucket
  }

  test("IVF search assigns to nearest centroid cell and searches within it") {
    import spark.implicits._
    val cents = vecs.filter($"vec_id" =!= 1) // centroids: 0 and 2
    val q = vecs.filter($"vec_id" === 1)
    val r = Similarity.ivfTopK(vecs, q, cents, "vec_id", "embedding", k = 5)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(r == Set(0L)) // 1 maps to cell of centroid 0; 2 is in the other cell
  }

  test("cosineDupPairs respects blocking and threshold") {
    import spark.implicits._
    val df = Seq(
      (0L, 0, Array(1.0f, 0.0f)), (1L, 0, Array(1.0f, 0.01f)),
      (2L, 1, Array(1.0f, 0.0f)) // identical direction but different block
    ).toDF("vec_id", "label", "embedding")
    val pairs = Similarity.cosineDupPairs(df, "vec_id", "embedding", "label", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((0L, 1L)))
  }

  test("langId tie-breaks deterministically en > de > fr") {
    import spark.implicits._
    val r = Seq((1, 1, 1), (0, 2, 2), (0, 0, 0)).toDF("en", "de", "fr")
      .select(TextFunctions.langId($"en", $"de", $"fr").as("lang"))
      .collect().map(_.getString(0)).toSeq
    assert(r == Seq("en", "de", "und"))
  }
}
