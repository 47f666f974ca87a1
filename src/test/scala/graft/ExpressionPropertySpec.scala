package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.expressions.TextExprUtil
import graft.operators.AsOf
import org.apache.spark.sql.functions._

/** Randomized property tests (seeded, deterministic) for the native
  * expressions against independent reference implementations.
  */
class ExpressionPropertySpec extends AnyFunSuite {
  private val rng = new scala.util.Random(42)
  private val alphabet = ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++ " .,-!  "

  private def randText(): String = {
    val base = Seq.fill(rng.nextInt(200))(alphabet(rng.nextInt(alphabet.length))).mkString
    // quarter of the samples carry a non-BMP code point (surrogate pair)
    if (rng.nextInt(4) == 0) base + "😀" + base.reverse else base
  }

  test("tokenCount equals the regex reference on 500 random strings") {
    (1 to 500).foreach { _ =>
      val s = randText()
      val expected = "[A-Za-z]+|[0-9]+".r.findAllIn(s).size
      assert(TextExprUtil.tokenCount(UTF8String.fromString(s)) == expected, s"input: '$s'")
    }
  }

  test("polyHash equals the positional-weight reference on 500 random strings") {
    (1 to 500).foreach { _ =>
      val s = randText()
      // reference iterates CODE POINTS (SQL character indexing)
      val expected = s.codePoints().toArray.zipWithIndex.map { case (c, i) =>
        c.toLong * (((i + 1).toLong * 2654435761L) % 1000000007L)
      }.sum
      assert(TextExprUtil.polyHash(UTF8String.fromString(s)) == expected, s"input: '$s'")
    }
  }

  test("packKey string order == (ts, id) tuple order on 200 random pairs") {
    lazy val spark = GraftSession.local()
    import spark.implicits._
    val pairs = Seq.fill(200)((math.abs(rng.nextLong()) % 4000000000000000L,
      math.abs(rng.nextLong()) % 10000000000L))
    val keys = pairs.toDF("ts", "id")
      .select(AsOf.packKey(col("ts"), col("id"))).collect().map(_.getString(0)).toSeq
    val byKey = pairs.zip(keys).sortBy(_._2).map(_._1)
    val byTuple = pairs.sorted
    assert(byKey == byTuple)
  }
}
