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

  test("nfcNormalize: composition, no-op identity, and pure canonical reordering") {
    def n(s: String): String = TextExprUtil.nfcNormalize(UTF8String.fromString(s)).toString
    // canonical composition: decomposed e/a + mark fold to the precomposed point
    assert(n("e\u0301") == "\u00e9")
    assert(n("a\u0300") == "\u00e0")
    // two-step composition: o + circumflex + acute -> U+1ED1
    assert(n("o\u0302\u0301") == "\u1ed1")
    // already-NFC input returns the SAME UTF8String (fast-path, no alloc)
    val ascii = UTF8String.fromString("plain ascii text")
    assert(TextExprUtil.nfcNormalize(ascii) eq ascii)
    assert(n("\u00e9") == "\u00e9")
    // pure canonical REORDERING: dot-above (ccc 230) after dot-below
    // (ccc 220) - bytes change, code-point length does not, nothing
    // composes
    val reordered = n("q\u0307\u0323")
    assert(reordered == "q\u0323\u0307")
    assert(reordered.codePointCount(0, reordered.length) == 3)
  }

  test("utf8Scan: valid strings decode clean and char counts match the JDK") {
    import graft.multimodal.Multimodal.utf8Scan
    // mixed ASCII / 2-byte / 3-byte / 4-byte code points
    val pool = "abc ,.1€éß中✓😀🎉".toCharArray
    (1 to 300).foreach { _ =>
      val sb = new StringBuilder
      (0 until rng.nextInt(80)).foreach { _ =>
        val c = pool(rng.nextInt(pool.length))
        // never emit a lone surrogate half
        if (!Character.isSurrogate(c)) sb.append(c) else sb.append("😀")
      }
      val s = sb.toString
      val a = utf8Scan(0L, s.getBytes("UTF-8"))
      assert(a.n_invalid == 0 && a.is_valid == 1, s"'$s' -> $a")
      // every code point is exactly one ASCII or one multi sequence
      assert(a.n_ascii + a.n_multi == s.codePointCount(0, s.length), s"'$s' -> $a")
    }
  }

  test("utf8Scan: structural invariants hold on 500 random byte soups") {
    import graft.multimodal.Multimodal.utf8Scan
    (1 to 500).foreach { _ =>
      val bytes = Array.fill(rng.nextInt(120))(rng.nextInt(256).toByte)
      val a = utf8Scan(0L, bytes)
      assert(a.n_bytes == bytes.length)
      // classified byte conservation: ascii=1B, invalid=1B, multi=2..4B
      assert(a.n_ascii + a.n_invalid + 2 * a.n_multi <= a.n_bytes)
      assert(a.n_ascii + a.n_invalid + 4 * a.n_multi >= a.n_bytes)
      assert(a.is_valid == (if (a.n_invalid == 0) 1 else 0))
      // a valid verdict means the JDK decoder accepts the bytes too
      if (a.is_valid == 1) {
        val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        try dec.decode(java.nio.ByteBuffer.wrap(bytes))
        catch { case e: Exception =>
          // structural validator admits overlong/surrogate encodings the
          // JDK rejects only for E0/ED/F0/F4 second-byte constraints
          val lead = bytes.map(_ & 0xFF).find(b => b == 0xE0 || b == 0xED ||
            b == 0xF0 || b == 0xF4)
          assert(lead.isDefined,
            s"JDK rejected bytes the scanner validated: ${bytes.mkString(",")}")
        }
      }
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

  test("containment/jaccard invariants hold on 100 random doc pairs") {
    lazy val spark = GraftSession.local()
    import spark.implicits._
    import graft.operators.Dedup
    // random 5-30 word docs over a 12-word vocabulary (forces overlap)
    val vocab = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu".split(" ")
    def doc(): String =
      Seq.fill(5 + rng.nextInt(26))(vocab(rng.nextInt(vocab.length))).mkString(" ")
    val docs = (0L until 200L).map(i => (i, doc())).toDF("doc_id", "text")
    val cand = (0 until 100).map(i => (2L * i, 2L * i + 1)).toDF("id_a", "id_b")
    val rows = Dedup.containmentVerify(cand, docs, "doc_id", "text",
      minContainBp = 0L).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cont, jac) = (r.getAs[Long]("cont_bp"), r.getAs[Long]("jac_bp"))
      // inter/min ≥ inter/union, both in [0, 10000]
      assert(cont >= jac, s"containment $cont < jaccard $jac")
      assert(cont >= 0 && cont <= 10000 && jac >= 0 && jac <= 10000, r)
      // equal set sizes ⇒ containment == 10000 iff jaccard == 10000
      if (r.getAs[Long]("n_a") == r.getAs[Long]("n_b"))
        assert((cont == 10000) == (jac == 10000), r)
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
