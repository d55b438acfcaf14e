package graft

import org.apache.spark.sql.functions._
import graft.functions.BpeEncode

/** [[graft.functions.BpeEncode]] — native greedy BPE application —
  * proven against an independent plain-Scala model, with the greedy
  * order pinned by targeted cases. */
class BpeEncodeSpec extends GraftSpec {
  import spark.implicits._

  /** Independent reference: immutable-list greedy BPE with a
    * (left, right)→rank map — structurally unlike the expression's
    * ArrayList + concatenated-key loop. */
  private def refEncode(text: String, merges: Seq[String]): Seq[String] = {
    val rank: Map[(String, String), Int] = merges.zipWithIndex.collect {
      case (m, i) if m != null && m.contains(' ') =>
        val Array(a, b) = m.split(" ", 2)
        (a, b) -> i
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    def word(w: String): Seq[String] = {
      var toks: List[String] = {
        val cps = scala.collection.mutable.ListBuffer[String]()
        var i = 0
        while (i < w.length) {
          val cc = Character.charCount(w.codePointAt(i))
          cps += w.substring(i, i + cc); i += cc
        }
        cps.toList
      }
      var continue = true
      while (continue && toks.length >= 2) {
        val ranked = toks.zip(toks.tail).flatMap(p => rank.get(p).map(p -> _))
        if (ranked.isEmpty) continue = false
        else {
          val (a, b) = ranked.minBy(_._2)._1
          val out = scala.collection.mutable.ListBuffer[String]()
          var rest = toks
          while (rest.nonEmpty) rest match {
            case x :: y :: tl if x == a && y == b => out += (a + b); rest = tl
            case x :: tl => out += x; rest = tl
            case Nil =>
          }
          toks = out.toList
        }
      }
      toks
    }
    text.trim.toLowerCase.split(" ", -1).filter(_.nonEmpty).toSeq.flatMap(word)
  }

  private def encode(text: String, merges: Seq[String]): Seq[String] = {
    Seq(text).toDF("t")
      .select(BpeEncode(col("t"), typedLit(merges)).as("sw"))
      .collect().head.getSeq[String](0)
  }

  test("known merges: repeated application builds multi-char subwords") {
    assert(encode("abc abab", Seq("a b", "ab c")) ==
      Seq("abc", "ab", "ab"))
  }

  test("greedy order: the lowest-ranked pair merges first") {
    // with "b c" ranked above "a b", abc → a + bc (and stops)
    assert(encode("abc", Seq("b c", "a b")) == Seq("a", "bc"))
    // flipping the ranks changes the outcome: ab + c → abc if chained
    assert(encode("abc", Seq("a b", "ab c")) == Seq("abc"))
  }

  test("tokenization convention: trim, lower, spaces; empty words vanish") {
    assert(encode("  A  b ", Seq("a b")) == Seq("a", "b"))
    assert(encode("   ", Seq("a b")).isEmpty)
    assert(encode("", Seq("a b")).isEmpty)
  }

  test("matches the reference model on the real corpus with fitted merges") {
    val docs = Tables.documents(spark, SF).limit(200)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val merges = graft.operators.TextAnalysis.q98(Tables.documents(spark, SF), 50)
      .collect().map(r => s"${r.getString(0)} ${r.getString(1)}").toSeq
    val got = Tables.documents(spark, SF).limit(200)
      .select(col("doc_id"), BpeEncode(col("text"), typedLit(merges)).as("sw"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == refEncode(text, merges), s"doc $id")
    }
    // merges actually fire on a natural corpus
    assert(docs.exists { case (id, _) => got(id).exists(_.length > 1) })
  }

  test("matches the reference model under random merge tables") {
    val rnd = new scala.util.Random(4242)
    val alphabet = "abcdef"
    (1 to 20).foreach { trial =>
      val merges = Seq.fill(rnd.nextInt(12) + 1) {
        val l = (1 to rnd.nextInt(2) + 1)
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        val r = (1 to rnd.nextInt(2) + 1)
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        s"$l $r"
      }.distinct
      val text = (1 to 8).map(_ =>
        (1 to rnd.nextInt(10) + 1)
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
        .mkString(" ")
      assert(encode(text, merges) == refEncode(text, merges),
        s"trial $trial text=$text merges=$merges")
    }
  }

  test("unicode: supplementary code points seed one token each") {
    val s = "a😀b" // a😀b
    assert(encode(s, Seq.empty[String]) == Seq("a", "😀", "b"))
    assert(encode(s, Seq("a 😀")) == Seq("a😀", "b"))
  }

  test("null inputs and null merge entries") {
    val df = Seq((Option.empty[String], Option(Seq("a b")))).toDF("t", "m")
      .select(BpeEncode(col("t"), col("m")).as("sw"))
    assert(df.collect().head.isNullAt(0))
    assert(encode("ab", Seq(null, "a b")) == Seq("ab"))
  }

  test("graft_bpe_encode is callable from SQL text") {
    spark.sql("SELECT graft_bpe_encode('abc', array('a b', 'ab c')) AS sw")
      .collect().head.getSeq[String](0) match {
        case sw => assert(sw == Seq("abc"))
      }
  }

  test("q113: subword counts over the corpus, model broadcast, no collect") {
    val out = graft.operators.TextAnalysis.q113(Tables.documents(spark, SF))
    val rows = out.collect()
    assert(rows.length == Tables.documents(spark, SF).count())
    // every merge applied reduces the token count by exactly one
    rows.foreach { r =>
      assert(r.getLong(1) > 0 || r.getLong(2) == 0)
      assert(r.getLong(2) >= 0, s"doc ${r.getLong(0)}: negative merges")
    }
    assert(rows.exists(_.getLong(2) > 0), "no merges fired at all")
  }
}
