package graft

import org.scalatest.funsuite.AnyFunSuite

import search.QueryString
import search.QueryString._

/** Grammar + semantics sweep for the ES query-string mini-parser
  * (reference search box syntax, indexView.html:13-20): operator
  * precedence, implicit OR, Lucene `a NOT b`, field scoping, phrases,
  * prefixes — against hand-computed results on a controlled corpus.
  */
class QueryStringSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val df = {
    import spark.implicits._
    Seq(
      (1L, "spark shuffles data across executors", "en", 100L),
      (2L, "the lazy dog sleeps by the vector index", "en", 200L),
      (3L, "Spark and vectors make joins fast", "en", 300L),
      (4L, "der faule Hund schlaeft", "de", 400L),
      (5L, "spark vectorized reader", "de", 500L),
      (6L, null, "en", 600L)
    ).toDF("doc_id", "text", "lang", "n_chars")
  }

  private def ids(q: String): Set[Long] =
    df.filter(QueryString(df, q)).select("doc_id")
      .collect().map(_.getLong(0)).toSet

  // ---- parsing ----------------------------------------------------------

  test("precedence: AND binds tighter than OR; adjacency is OR") {
    // a OR b AND c  ->  Or(a, And(b, c))
    assert(parse("x OR y AND z") ==
      Or(Term(None, "x", false), And(Term(None, "y", false), Term(None, "z", false))))
    // adjacency = OR at the same level
    assert(parse("x y") == Or(Term(None, "x", false), Term(None, "y", false)))
  }

  test("parsing: binary NOT is Lucene a-minus-b; unary NOT negates") {
    assert(parse("x NOT y") ==
      And(Term(None, "x", false), Not(Term(None, "y", false))))
    assert(parse("NOT y") == Not(Term(None, "y", false)))
    assert(parse("NOT NOT y") == Not(Not(Term(None, "y", false))))
  }

  test("parsing: parens, fields, phrases, prefixes") {
    assert(parse("a AND (b OR c)") ==
      And(Term(None, "a", false),
        Or(Term(None, "b", false), Term(None, "c", false))))
    assert(parse("lang:en") == Term(Some("lang"), "en", false))
    assert(parse("spar*") == Term(None, "spar", true))
    assert(parse("\"the lazy dog\"") == Phrase(None, "the lazy dog"))
    assert(parse("text:\"lazy dog\"") == Phrase(Some("text"), "lazy dog"))
  }

  test("parsing: malformed input is rejected loudly") {
    assert(intercept[IllegalArgumentException](parse("")).getMessage.contains("empty"))
    assert(intercept[IllegalArgumentException](parse("(a OR b")).getMessage.contains("')'"))
    assert(intercept[IllegalArgumentException](parse("\"unterminated")).getMessage.contains("quote"))
    assert(intercept[IllegalArgumentException](parse("a AND")).getMessage.contains("expected clause"))
    assert(intercept[IllegalArgumentException](parse("lang:")).getMessage.contains("empty term"))
  }

  test("parsing: Lucene /regexp/ literals — bare, fielded, boosted; '/' in words") {
    assert(parse("/ab+c/") == Regex(None, "ab+c"))
    assert(parse("text:/s(can|ort)/") == Regex(Some("text"), "s(can|ort)"))
    // Delimiters ( ) " are legal INSIDE the pattern; boost binds after.
    assert(parse("text:/a(b|c)*/^2") == Boost(Regex(Some("text"), "a(b|c)*"), 2.0))
    assert(parse("x NOT text:/y+/") ==
      And(Term(None, "x", false), Not(Regex(Some("text"), "y+"))))
    // A mid-word slash is a word character, not a regexp opener.
    assert(parse("a/b") == Term(None, "a/b", false))
    assert(parse("f:a/b") == Term(Some("f"), "a/b", false))
    assert(intercept[IllegalArgumentException](
      parse("text:/unterminated")).getMessage.contains("regexp"))
    assert(intercept[IllegalArgumentException](
      parse("//")).getMessage.contains("regexp"))
    // Lucene `\/`: an escaped slash does NOT terminate the pattern.
    assert(parse("""/a\/b/""") == Regex(None, """a\/b"""))
    assert(parse("""url:/idx\/v[0-9]/""") == Regex(Some("url"), """idx\/v[0-9]"""))
    // An escape pair mid-pattern (e.g. \d) passes through untouched.
    assert(parse("""text:/a\db/""") == Regex(Some("text"), """a\db"""))
    // Escaped-slash pattern that never closes still errors.
    assert(intercept[IllegalArgumentException](
      parse("""text:/a\/b""")).getMessage.contains("regexp"))
  }

  test("escaped-slash regexp matches a slash-bearing token end-to-end") {
    import spark.implicits._
    val d = Seq((1L, "GET /api/v1 ok"), (2L, "GET /api/v2 ok"), (3L, "plain"))
      .toDF("doc_id", "text")
    def hits(q: String): Set[Long] =
      d.filter(QueryString(d, q)).select("doc_id").collect().map(_.getLong(0)).toSet
    // `\/` passes through to Java regex as an escaped literal '/'.
    assert(hits("""text:/\/api\/v1/""") == Set(1L))
    assert(hits("""text:/\/api\/v[0-9]/""") == Set(1L, 2L))
  }

  test("regexp atoms match whole tokens (Lucene implicit anchors)") {
    // /spark/ must NOT match 'sparks'-style supertokens: doc 5 has
    // 'spark' (exact) and 'vectorized' — /vector/ matches only doc 2's
    // exact 'vector' token, never 'vectorized'/'vectors'.
    assert(ids("text:/vector/") == Set(2L))
    assert(ids("text:/vector.*/") == Set(2L, 3L, 5L))
    assert(ids("text:/s(park|leeps)/") == Set(1L, 2L, 3L, 5L))
    // Composes with the boolean grammar; boost stays match-transparent.
    assert(ids("text:/s(park|leeps)/ NOT lang:de") == Set(1L, 2L, 3L))
    assert(ids("text:/vector.*/^3") == ids("text:/vector.*/"))
    // NULL text is a non-match, not an UNKNOWN that flips under NOT:
    // /.*/ matches every non-null text, so only the NULL-text doc survives.
    assert(ids("lang:en NOT text:/.*/") == Set(6L))
  }

  // ---- semantics ----------------------------------------------------------

  test("terms are token-equality, all fields, case-insensitive") {
    // 'spark' as a token: docs 1, 5 (text) and 3 ('Spark' lowercased);
    // never doc 2 ('vector index' has no spark token).
    assert(ids("spark") == Set(1L, 3L, 5L))
    assert(ids("SPARK OR ignored") == ids("spark ignored"), "case-insensitive terms")
    // unfielded terms search non-text columns too (the _all behavior)
    assert(ids("de") == Set(4L, 5L))
    assert(ids("300") == Set(3L))
  }

  test("field scoping restricts the atom to one column") {
    assert(ids("lang:en") == Set(1L, 2L, 3L, 6L))
    assert(ids("lang:spark") == Set.empty, "no 'spark' token in lang")
    assert(intercept[IllegalArgumentException](ids("bogus:x")).getMessage.contains("unknown field"))
  }

  test("prefix and phrase atoms") {
    assert(ids("vector*") == Set(2L, 3L, 5L), "vector, vectors, vectorized")
    assert(ids("vector") == Set(2L), "exact token only")
    assert(ids("\"the lazy dog\"") == Set(2L))
    assert(ids("\"lazy the dog\"") == Set.empty, "phrases are order-sensitive")
    assert(ids("text:\"the  LAZY dog\"") == Set(2L), "phrase is whitespace-normalized + case-folded")
  }

  test("boolean combinations and precedence over real rows") {
    assert(ids("spark AND lang:de") == Set(5L))
    assert(ids("spark OR dog AND lang:de") == Set(1L, 3L, 5L),
      "OR(spark, AND(dog, lang:de)): dog matches only doc 2 which is en, so the AND arm is empty")
    assert(ids("(spark OR dog) AND lang:de") == Set(5L))
    assert(ids("spark NOT vectorized") == Set(1L, 3L))
    assert(ids("NOT lang:en") == Set(4L, 5L))
    // NULL text never matches and never un-matches under NOT
    assert(ids("lang:en NOT spark") == Set(2L, 6L))
  }

  test("boost parsing: terms, fields, phrases, groups, prefixes") {
    assert(parse("spark^2") == Boost(Term(None, "spark", false), 2.0))
    assert(parse("text:spark^0.5") == Boost(Term(Some("text"), "spark", false), 0.5))
    assert(parse("app*^3") == Boost(Term(None, "app", true), 3.0))
    assert(parse("\"lazy dog\"^1.5") == Boost(Phrase(None, "lazy dog"), 1.5))
    assert(parse("(a OR b)^4") ==
      Boost(Or(Term(None, "a", false), Term(None, "b", false)), 4.0))
    // Caret binds tighter than AND/OR/NOT (Lucene).
    assert(parse("a^2 AND b") ==
      And(Boost(Term(None, "a", false), 2.0), Term(None, "b", false)))
    assert(parse("NOT a^2") == Not(Boost(Term(None, "a", false), 2.0)))
    // A word that merely contains '^' without a numeric tail is a term.
    assert(parse("a^b") == Term(None, "a^b", false))
  }

  test("boostedTerms: nested boosts multiply, NOT/prefix/phrase excluded") {
    assert(boostedTerms(parse("text:spark^2 OR text:vector^0.5 OR text:join")) ==
      Seq((Some("text"), "spark", 2.0), (Some("text"), "vector", 0.5),
        (Some("text"), "join", 1.0)))
    assert(boostedTerms(parse("(a^2 b)^3")) ==
      Seq((None, "a", 6.0), (None, "b", 3.0)))
    assert(boostedTerms(parse("a NOT b^9")) == Seq((None, "a", 1.0)),
      "must_not clauses filter, never score")
    assert(boostedTerms(parse("pre*^2 \"a phrase\"^2 plain")) ==
      Seq((None, "plain", 1.0)))
    assert(boostedTerms(parse("MiXeD^2")) == Seq((None, "mixed", 2.0)),
      "scoring terms are lowercased like the match side")
  }

  test("boost is transparent to matching") {
    assert(ids("spark^9") == ids("spark"))
    assert(ids("(spark OR dog)^2 AND lang:de") == ids("(spark OR dog) AND lang:de"))
  }

  test("registered search_query_string returns rows at sf0.001") {
    assert(SparkEntry.queries("search_query_string")(spark, sf).count() > 0)
  }

  test("registered search_query_string_boosted ranks by weighted BM25 at sf0.001") {
    val r = SparkEntry.queries("search_query_string_boosted")(spark, sf).collect()
    assert(r.nonEmpty)
    val scores = r.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse, "descending by weighted score")
  }
}
