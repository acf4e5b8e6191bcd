package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ES `query_string` mini-parser — the syntax the reference's search
  * box actually accepts: its UI passes the raw `q=` to Elasticsearch's
  * query-string parser (reference `indexView.html:13-20`), which
  * supports more than a bare keyword. Supported grammar (the subset a
  * user can type into that box):
  *
  * {{{
  *   query   := orExpr
  *   orExpr  := andExpr ((OR | ε) andExpr)*        ε = adjacency, ES
  *                                                 default_operator=OR
  *   andExpr := notExpr ((AND | NOT) notExpr)*     a NOT b ≡ a AND NOT b
  *   notExpr := NOT notExpr | '(' orExpr ')' | atom
  *   atom    := [field ':'] ( '"' phrase '"' | word['*'] )
  * }}}
  *
  * Precedence NOT > AND > OR, left-associative — Lucene's "classic"
  * operator precedence, with `a NOT b` given its Lucene meaning
  * (a minus b) rather than the implicit-OR reading. Match semantics
  * compile onto the engine's existing search primitives over the SAME
  * pinned stringification the bulk importer uses:
  *
  *  - `word`    — some whitespace token of the field equals the word
  *                (case-insensitive; `search_tokenized_match` shape)
  *  - `word*`   — some token starts with the prefix
  *                (`search_prefix_match` shape)
  *  - `"a b"`   — whitespace-normalized containment
  *                (`search_phrase_match` shape)
  *  - no field  — disjunction over every column, like the ES `_all`
  *                search the reference delegates to
  *
  * Everything compiles to one codegen'd per-row predicate: a scan +
  * filter with no shuffle — the query-string front end costs nothing
  * at 100 TB beyond the scan it already implies.
  */
object QueryString {

  // ---- AST -------------------------------------------------------------
  sealed trait Node
  final case class Term(field: Option[String], word: String, prefix: Boolean) extends Node
  final case class Phrase(field: Option[String], phrase: String) extends Node
  final case class And(l: Node, r: Node) extends Node
  final case class Or(l: Node, r: Node) extends Node
  final case class Not(n: Node) extends Node

  // ---- Tokenizer ---------------------------------------------------------
  private sealed trait Tok
  private case object LP extends Tok
  private case object RP extends Tok
  private case object AndT extends Tok
  private case object OrT extends Tok
  private case object NotT extends Tok
  private final case class PhraseT(field: Option[String], s: String) extends Tok
  private final case class WordT(field: Option[String], s: String, prefix: Boolean) extends Tok

  private def tokenize(q: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    def closingQuote(from: Int): Int = {
      val end = q.indexOf('"', from)
      if (end < 0) throw new IllegalArgumentException(
        s"query_string: unterminated quote at offset ${from - 1} in <$q>")
      end
    }
    while (i < q.length) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += LP; i += 1 }
      else if (c == ')') { out += RP; i += 1 }
      else if (c == '"') {
        val end = closingQuote(i + 1)
        out += PhraseT(None, q.substring(i + 1, end)); i = end + 1
      } else {
        val start = i
        while (i < q.length && !q(i).isWhitespace &&
          q(i) != '(' && q(i) != ')' && q(i) != '"') i += 1
        val w = q.substring(start, i)
        if (i < q.length && q(i) == '"' && w.nonEmpty && w.endsWith(":")) {
          val end = closingQuote(i + 1) // field:"quoted phrase"
          out += PhraseT(Some(w.dropRight(1)), q.substring(i + 1, end)); i = end + 1
        } else w match {
          case "AND" => out += AndT
          case "OR"  => out += OrT
          case "NOT" => out += NotT
          case _ =>
            val (field, rest) = w.indexOf(':') match {
              case -1 => (None, w)
              case p  => (Some(w.substring(0, p)), w.substring(p + 1))
            }
            val (word, pre) =
              if (rest.endsWith("*")) (rest.dropRight(1), true) else (rest, false)
            if (word.isEmpty) throw new IllegalArgumentException(
              s"query_string: empty term <$w> in <$q>")
            out += WordT(field, word, pre)
        }
      }
    }
    out.toList
  }

  // ---- Recursive-descent parser -------------------------------------------
  def parse(q: String): Node = {
    var toks = tokenize(q)
    if (toks.isEmpty)
      throw new IllegalArgumentException("query_string: empty query")
    def peek: Option[Tok] = toks.headOption
    def next(): Tok = { val t = toks.head; toks = toks.tail; t }

    def parseOr(): Node = {
      var n = parseAnd()
      var continue = true
      while (continue) peek match {
        case Some(OrT) => next(); n = Or(n, parseAnd())
        case Some(LP | NotT | _: WordT | _: PhraseT) => // adjacency = OR
          n = Or(n, parseAnd())
        case _ => continue = false
      }
      n
    }
    def parseAnd(): Node = {
      var n = parseNot()
      var continue = true
      while (continue) peek match {
        case Some(AndT) => next(); n = And(n, parseNot())
        case Some(NotT) => next(); n = And(n, Not(parseNot())) // a NOT b
        case _ => continue = false
      }
      n
    }
    def parseNot(): Node = peek match {
      case Some(NotT) => next(); Not(parseNot())
      case Some(LP) =>
        next()
        val n = parseOr()
        if (peek.contains(RP)) next()
        else throw new IllegalArgumentException(s"query_string: missing ')' in <$q>")
        n
      case Some(w: WordT)   => next(); Term(w.field, w.s, w.prefix)
      case Some(p: PhraseT) => next(); Phrase(p.field, p.s)
      case t => throw new IllegalArgumentException(
        s"query_string: expected clause, found $t in <$q>")
    }

    val root = parseOr()
    if (toks.nonEmpty) throw new IllegalArgumentException(
      s"query_string: trailing input $toks in <$q>")
    root
  }

  // ---- Compile to a Column predicate ---------------------------------------

  /** A column's searchable token stream: pinned stringification (same
    * as the bulk importer / `anyFieldContains`), lowercased, split on
    * whitespace.
    */
  private def toks(df: DataFrame, name: String): Column = {
    val f = df.schema.fields.find(_.name.equalsIgnoreCase(name)).getOrElse(
      throw new IllegalArgumentException(
        s"query_string: unknown field <$name>; have ${df.columns.mkString(", ")}"))
    split(lower(graft.etl.Stringify.column(col(f.name), f.dataType)), "\\s+")
  }

  /** Per-field atom predicates, null-safe (a NULL field value is a
    * non-match, never an UNKNOWN that flips under NOT).
    */
  private def fieldMatch(df: DataFrame, name: String, atom: Node): Column = {
    val t = toks(df, name)
    val raw = atom match {
      case Term(_, w, false) => array_contains(t, w.toLowerCase)
      case Term(_, w, true)  => exists(t, x => x.startsWith(w.toLowerCase))
      case Phrase(_, p) =>
        concat_ws(" ", t).contains(p.toLowerCase.trim.replaceAll("\\s+", " "))
      case other => throw new IllegalArgumentException(s"not an atom: $other")
    }
    coalesce(raw, lit(false))
  }

  private def atomMatch(df: DataFrame, field: Option[String], atom: Node): Column =
    field match {
      case Some(f) => fieldMatch(df, f, atom)
      case None => // the ES _all behavior the reference's UI relies on
        df.columns.map(fieldMatch(df, _, atom)).reduce(_ || _)
    }

  /** Compile a parsed query to one boolean `Column` over `df`. */
  def compile(df: DataFrame, node: Node): Column = node match {
    case t @ Term(f, _, _)   => atomMatch(df, f, t)
    case p @ Phrase(f, _)    => atomMatch(df, f, p)
    case And(l, r)           => compile(df, l) && compile(df, r)
    case Or(l, r)            => compile(df, l) || compile(df, r)
    case Not(n)              => !compile(df, n)
  }

  /** One-call front end: `df.filter(QueryString(df, q))`. */
  def apply(df: DataFrame, q: String): Column = compile(df, parse(q))
}
