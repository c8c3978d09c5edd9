package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GraphQL-dialect frontend: the reference's ENTIRE user interface is
  * "hand a GraphQL query string to the endpoint, get rows back"
  * (/root/reference/query_opentargets.py:4-16; the query texts live
  * in /root/reference/candidate_drugs.py:19-72 and x2.py). `Graft.sql`
  * covers the string-in/rows-out SHAPE in SQL; this module covers the
  * DIALECT, so a reference user can paste their query text unchanged.
  *
  * Supported grammar (the subset every reference query uses):
  * {{{
  *   [query [Name]] { root(arg: "ID") { selection... } }
  *   selection := name [(args)] [{ selection... }]
  * }}}
  * with `#` comments, commas-as-whitespace, string/number/name
  * argument values, VARIABLES (`query ($id: String!) { ... }` with
  * `execute(kg, q, Map("id" -> ...))` bindings and inline defaults —
  * the form every parameterized Open Targets docs example uses),
  * named FRAGMENTS (`fragment F on Type { ... }` + `...F` spreads,
  * the docs' row-selection factoring — expanded at parse time, so the
  * resolved AST is identical to the inlined query; cycles, unused and
  * duplicate fragments are targeted errors), and response ALIASES
  * (`alias: field` — resolution uses the field name, only the output
  * column renames). Variables likewise substitute at parse time, so
  * execution is byte-identical to the inlined query. DIRECTIVES
  * `@skip(if:)` / `@include(if:)` — the two spec-defined executable
  * directives — resolve at parse time too (literal or variable
  * condition), on fields and on fragment spreads: the resolved AST is
  * identical to the query with excluded fields deleted. The
  * `__typename` meta-field resolves at EVERY selection level to the
  * reference schema's type names — the field Apollo-generation
  * clients inject into every query, so generated clients work
  * unchanged. INLINE FRAGMENTS (`... on Type { sel }`) select the
  * arms of the one union the schema exposes — `SearchResult.object:
  * EntityUnionType = Target | Drug | Disease` (opentargets.schema:
  * 502,1290) — resolved as the union tag + one nullable struct per
  * arm (SURVEY §1.2's encoding); a stray inline fragment anywhere
  * else, or an unknown type condition, is a targeted error. The
  * `facets` root (the schema's remaining search feature) serves
  * facet hits + per-category counts over the search hit relation.
  * Unknown directives, non-boolean conditions and multiple
  * operations are rejected with a targeted error.
  *
  * Schema = the [[KnowledgeGraph]] views (disease / target / drug
  * entities, scored association edges, known-drug fact rows,
  * pathways — SURVEY.md §1.1 / §7.1): roots `disease(efoId:)`,
  * `target(ensemblId:)`, `drug(chemblId:)`; connections follow the
  * reference schema's `{ count rows { ... } }` shape
  * (opentargets.schema:263-265, 855-932) except `pathways`, which is
  * a bare list (opentargets.schema:1202-1206, the
  * query_opentargets.py example).
  *
  * Execution is Spark-first and point-lookup shaped: the root entity
  * is one filtered scan; each selected connection FILTERS its edge
  * relation by the root key BEFORE aggregating (partition-prunable at
  * scale, and empty connections yield count=0/rows=[] without an
  * outer-join null dance), collects its rows into a deterministically
  * sorted array (score desc / rank asc / key asc — the server's
  * documented default orderings), and broadcast-joins the 1-row
  * result back. Output is ONE row per root with nested columns in
  * selection order — the GraphQL `data` object as a Spark schema.
  *
  * Paginated connections ([[Paginable]]) are never unbounded: an
  * omitted `page` serves a [[DefaultPageSize]]-row first page (server
  * parity — `count` stays the total), and the requested page is
  * rank-limited BEFORE the array fold (TakeOrderedAndProject, the q43
  * discipline), so a hub entity's crawl-scale edge list costs a top-k
  * merge, not a single-reducer collect.
  */
object GraphQl {

  /** One parsed field: name, arguments, nested selection, and the
    * optional response alias (`alias: field` — resolution always uses
    * `name`; only the OUTPUT column is renamed, [[out]]).
    */
  final case class Field(name: String, args: Map[String, String],
                         sel: Seq[Field], alias: Option[String] = None) {
    /** The response key: the alias when present, else the field name. */
    def out: String = alias.getOrElse(name)
  }

  final case class ParseError(msg: String)
    extends IllegalArgumentException(s"graphql: $msg")

  // ------------------------------------------------------------------
  // Lexer + recursive-descent parser
  // ------------------------------------------------------------------

  private sealed trait Tok
  private final case class Name(s: String) extends Tok
  private final case class Str(s: String) extends Tok
  private final case class Num(s: String) extends Tok
  private final case class Punct(c: Char) extends Tok
  private final case class Var(s: String) extends Tok
  private case object Spread extends Tok

  private def lex(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < q.length) {
      val c = q(i)
      if (c.isWhitespace || c == ',') i += 1
      else if (c == '#') { while (i < q.length && q(i) != '\n') i += 1 }
      else if ("{}():[]!=@".contains(c)) { out += Punct(c); i += 1 }
      else if (c == '"') {
        val sb = new StringBuilder; i += 1
        while (i < q.length && q(i) != '"') {
          if (q(i) == '\\' && i + 1 < q.length) { sb += q(i + 1); i += 2 }
          else { sb += q(i); i += 1 }
        }
        if (i >= q.length) throw ParseError("unterminated string literal")
        i += 1; out += Str(sb.result())
      }
      else if (c.isLetter || c == '_') {
        val j = i
        while (i < q.length && (q(i).isLetterOrDigit || q(i) == '_')) i += 1
        out += Name(q.substring(j, i))
      }
      else if (c.isDigit || c == '-') {
        val j = i; i += 1
        while (i < q.length && (q(i).isDigit || q(i) == '.')) i += 1
        out += Num(q.substring(j, i))
      }
      else if (c == '$') {
        i += 1
        val j = i
        while (i < q.length && (q(i).isLetterOrDigit || q(i) == '_')) i += 1
        if (i == j) throw ParseError("'$' must be followed by a variable name")
        out += Var(q.substring(j, i))
      }
      else if (c == '.') {
        if (i + 2 < q.length && q(i + 1) == '.' && q(i + 2) == '.') {
          out += Spread; i += 3
        } else throw ParseError(
          s"unexpected '.' — fragment spreads are written '...'")
      }
      else throw ParseError(s"unexpected character '$c'")
    }
    out.result()
  }

  /** Parse a document to its single root field. */
  def parse(q: String): Field = parse(q, Map.empty)

  /** Parse with variable bindings (the `query ($id: String!)` form in
    * the Open Targets docs): declared variables resolve from
    * `variables`, falling back to an inline default (`= "EFO_X"`).
    * Using an undeclared variable, or declaring one with neither a
    * binding nor a default, is a targeted error. Values substitute at
    * parse time, so execution is byte-identical to the inlined form
    * (GraphQlSpec pins q152's variable form hash-equal).
    */
  def parse(q: String, variables: Map[String, String]): Field = {
    val toks = lex(q)
    var p = 0
    // declared name -> default (None = no default)
    var declared = Map.empty[String, Option[String]]
    def resolveVar(v: String): String = declared.get(v) match {
      case None => throw ParseError(
        s"variable $$$v is not declared in the operation header")
      case Some(dflt) => variables.get(v).orElse(dflt).getOrElse(
        throw ParseError(s"no value provided for variable $$$v " +
          "(and it has no default)"))
    }
    def peek: Option[Tok] = if (p < toks.length) Some(toks(p)) else None
    def next(): Tok = {
      if (p >= toks.length) throw ParseError("unexpected end of query")
      p += 1; toks(p - 1)
    }
    def expect(c: Char): Unit = next() match {
      case Punct(`c`) => ()
      case t => throw ParseError(s"expected '$c', found $t")
    }
    // `($x: Type! = default, $y: [String!]! ...)` after `query [Name]`
    def parseVarDefs(): Unit = {
      expect('(')
      var done = false
      while (!done) next() match {
        case Punct(')') => done = true
        case Var(v) =>
          expect(':')
          // consume the type loosely: names, [, ], ! — the engine is
          // dynamically typed downstream, the declaration is contract
          var inType = true
          while (inType) peek match {
            case Some(Name(_)) | Some(Punct('[')) | Some(Punct(']')) |
                 Some(Punct('!')) => next()
            case _ => inType = false
          }
          val dflt = peek match {
            case Some(Punct('=')) =>
              next()
              next() match {
                case Str(s) => Some(s)
                case Num(s) => Some(s)
                case Name(s) => Some(s)
                case t => throw ParseError(s"bad default value $t for $$$v")
              }
            case _ => None
          }
          if (declared.contains(v)) throw ParseError(
            s"variable $$$v is declared twice in the operation header")
          declared += v -> dflt
        case t => throw ParseError(s"bad variable definition at $t")
      }
    }
    def parseArgs(): Map[String, String] = peek match {
      case Some(Punct('(')) =>
        expect('(')
        val args = Map.newBuilder[String, String]
        var done = false
        while (!done) peek match {
          case Some(Punct(')')) => next(); done = true
          case Some(Name(k)) =>
            next(); expect(':')
            next() match {
              case Str(v) => args += k -> v
              case Num(v) => args += k -> v
              case Name(v) => args += k -> v // enum value
              case Var(v) => args += k -> resolveVar(v)
              case Punct('[') =>
                // list value (entityNames: ["disease"]) — stored
                // NUL-joined (ListSep): unlike a comma, NUL cannot
                // appear in a free-text item (mapIds queryTerms like
                // "46,XX disorder" must survive the round trip)
                val items = Seq.newBuilder[String]
                var closed = false
                while (!closed) next() match {
                  case Punct(']') => closed = true
                  case Str(v) => items += v
                  case Name(v) => items += v
                  case Var(v) => items += resolveVar(v)
                  case t => throw ParseError(s"bad list item $t for '$k'")
                }
                args += k -> items.result().mkString(ListSep)
              case Punct('{') =>
                // object value (page: {index: 0, size: 25} — the
                // schema's Pagination input, opentargets.schema:
                // 1047-1050) — flattened into dotted arg keys;
                // member values are scalars
                var closed = false
                while (!closed) next() match {
                  case Punct('}') => closed = true
                  case Name(sub) =>
                    expect(':')
                    next() match {
                      case Str(v) => args += s"$k.$sub" -> v
                      case Num(v) => args += s"$k.$sub" -> v
                      case Name(v) => args += s"$k.$sub" -> v
                      case Var(v) => args += s"$k.$sub" -> resolveVar(v)
                      case t => throw ParseError(s"bad value $t for '$k.$sub'")
                    }
                  case t => throw ParseError(s"bad object member $t in '$k'")
                }
              case t => throw ParseError(s"bad argument value $t for '$k'")
            }
          case t => throw ParseError(s"bad argument list at $t")
        }
        args.result()
      case _ => Map.empty
    }
    // `@skip(if: Bool)` / `@include(if: Bool)` after a field's args or
    // a fragment spread's name — the two spec-defined executable
    // directives (the only ones Open Targets docs queries use).
    // Conditions resolve at PARSE time (literals or bound variables —
    // the q205 discipline), so the resolved AST is identical to the
    // query with the excluded fields deleted; returns whether the
    // carrying field survives. Unknown directives and malformed
    // conditions are targeted errors, not silent no-ops.
    def parseDirectives(): Boolean = {
      var keep = true
      var more = true
      while (more) peek match {
        case Some(Punct('@')) =>
          next()
          val dname = next() match {
            case Name(n) => n
            case t => throw ParseError(
              s"'@' must be followed by a directive name, found $t")
          }
          if (dname != "skip" && dname != "include") throw ParseError(
            s"unsupported directive @$dname — only @skip and @include " +
              "are supported")
          val dargs = parseArgs()
          if (dargs.keySet != Set("if")) throw ParseError(
            s"@$dname takes exactly the 'if' argument, got " +
              s"(${dargs.keys.toSeq.sorted.mkString(", ")})")
          val b = dargs("if") match {
            case "true" => true
            case "false" => false
            case other => throw ParseError(
              s"@$dname(if:) must be a Boolean, got '$other'")
          }
          keep = keep && (if (dname == "skip") !b else b)
        case _ => more = false
      }
      keep
    }
    def parseSelection(): Seq[Field] = {
      expect('{')
      val fields = Seq.newBuilder[Field]
      var done = false
      while (!done) peek match {
        case Some(Punct('}')) => next(); done = true
        case Some(Spread) =>
          // named-fragment spread — held as a marker field until the
          // whole document's fragments are parsed, then expanded —
          // or an INLINE fragment (`... on Type { sel }`), held as a
          // type-condition arm the union resolver discriminates on
          next()
          next() match {
            case Name("on") =>
              val tpe = next() match {
                case Name(t) => t
                case t => throw ParseError(
                  s"'... on' needs a type name, found $t")
              }
              val keep = parseDirectives()
              val sel = peek match {
                case Some(Punct('{')) => parseSelection()
                case _ => throw ParseError(
                  s"inline fragment '... on $tpe' needs a selection")
              }
              if (sel.isEmpty) throw ParseError(
                s"inline fragment '... on $tpe' needs a selection")
              if (keep) fields += Field(InlineMark + tpe, Map.empty,
                sel, Some(tpe))
              else fields ++= spreadSkipMarks(sel)
            case Name(fr) =>
              // a directive-skipped spread still REFERENCES its
              // fragment: it contributes no fields, but it keeps a
              // bookkeeping marker so REACHABLE usage and cycles are
              // still tracked (a skipped spread inside an unreachable
              // fragment must not mask the unused-fragment check)
              val mark = if (parseDirectives()) SpreadMark else SkipSpreadMark
              fields += Field(mark + fr, Map.empty, Nil)
            case t => throw ParseError(s"bad fragment spread at $t")
          }
        case Some(Name(n)) =>
          next()
          // response alias: `alias: field` — resolution uses the real
          // field name; only the output column is renamed
          val (alias, name) = peek match {
            case Some(Punct(':')) =>
              next()
              next() match {
                case Name(real) => (Some(n), real)
                case t => throw ParseError(
                  s"alias '$n:' must be followed by a field name, found $t")
              }
            case _ => (None, n)
          }
          val args = parseArgs()
          val keep = parseDirectives()
          val sel = peek match {
            case Some(Punct('{')) => parseSelection()
            case _ => Seq.empty
          }
          if (keep) fields += Field(name, args, sel, alias)
          // a directive-excluded field still REFERENCES the fragments
          // its sub-selection spreads (`foo @skip(if: true) { ...f }`
          // is spec-valid): retain those spreads as skip-marks so the
          // unused-fragment and cycle checks see them — the same
          // bookkeeping a skipped spread itself keeps
          else fields ++= spreadSkipMarks(sel)
        case t => throw ParseError(s"expected a field name, found $t")
      }
      fields.result()
    }
    // document = one operation (optionally `query [Name] [varDefs]`)
    // plus any number of `fragment Name on Type { sel }` definitions,
    // in any order. Variables inside a fragment resolve against the
    // operation's declarations, so a fragment USING variables must
    // appear after the operation header (parse-time substitution —
    // the q205 discipline).
    var rootsOpt: Option[Seq[Field]] = None
    var frags = Map.empty[String, Seq[Field]]
    def requireSingleOp(): Unit = if (rootsOpt.nonEmpty) throw ParseError(
      "exactly one operation is supported")
    while (p < toks.length) peek match {
      case Some(Name("mutation")) =>
        throw ParseError("mutations are not supported (read-only engine)")
      case Some(Name("fragment")) =>
        next()
        val fname = next() match {
          case Name(n) if n != "on" => n
          case t => throw ParseError(s"fragment needs a name, found $t")
        }
        next() match {
          case Name("on") => ()
          case t => throw ParseError(
            s"fragment '$fname' needs 'on <Type>', found $t")
        }
        next() match {
          // the type condition is recorded-and-unchecked: the engine
          // is dynamically typed downstream (field resolution errors
          // are targeted per entity), the declaration is contract
          case Name(_) => ()
          case t => throw ParseError(
            s"fragment '$fname' needs a type name after 'on', found $t")
        }
        if (frags.contains(fname)) throw ParseError(
          s"fragment '$fname' is defined twice")
        frags += fname -> parseSelection()
      case Some(Name("query")) =>
        requireSingleOp()
        next()
        peek match {
          case Some(Name(n)) if n != "fragment" => next(); ()
          case _ => ()
        }
        peek match { case Some(Punct('(')) => parseVarDefs() case _ => () }
        rootsOpt = Some(parseSelection())
      case Some(Punct('{')) =>
        requireSingleOp()
        rootsOpt = Some(parseSelection())
      case Some(t) =>
        throw ParseError(s"unexpected $t at document level")
      case None => ()
    }
    // every supplied binding must be declared — a typo'd binding key
    // silently falling back to a default is the quiet failure this
    // parser otherwise never allows
    val undeclared = variables.keySet.diff(declared.keySet)
    if (undeclared.nonEmpty) throw ParseError(
      s"bindings for undeclared variable(s): " +
        undeclared.toSeq.sorted.map("$" + _).mkString(", "))
    // expand fragment spreads: the resolved AST is identical to the
    // inlined query (GraphQlSpec pins the round-trip; q215 carries an
    // existing template's oracle through a fragment verbatim)
    val used = scala.collection.mutable.Set.empty[String]
    def visit(fr: String, stack: List[String], emit: Boolean): Seq[Field] = {
      val body = frags.getOrElse(fr, throw ParseError(
        s"fragment '$fr' is not defined"))
      if (stack.contains(fr)) throw ParseError(
        s"fragment cycle: ${(fr :: stack).reverse.mkString(" -> ")}")
      used += fr
      val out = expand(body, fr :: stack)
      if (emit) out else Seq.empty
    }
    def expand(sel: Seq[Field], stack: List[String]): Seq[Field] =
      sel.flatMap { f =>
        if (f.name.startsWith(SkipSpreadMark))
          // directive-skipped: walk for usage/cycle bookkeeping,
          // contribute nothing
          visit(f.name.stripPrefix(SkipSpreadMark), stack, emit = false)
        else if (f.name.startsWith(SpreadMark))
          visit(f.name.stripPrefix(SpreadMark), stack, emit = true)
        else Seq(f.copy(sel = expand(f.sel, stack)))
      }
    def noDuplicates(sel: Seq[Field], path: String): Unit = {
      // GraphQL merges duplicate selections of one response key; this
      // dialect does not implement selection merging, and silently
      // keeping the FIRST (the rows/hits collectFirst sites) would
      // drop data — so duplicates (now reachable via fragment
      // spreads) are a targeted error instead
      val dup = sel.groupBy(_.out).collect { case (k, fs) if fs.size > 1 => k }
      if (dup.nonEmpty) throw ParseError(
        s"duplicate selection${if (dup.size > 1) "s" else ""} " +
          s"${dup.toSeq.sorted.mkString(", ")} at $path — selection " +
          "merging is not supported; combine the fields into one " +
          "selection (or alias one of them)")
      sel.foreach(f => noDuplicates(f.sel, s"$path.${f.name}"))
    }
    val roots = expand(rootsOpt.getOrElse(throw ParseError(
      "the document has no operation — nothing to execute")), Nil)
    val unused = frags.keySet.diff(used)
    if (unused.nonEmpty) throw ParseError(
      s"unused fragment(s): ${unused.toSeq.sorted.mkString(", ")}")
    roots match {
      case Seq(one) =>
        noDuplicates(Seq(one), "query")
        one
      case Seq() => throw ParseError(
        "the operation has no root field (its selection is empty, or " +
          "its only root field was excluded by a directive) — nothing " +
          "to execute")
      case many => throw ParseError(
        s"exactly one root field is supported, found ${many.map(_.name).mkString(", ")}")
    }
  }

  /** Marker prefix for unexpanded fragment spreads inside a parsed
    * selection (NUL-prefixed — can never collide with a field name).
    */
  private val SpreadMark: String = "\u0000..."

  /** Separator for parsed LIST argument values (entityNames, batch
    * ids, queryTerms): NUL — the one character no free-text item can
    * carry (a comma-joined encoding silently split "46,XX disorder"
    * into two mapIds terms).
    */
  private val ListSep: String = SpreadMark.take(1)

  /** A parsed list argument back to its items (limit −1: a TRAILING
    * empty item must survive the split so the empty-term guards can
    * reject it loudly instead of it silently vanishing).
    */
  private def splitList(joined: String): Seq[String] =
    joined.split(java.util.regex.Pattern.quote(ListSep), -1).toSeq

  /** Marker prefix for an inline-fragment arm (`... on Type`): the
    * field's name is `InlineMark + Type`, its alias the bare type
    * name (so the response column is the type). Arms survive
    * fragment expansion as ordinary fields; only the union resolver
    * (search hits' `object`) accepts them — anywhere else
    * [[checkInline]] rejects them with a targeted error.
    */
  private val InlineMark: String = SpreadMark.take(1) + "on:"

  /** The fragment spreads inside an excluded selection, as skip-marks
    * — usage/cycle bookkeeping for fields and inline fragments
    * removed by a directive.
    */
  private def spreadSkipMarks(s: Seq[Field]): Seq[Field] = s.flatMap { g =>
    if (g.name.startsWith(SkipSpreadMark)) Seq(g)
    else if (g.name.startsWith(SpreadMark))
      Seq(Field(SkipSpreadMark + g.name.stripPrefix(SpreadMark),
        Map.empty, Nil))
    else spreadSkipMarks(g.sel)
  }

  /** Inline fragments are valid ONLY under the union-typed `object`
    * field of search hits — a stray `... on Type` anywhere else is a
    * targeted error (this dialect's selections are concrete-typed
    * everywhere else, so a type-refinement arm is meaningless there).
    */
  private def checkInline(f: Field, underUnion: Boolean): Unit =
    f.sel.foreach { g =>
      if (g.name.startsWith(InlineMark)) {
        if (!underUnion) throw ParseError(
          s"inline fragments are supported only on the union-typed " +
            s"'object' fields (search/mapIds hits, similarEntities " +
            s"rows) — found '... on ${g.out}' under '${f.name}'")
        checkInline(g, underUnion = false)
      } else checkInline(g, underUnion = g.name == "object")
    }

  /** Marker for a directive-SKIPPED spread: expanded for
    * usage/cycle bookkeeping only, contributing no fields.
    */
  private val SkipSpreadMark: String = "\u0000xxx"

  // ------------------------------------------------------------------
  // Executor
  // ------------------------------------------------------------------

  /** Scalar fields per entity type → source column name. */
  private val Scalars: Map[(String, String), String] = Map(
    ("disease", "id") -> "id", ("disease", "name") -> "name",
    ("target", "id") -> "id", ("target", "approvedSymbol") -> "approvedSymbol",
    ("target", "bioType") -> "bioType",
    ("drug", "id") -> "id", ("drug", "name") -> "name",
    ("drug", "synonyms") -> "synonyms", ("drug", "drugType") -> "drugType",
    ("drug", "isApproved") -> "isApproved",
    ("drug", "maximumClinicalTrialPhase") -> "maximumClinicalTrialPhase")

  /** GraphQL type names for the `__typename` meta-field that every
    * Apollo-generation client injects into its queries — served at
    * every selection level so generated clients work unchanged. Names
    * are the reference schema's (`type Disease` opentargets.schema:150,
    * `Target`:1348, `Drug`:347, `Pathway`:1053, `SearchResult`:1276),
    * keyed by the resolver's internal entity keys.
    */
  private val TypeNames: Map[String, String] = Map(
    "disease" -> "Disease", "target" -> "Target", "drug" -> "Drug",
    "pathway" -> "Pathway", "hit" -> "SearchResult",
    "meta" -> "Meta", "apiVersion" -> "APIVersion",
    "dataVersion" -> "DataVersion",
    "associationDatasources" -> "EvidenceSource",
    "interactionResources" -> "InteractionResources",
    "geneOntologyTerms" -> "GeneOntologyTerm",
    "phenotypeHPO" -> "HPO")

  /** (connection object, row object) type names per connection site —
    * schema-true where the schema names them (`KnownDrugs`:916 /
    * `KnownDrug`:855, `AssociatedTargets`:62 / `AssociatedTarget`:53,
    * `AssociatedDiseases`:44 / `AssociatedDisease`:35,
    * `LinkedTargets`:958, `ReactomePathway`:1202); `LinkedTarget` is
    * this dialect's name for its {rank, target} linkedTargets row
    * (the schema's rows are bare targets — the rank field is the
    * dialect's addition, so the row type is too).
    */
  private val ConnTypes: Map[(String, String), (String, String)] = Map(
    ("disease", "knownDrugs") -> (("KnownDrugs", "KnownDrug")),
    ("target", "knownDrugs") -> (("KnownDrugs", "KnownDrug")),
    ("disease", "associatedTargets") ->
      (("AssociatedTargets", "AssociatedTarget")),
    ("target", "associatedDiseases") ->
      (("AssociatedDiseases", "AssociatedDisease")),
    ("drug", "linkedTargets") -> (("LinkedTargets", "LinkedTarget")),
    ("target", "pathways") -> (("", "ReactomePathway")),
    ("target", "tractability") -> (("", "Tractability")),
    ("disease", "phenotypes") -> (("DiseaseHPOs", "DiseaseHPO")),
    ("disease", "evidences") -> (("Evidences", "Evidence")))

  private def noSubSel(f: Field): Unit =
    if (f.sel.nonEmpty) throw ParseError(
      "'__typename' is a meta-field — drop its selection")

  private def entityStruct(entity: String, sel: Seq[Field],
                           fields: Map[String, Column]): Column = {
    if (sel.isEmpty) throw ParseError(
      s"'$entity' needs a selection of its fields")
    struct(sel.map { f =>
      if (f.name == "__typename") {
        noSubSel(f)
        lit(TypeNames.getOrElse(entity, entity.capitalize)).as(f.out)
      } else {
        if (f.sel.nonEmpty) throw ParseError(
          s"'$entity.${f.name}' is a scalar — drop its selection")
        val src = fields.getOrElse(f.name, throw ParseError(
          s"unknown field '${f.name}' on $entity — supported: " +
            fields.keys.toSeq.sorted.mkString(", ")))
        src.as(f.out)
      }
    }: _*)
  }

  /** One connection's description: the filtered+joined flat relation,
    * ascending sort keys for the deterministic row order, and the
    * per-row field resolver.
    */
  private final case class Conn(flat: DataFrame, sortKeys: Seq[Column],
                                hasRows: Boolean,
                                rowField: Field => Column)

  private def conn(kg: KnowledgeGraph, entity: String, name: String,
                   rootKey: String, selected: Set[String]): Conn = {
    // Sub-entity tables join in ONLY when the row selection actually
    // references them: Catalyst cannot drop an unused inner join on
    // FK-integrity grounds itself, and a `knownDrugs { rows { phase
    // drug {...} } }` query must not pay a targets join it never
    // reads. The edge columns (ids, score, rank, phase) are on the
    // edge relation and need no join at all. The joins are LEFT — a
    // GraphQL resolver nulls a missing sub-entity, it never drops the
    // row — so `count` and `rows` agree even if an edge references an
    // id the entity table lacks (the KG views are FK-consistent by
    // construction; this pins resolver semantics regardless).
    def tgt(df: DataFrame, on: String): DataFrame =
      if (!selected("target")) df
      else df.join(kg.targets.select(col("id").as("__t_id"),
        col("approvedSymbol").as("__t_sym"), col("bioType").as("__t_bio")),
        col(on) === col("__t_id"), "left")
    def drg(df: DataFrame, on: String): DataFrame =
      if (!selected("drug")) df
      else df.join(kg.drugDetails.select(col("id").as("__d_id"),
        col("name").as("__d_name"), col("drugType").as("__d_type"),
        col("isApproved").as("__d_appr"), col("synonyms").as("__d_syn"),
        col("maximumClinicalTrialPhase").as("__d_maxph")),
        col(on) === col("__d_id"), "left")
    def dis(df: DataFrame, on: String): DataFrame =
      if (!selected("disease")) df
      else df.join(kg.diseases.select(col("id").as("__s_id"),
        col("name").as("__s_name")), col(on) === col("__s_id"), "left")
    // a missing sub-entity resolves to a NULL object, not a struct of
    // nulls — the GraphQL null the client's .get() chains expect
    def targetField(f: Field) = when(col("__t_id").isNotNull,
      entityStruct("target", f.sel,
        Map("id" -> col("__t_id"), "approvedSymbol" -> col("__t_sym"),
          "bioType" -> col("__t_bio"))))
    def drugField(f: Field) = when(col("__d_id").isNotNull,
      entityStruct("drug", f.sel,
        Map("id" -> col("__d_id"), "name" -> col("__d_name"),
          "drugType" -> col("__d_type"), "isApproved" -> col("__d_appr"),
          "synonyms" -> col("__d_syn"),
          "maximumClinicalTrialPhase" -> col("__d_maxph"))))
    def diseaseField(f: Field) = when(col("__s_id").isNotNull,
      entityStruct("disease", f.sel,
        Map("id" -> col("__s_id"), "name" -> col("__s_name"))))
    def bad(f: Field, supported: String): Nothing = throw ParseError(
      s"unknown field '${f.name}' on $entity.$name — supported: $supported")

    (entity, name) match {
      case ("disease", "knownDrugs") =>
        Conn(drg(tgt(kg.knownDrugs.filter(col("disease_id") === rootKey),
            "target_id"), "drug_id"),
          Seq(col("drug_id"), col("target_id")), hasRows = true, {
            case Field("phase", _, Seq(), _) => col("phase")
            case f @ Field("drug", _, _, _) => drugField(f)
            case f @ Field("target", _, _, _) => targetField(f)
            case f => bad(f, "phase, drug, target")
          })
      case ("target", "knownDrugs") =>
        Conn(drg(dis(kg.knownDrugs.filter(col("target_id") === rootKey),
            "disease_id"), "drug_id"),
          Seq(col("drug_id"), col("disease_id")), hasRows = true, {
            case Field("phase", _, Seq(), _) => col("phase")
            case f @ Field("drug", _, _, _) => drugField(f)
            case f @ Field("disease", _, _, _) => diseaseField(f)
            case f => bad(f, "phase, drug, disease")
          })
      case ("disease", "associatedTargets") =>
        Conn(tgt(kg.associatedTargets.filter(col("disease_id") === rootKey),
            "target_id"),
          Seq(negate(col("score")), col("target_id")), hasRows = true, {
            case Field("score", _, Seq(), _) => col("score")
            case f @ Field("target", _, _, _) => targetField(f)
            case f => bad(f, "score, target")
          })
      case ("target", "associatedDiseases") =>
        Conn(dis(kg.associatedDiseases.filter(col("target_id") === rootKey),
            "disease_id"),
          Seq(negate(col("score")), col("disease_id")), hasRows = true, {
            case Field("score", _, Seq(), _) => col("score")
            case f @ Field("disease", _, _, _) => diseaseField(f)
            case f => bad(f, "score, disease")
          })
      case ("drug", "linkedTargets") =>
        Conn(tgt(kg.linkedTargets.filter(col("drug_id") === rootKey),
            "target_id"),
          Seq(col("rank")), hasRows = true, {
            case Field("rank", _, Seq(), _) => col("rank")
            case f @ Field("target", _, _, _) => targetField(f)
            case f => bad(f, "rank, target")
          })
      case ("target", "pathways") =>
        Conn(kg.pathways.filter(col("target_id") === rootKey),
          Seq(col("pathwayId")), hasRows = false, {
            case Field("topLevelTerm", _, Seq(), _) => col("topLevelTerm")
            case Field("pathway", _, sel, _) => entityStruct("pathway", sel,
              Map("id" -> col("pathwayId"), "name" -> col("pathway")))
            case f => bad(f, "pathway, topLevelTerm")
          })
      case ("target", "tractability") =>
        // bare [Tractability!]! (opentargets.schema:1416, 1546-1550) —
        // per-entity-bounded (4 rows), deterministic modality order
        Conn(kg.tractability.filter(col("target_id") === rootKey),
          Seq(col("modality")), hasRows = false, {
            case Field("label", _, Seq(), _) => col("label")
            case Field("modality", _, Seq(), _) => col("modality")
            case Field("value", _, Seq(), _) => col("value")
            case f => bad(f, "label, modality, value")
          })
      case ("disease", "phenotypes") =>
        // DiseaseHPOs {count, rows: [DiseaseHPO]} with the schema's
        // page: argument (opentargets.schema:224-228) — rows carry the
        // phenotypeHPO entity (:283-285, HPO :727-739)
        Conn(kg.phenotypes.filter(col("disease_id") === rootKey),
          Seq(col("hpo_id")), hasRows = true, {
            case f @ Field("phenotypeHPO", _, _, _) =>
              entityStruct("phenotypeHPO", f.sel,
                Map("id" -> col("hpo_id"), "name" -> col("hpo_name"),
                  "description" -> col("hpo_desc"),
                  "namespace" -> col("namespace")))
            case f => bad(f, "phenotypeHPO")
          })
      case _ => throw ParseError(
        s"unknown field '$name' on $entity — connections: " +
          "disease.{knownDrugs,associatedTargets,phenotypes,evidences}, " +
          "target.{knownDrugs,associatedDiseases,pathways,tractability," +
          "similarEntities}, drug.{linkedTargets,mechanismsOfAction}")
    }
  }

  /** `drug.mechanismsOfAction` — the one connection whose rows carry
    * a LIST of sub-entities (`targets: [Target!]!`,
    * opentargets.schema:997-1011; the
    * opentargets_query_targets_for_drug.py:4-21 query). Rows are
    * GROUPS of the flat (drug, mechanism, target) edge relation: one
    * aggregation keyed on the mechanism folds each group's targets
    * into a sorted array INSIDE the row struct, a second collects the
    * row structs — both shuffles bounded by the root drug's edge
    * count, never the corpus.
    */
  private def mechanismsConnection(kg: KnowledgeGraph, f: Field,
                                   rootKey: String): DataFrame = {
    if (f.args.nonEmpty) throw ParseError(
      s"unknown argument${if (f.args.size > 1) "s" else ""} " +
        s"${f.args.keys.toSeq.sorted.mkString(", ")} on " +
        "drug.mechanismsOfAction — it takes no arguments")
    // every aliased `rows` selection, each with its OWN row/targets
    // sub-selection (response key -> row fields) — per-alias payloads,
    // the connection-rows discipline (first-wins would silently hand
    // a second alias the first alias's columns)
    val rowsSels: Seq[(String, Seq[Field])] = f.sel.collect {
      case g @ Field("rows", _, sel, _) => g.out -> sel
    }
    rowsSels.foreach { case (_, sel) =>
      if (sel.isEmpty) throw ParseError(
        "'drug.mechanismsOfAction' rows need a selection")
      sel.find(h => h.name == "targets" && h.sel.isEmpty).foreach { _ =>
        throw ParseError(
          "'drug.mechanismsOfAction' targets need a selection of target fields")
      }
    }
    val outToIdx: Map[String, Int] =
      rowsSels.map(_._1).zipWithIndex.toMap
    val base = kg.mechanismRows.filter(col("drug_id") === rootKey)
    // the targets join pays only when some alias reads a non-id
    // target field (id is already on the edge relation) or
    // uniqueTargetTypes needs the bioType facet; LEFT for resolver
    // semantics, same as the flat connections
    val needTypes = f.sel.exists(_.name == "uniqueTargetTypes")
    val joined = needTypes || rowsSels.exists(_._2.exists(h =>
      h.name == "targets" && h.sel.exists(_.name != "id")))
    val flat =
      if (!joined) base
      else base.join(kg.targets.select(col("id").as("__t_id"),
        col("approvedSymbol").as("__t_sym"), col("bioType").as("__t_bio")),
        col("target_id") === col("__t_id"), "left")
    // joined path: a target id the entity table lacks resolves to a
    // NULL object (same contract as the flat connections' sub-entity
    // fields); an id-only selection reads the edge column, which is
    // non-null by construction (even when ANOTHER alias forced the
    // join — the null guard applies only where the entity table is
    // actually read)
    def targetPayload(targetsSel: Seq[Field]): Column = {
      def ts = entityStruct("target", targetsSel,
        Map("id" -> col("target_id"), "approvedSymbol" -> col("__t_sym"),
          "bioType" -> col("__t_bio")))
      if (targetsSel.exists(_.name != "id"))
        when(col("__t_id").isNotNull, ts)
      else ts
    }
    // level 1: one sorted targets array PER rows alias that reads
    // targets (each alias may select different target fields), plus
    // the group's bioType set when uniqueTargetTypes reads it
    val targetArrays: Seq[Column] = rowsSels.zipWithIndex.flatMap {
      case ((_, sel), i) =>
        sel.find(_.name == "targets").map(_.sel).filter(_.nonEmpty).map {
          ts =>
            transform(sort_array(collect_list(struct(
              col("target_id").as("__k0"), targetPayload(ts).as("__p")))),
              x => x.getField("__p")).as(s"__targets_$i")
        }
    }
    val lvl1 = targetArrays ++
      (if (needTypes) Seq(collect_set(col("__t_bio")).as("__ttypes"))
       else Nil)
    // groups still need folding when nothing reads targets/types
    val lvl1Full =
      if (lvl1.nonEmpty) lvl1 else Seq(count(lit(1)).as("__gn"))
    val grouped = flat.groupBy(col("mechanismOfAction"), col("actionType"))
      .agg(lvl1Full.head, lvl1Full.tail: _*)
    def rowPayload(out: String, rowsSel: Seq[Field]): Column =
      struct(rowsSel.map {
        case g @ Field("mechanismOfAction", _, Seq(), _) =>
          col("mechanismOfAction").as(g.out)
        case g @ Field("actionType", _, Seq(), _) =>
          col("actionType").as(g.out)
        case g @ Field("targets", _, _, _) =>
          col(s"__targets_${outToIdx(out)}").as(g.out)
        case g @ Field("__typename", _, _, _) =>
          noSubSel(g); lit("MechanismOfActionRow").as(g.out)
        case g => throw ParseError(
          s"unknown field '${g.name}' on drug.mechanismsOfAction rows — " +
            "supported: mechanismOfAction, actionType, targets")
      }: _*)
    // level 2: collect the row structs, deterministically ordered by
    // the mechanism label (unique per group — actionType is a
    // function of it); one fold per rows alias, named by its out
    val parts0 = f.sel.filterNot(_.name == "__typename").map {
      case g @ Field("rows", _, sel, _) =>
        transform(sort_array(collect_list(struct(
          col("mechanismOfAction").as("__k0"),
          rowPayload(g.out, sel).as("__p")))),
          x => x.getField("__p")).as(g.out)
      case g @ Field("uniqueActionTypes", _, Seq(), _) =>
        sort_array(collect_set(col("actionType"))).as(g.out)
      case g @ Field("uniqueTargetTypes", _, Seq(), _) =>
        sort_array(array_distinct(flatten(collect_list(col("__ttypes")))))
          .as(g.out)
      case g => throw ParseError(
        s"unknown field '${g.name}' on drug.mechanismsOfAction — " +
          "supported: rows, uniqueActionTypes, uniqueTargetTypes")
    }
    f.sel.find(_.name == "__typename").foreach(noSubSel)
    if (f.sel.isEmpty) throw ParseError(
      "'drug.mechanismsOfAction' needs a selection")
    // a __typename-only selection still needs one aggregate to fold
    // the grouped relation to a single row
    val parts = if (parts0.nonEmpty) parts0 else Seq(count(lit(1)).as("__n"))
    grouped.agg(parts.head, parts.tail: _*)
      .select(struct(f.sel.map { g =>
        (if (g.name == "__typename") lit("MechanismsOfAction")
         else col(g.out)).as(g.out)
      }: _*).as(f.out))
  }

  /** `disease.evidences(ensemblIds:, size:)` — the Evidences
    * connection (opentargets.schema:230-240; row type Evidence
    * :505-509's consumed core: id, score, target, disease; wrapper
    * Evidences :682-686). `ensemblIds` is the schema's REQUIRED
    * batch filter: the request names its targets, so the engine
    * probes the persisted association index with ONE isin-pruned
    * scan (the S4 batch-lookup plan), never a per-id loop. `size`
    * rank-limits the rows (score desc, id asc —
    * TakeOrderedAndProject); `count` is the filtered connection
    * total. Cursor paging is not served — `size` covers the
    * schema's consumption here, and an unknown argument errors
    * loudly rather than silently serving an uncursored page.
    */
  private def evidencesConnection(kg: KnowledgeGraph, f: Field,
                                  rootKey: String): DataFrame = {
    val extra = f.args.keySet -- Set("ensemblIds", "size")
    if (extra.nonEmpty) throw ParseError(
      s"unknown argument${if (extra.size > 1) "s" else ""} " +
        s"${extra.toSeq.sorted.mkString(", ")} on disease.evidences — " +
        "supported: ensemblIds, size")
    val rawArg = f.args.getOrElse("ensemblIds", throw ParseError(
      "disease.evidences requires the ensemblIds argument " +
        "(opentargets.schema:230-240)"))
    // empty-entry before empty-list, the goTerms/mapIds discipline
    val rawAll = splitList(rawArg)
    if (rawAll.size > 1 && rawAll.exists(_.isEmpty))
      throw ParseError("ensemblIds must not contain empty strings")
    val ids = rawAll.filter(_.nonEmpty)
    if (ids.isEmpty) throw ParseError("ensemblIds must not be empty")
    val dup = ids.groupBy(identity).collect { case (t, ts) if ts.size > 1 => t }
    if (dup.nonEmpty) throw ParseError(
      s"duplicate ensemblIds: ${dup.toSeq.sorted.mkString(", ")}")
    if (ids.size > MaxMapTerms) throw ParseError(
      s"disease.evidences serves at most $MaxMapTerms ensemblIds per " +
        s"request, got ${ids.size} — join against an id relation for " +
        "batch retrieval")
    if (f.sel.isEmpty) throw ParseError(
      "'disease.evidences' needs a selection (count and/or rows)")
    f.sel.foreach {
      case Field("count", _, Seq(), _) => ()
      case Field("rows", _, _, _) => ()
      case g @ Field("__typename", _, _, _) => noSubSel(g)
      case g => throw ParseError(
        s"unknown field '${g.name}' on disease.evidences — " +
          "supported: count, rows")
    }
    val size = intArg(f.args, "size").map(math.min(_, MaxPageSize))
      .getOrElse(DefaultPageSize)
    val flat0 = kg.evidenceRows.filter(col("disease_id") === rootKey &&
      col("target_id").isin(ids: _*))
    val sortKeys = Seq(negate(col("score")), col("id"))
    // one aggregate per aliased rows selection, each with its OWN
    // selection-driven sub-entity joins (the connectionDf discipline)
    def rowsDfFor(sel: Seq[Field], out: String): DataFrame = {
      if (sel.isEmpty) throw ParseError(
        "'disease.evidences' rows need a selection")
      val names = sel.map(_.name).toSet
      var rel = flat0
      if (names("target"))
        rel = rel.join(kg.targets.select(col("id").as("__t_id"),
          col("approvedSymbol").as("__t_sym"), col("bioType").as("__t_bio")),
          col("target_id") === col("__t_id"), "left")
      if (names("disease"))
        rel = rel.join(kg.diseases.select(col("id").as("__s_id"),
          col("name").as("__s_name")),
          col("disease_id") === col("__s_id"), "left")
      val payload = struct(sel.map { g =>
        (g.name match {
          case "__typename" => noSubSel(g); lit("Evidence")
          case "id" | "score" =>
            if (g.sel.nonEmpty) throw ParseError(
              s"'evidences rows.${g.name}' is a scalar — drop its selection")
            col(g.name)
          case "target" => when(col("__t_id").isNotNull,
            entityStruct("target", g.sel,
              Map("id" -> col("__t_id"), "approvedSymbol" -> col("__t_sym"),
                "bioType" -> col("__t_bio"))))
          case "disease" => when(col("__s_id").isNotNull,
            entityStruct("disease", g.sel,
              Map("id" -> col("__s_id"), "name" -> col("__s_name"))))
          case other => throw ParseError(
            s"unknown field '$other' on evidences rows — supported: " +
              "id, score, target, disease")
        }).as(g.out)
      }: _*)
      val keyed = struct(sortKeys.zipWithIndex.map {
        case (k, i) => k.as(s"__k$i") } :+ payload.as("__p"): _*)
      rel.sort(sortKeys: _*).limit(size)
        .agg(transform(sort_array(collect_list(keyed)),
          x => x.getField("__p")).as(out))
    }
    val countDf: Option[DataFrame] =
      if (!f.sel.exists(_.name == "count")) None
      else Some(flat0.agg(count(lit(1)).as("count")))
    val rowsDfs = f.sel.collect {
      case g @ Field("rows", _, sel, _) => rowsDfFor(sel, g.out)
    }
    val sides = countDf.toSeq ++ rowsDfs
    val combined =
      if (sides.isEmpty) flat0.sparkSession.range(1).toDF()
      else sides.reduce((a, b) => a.crossJoin(broadcast(b)))
    combined.select(struct(f.sel.map { g =>
      (if (g.name == "__typename") lit("Evidences")
       else if (g.name == "count") col("count")
       else col(g.out)).as(g.out)
    }: _*).as(f.out))
  }

  /** `target.similarEntities(threshold:, size:, entityNames:)` — the
    * schema's model-based similarity field (opentargets.schema
    * :1422-1431; row type Similarity :1338-1345) served by the
    * engine's OWN vector tier: the root target's sidecar vector
    * ([[KnowledgeGraph.entityEmbeddings]], TGT_k ↔ vec_id k) probes
    * the corpus with the exact brute cosine top-k
    * ([[graft.operators.Similarity.bruteTopK]] — one corpus scan,
    * per-partition rank-limit; the IVF/SQ8 tiers are this engine's
    * indexed scale path for the same probe shape). `threshold`
    * filters on the ROUNDED ranking score — a monotone prefix of the
    * rank order, so filtering the top-k equals rank-limiting the
    * filtered corpus. `size` caps rows ([[MaxPageSize]] clamp,
    * [[DefaultPageSize]] default — never an unbounded list).
    * `entityNames`, when given, must name this dialect's served
    * similarity space ("target"). A hit's `object` resolves through
    * the union machinery (`... on Target` arms; a vector with no
    * entity row serves GraphQL null — the resolver-null discipline).
    * A root WITHOUT a sidecar vector serves the empty list: vector
    * absence is data, not a malformed request (the schema's
    * `[Similarity!]!` admits no null list). The one driver-side
    * value is the root's own query vector — parameter-sized, the
    * documented collect every vector-serving query performs.
    */
  private def similarEntitiesConnection(kg: KnowledgeGraph, f: Field,
                                        rootKey: String): DataFrame = {
    val extra = f.args.keySet -- Set("threshold", "size", "entityNames")
    if (extra.nonEmpty) throw ParseError(
      s"unknown argument${if (extra.size > 1) "s" else ""} " +
        s"${extra.toSeq.sorted.mkString(", ")} on target.similarEntities " +
        "— supported: threshold, size, entityNames")
    f.args.get("entityNames").foreach { raw =>
      val names = splitList(raw).filter(_.nonEmpty)
      if (names != Seq("target")) throw ParseError(
        "target.similarEntities serves the target similarity space — " +
          s"""entityNames must be ["target"], got [${names.mkString(", ")}]""")
    }
    val threshold: Option[Double] = f.args.get("threshold").map { s =>
      val v = s.toDoubleOption.getOrElse(throw ParseError(
        s"threshold must be a number, got '$s'"))
      if (v < 0.0 || v > 1.0) throw ParseError(
        s"threshold must be in [0, 1], got $v")
      v
    }
    val size = intArg(f.args, "size").map(math.min(_, MaxPageSize))
      .getOrElse(DefaultPageSize)
    if (f.sel.isEmpty) throw ParseError(
      "'target.similarEntities' needs a selection")
    val pk = rootKey.stripPrefix("TGT_").toLongOption.getOrElse(
      throw ParseError("target.similarEntities needs a TGT_<n> root id, " +
        s"got '$rootKey'"))
    val emb = kg.entityEmbeddings
    val qVec: Option[Array[Float]] = emb.filter(col("vec_id") === pk)
      .select(col("embedding")).collect().headOption
      .map(_.getSeq[Float](0).toArray)
    val base: DataFrame = qVec match {
      case Some(q) =>
        val topk = graft.operators.Similarity.bruteTopK(
          emb, "vec_id", "embedding", q, size, excludeId = pk)
        threshold.fold(topk)(t => topk.filter(col("cosine") >= t))
      case None =>
        emb.filter(lit(false)).select(col("vec_id"),
          lit(0.0).as("cosine"))
    }
    val needObject = f.sel.exists(_.name == "object")
    val withId = base.select(col("vec_id"),
      concat(lit("TGT_"), col("vec_id")).as("__sim_id"), col("cosine"))
    // objectField's union resolver reads the widenedSearchRel column
    // layout (id/name/entity + facet columns) — shape the resolution
    // join to it; every non-target arm then resolves NULL through the
    // entity guard, and the Drug facet columns are typed nulls
    val rel =
      if (!needObject) withId
      else withId.join(kg.targets.select(col("id"),
          col("approvedSymbol").as("name"), col("bioType").as("__bio")),
          col("__sim_id") === col("id"), "left")
        .withColumn("entity", when(col("id").isNotNull, lit("target")))
        .withColumn("__syn", lit(null).cast("array<string>"))
        .withColumn("__dtype", lit(null).cast("string"))
        .withColumn("__appr", lit(null).cast("boolean"))
        .withColumn("__maxph", lit(null).cast("double"))
    val payload = struct(f.sel.map { g =>
      (g.name match {
        case "__typename" => noSubSel(g); lit("Similarity")
        case "id" | "category" | "score" =>
          if (g.sel.nonEmpty) throw ParseError(
            s"'similarEntities.${g.name}' is a scalar — drop its selection")
          g.name match {
            case "id" => col("__sim_id")
            case "category" => lit("target")
            case _ => col("cosine")
          }
        case "object" =>
          if (g.sel.isEmpty) throw ParseError(
            "'object' is a union — select '__typename' and/or " +
              "inline-fragment arms ('... on Target')")
          when(col("id").isNotNull, objectField(g))
        case other => throw ParseError(
          s"unknown field '$other' on similarEntities — supported: " +
            "id, category, score, object")
      }).as(g.out)
    }: _*)
    // numeric-id sort keys end-to-end: the fold re-sorts on the SAME
    // (rounded-cosine, vec_id) order bruteTopK ranked with, so a
    // rounded-cosine tie cannot reorder between the cut and the fold
    val keyed = struct(negate(col("cosine")).as("__k0"),
      col("vec_id").as("__k1"), payload.as("__p"))
    rel.agg(transform(sort_array(collect_list(keyed)),
      x => x.getField("__p")).as(f.out))
  }

  /** Connections that declare `page: Pagination` in the reference
    * schema: knownDrugs (opentargets.schema:243-246, 429-432,
    * 1475-1478), disease.associatedTargets (:248-268) and
    * target.associatedDiseases (:1480-1483). The other connections —
    * linkedTargets (:447), mechanismsOfAction (:423), pathways
    * (:1202) — are bare (per-entity-bounded) lists there and take no
    * pagination arguments.
    */
  private val Paginable: Set[(String, String)] = Set(
    ("disease", "knownDrugs"), ("target", "knownDrugs"),
    ("disease", "associatedTargets"), ("target", "associatedDiseases"),
    ("disease", "phenotypes"))

  /** Server-parity default page size for [[Paginable]] connections:
    * the endpoint never returns an unbounded connection — an omitted
    * `page` serves the FIRST page while `count` stays the connection
    * total. Doubles as the engine's scale guard: a hub entity's
    * crawl-sized edge list is never collected into one aggregation
    * buffer by an unpaginated query.
    */
  val DefaultPageSize: Int = 25

  /** Clamp for an explicit `size` — the engine-side cap that keeps a
    * single requested page (and its aggregation buffer) bounded.
    */
  val MaxPageSize: Int = 3000

  private def intArg(args: Map[String, String], key: String): Option[Int] =
    args.get(key).map { s =>
      val n = s.toIntOption.getOrElse(
        throw ParseError(s"$key must be an integer, got '$s'"))
      if (n < 0) throw ParseError(s"$key must be >= 0, got $n")
      n
    }

  /** Build the connection's single-row (one column) relation. */
  private def connectionDf(kg: KnowledgeGraph, entity: String, f: Field,
                           rootKey: String): DataFrame = {
    if (entity == "drug" && f.name == "mechanismsOfAction")
      return mechanismsConnection(kg, f, rootKey)
    if (entity == "disease" && f.name == "evidences")
      return evidencesConnection(kg, f, rootKey)
    if (entity == "target" && f.name == "similarEntities")
      return similarEntitiesConnection(kg, f, rootKey)
    // field names the row selections reference, for selection-driven
    // sub-entity joins: rows-wrapped connections read the UNION of
    // every aliased `rows` selection (count-only queries join
    // nothing), pathways its own
    val allRowsSels = f.sel.filter(_.name == "rows")
    val rowNames =
      (if (allRowsSels.nonEmpty) allRowsSels.flatMap(_.sel.map(_.name))
       else f.sel.map(_.name)).toSet
    val c0 = conn(kg, entity, f.name, rootKey, rowNames)
    // engine-side score-argument pushdown for the association
    // connections — arguments the reference schema declares
    // (opentargets.schema:263-265 orderByScore; scoreThreshold as on
    // :1459-1461) but its own client never pushes down
    // (candidate_drugs.py:98-109 filters client-side AFTER paying the
    // full fetch): `scoreThreshold` filters the edge relation BEFORE
    // the rank-limited collect (the pagination discipline — and
    // before `count`, which is therefore the FILTERED connection
    // total), and `orderByScore: "asc" | "desc"` flips the rank
    // order (desc is the server default).
    val ScoreArgConns: Set[(String, String)] = Set(
      ("disease", "associatedTargets"), ("target", "associatedDiseases"))
    val thresholdArg: Option[Double] = f.args.get("scoreThreshold").map { s =>
      val v = s.toDoubleOption.getOrElse(throw ParseError(
        s"scoreThreshold must be a number, got '$s'"))
      if (v < 0.0 || v > 1.0) throw ParseError(
        s"scoreThreshold must be in [0, 1], got $v")
      v
    }
    val orderArg: Option[String] = f.args.get("orderByScore").map {
      case o @ ("asc" | "desc") => o
      case o => throw ParseError(
        s"""orderByScore must be "asc" or "desc", got '$o'""")
    }
    if ((thresholdArg.nonEmpty || orderArg.nonEmpty) &&
        !ScoreArgConns((entity, f.name))) throw ParseError(
      s"'$entity.${f.name}' takes no score arguments — scoreThreshold " +
        "and orderByScore apply to associatedTargets and associatedDiseases")
    val c = {
      val c1 = thresholdArg.fold(c0)(t =>
        c0.copy(flat = c0.flat.filter(col("score") >= t)))
      orderArg match {
        case Some("asc") => c1.copy(
          sortKeys = Seq(col("score"), c1.sortKeys.last))
        case _ => c1
      }
    }
    // the schema's pagination argument — `page: {index, size}`
    // (opentargets.schema:1047-1050, index = 0-based page number) or
    // the bare `size` shorthand; only [[Paginable]] connections take
    // it (schema parity), and there an omitted page means the
    // DEFAULT-sized first page, never the whole connection.
    // `count` stays the TOTAL (server semantics), never the page's.
    def intArg(key: String): Option[Int] = GraphQl.intArg(f.args, key)
    val explicitSize: Option[Int] = intArg("page.size").orElse(intArg("size"))
    if (!Paginable((entity, f.name))) {
      val extras = Seq("page.index", "page.size", "size").filter(f.args.contains)
      if (extras.nonEmpty) throw ParseError(
        s"'$entity.${f.name}' takes no pagination arguments " +
          s"(got ${extras.mkString(", ")}) — only knownDrugs, " +
          "associatedTargets, associatedDiseases and phenotypes " +
          "are paginated")
    }
    // schema parity on the ARGUMENT LIST, after the targeted
    // misplaced-score/pagination guards above have had their say: an
    // unknown (or typo'd) argument is a loud error — `scoreThreshhold:`
    // silently serving the unfiltered connection is the quiet failure
    // the parser's undeclared-binding check exists to prevent
    locally {
      val allowed =
        (if (Paginable((entity, f.name)))
           Set("page.index", "page.size", "size") else Set.empty[String]) ++
        (if (ScoreArgConns((entity, f.name)))
           Set("scoreThreshold", "orderByScore") else Set.empty[String]) ++
        Set("scoreThreshold", "orderByScore", "page.index", "page.size",
          "size").filter(f.args.contains)
      // (the filter keeps misplaced-but-well-known keys out of THIS
      // error — the dedicated guards above already rejected them with
      // the more instructive message)
      val unknown = f.args.keySet.diff(allowed)
      if (unknown.nonEmpty) throw ParseError(
        s"unknown argument${if (unknown.size > 1) "s" else ""} " +
          s"${unknown.toSeq.sorted.mkString(", ")} on $entity.${f.name}" +
          (if (allowed.isEmpty) " — it takes no arguments"
           else s" — supported: ${allowed.toSeq.sorted.mkString(", ")}"))
    }
    val index: Int = intArg("page.index").getOrElse(0)
    if (index > 0 && explicitSize.isEmpty) throw ParseError(
      "page.index needs page.size")
    val size: Option[Int] =
      if (!Paginable((entity, f.name))) None
      else explicitSize.map(math.min(_, MaxPageSize))
        .orElse(Some(DefaultPageSize))
    val (connType, rowType) = ConnTypes.getOrElse((entity, f.name), ("", ""))
    def rowsArray(sel: Seq[Field]): Column = {
      if (sel.isEmpty) throw ParseError(
        s"'$entity.${f.name}' rows need a selection")
      val payload = struct(sel.map { g =>
        (if (g.name == "__typename") { noSubSel(g); lit(rowType) }
         else c.rowField(g)).as(g.out)
      }: _*)
      // sort keys ride in front of the payload for sort_array, then
      // drop away — deterministic order with one aggregation
      val keyed = struct(c.sortKeys.zipWithIndex.map {
        case (k, i) => k.as(s"__k$i") } :+ payload.as("__p"): _*)
      val sorted = sort_array(collect_list(keyed))
      // Long math then a clamp: index*n+1 can overflow Int, and a
      // negative start would make slice() count from the END of the
      // array — returning the wrong rows instead of the correct
      // empty page. Spark arrays hold < Int.MaxValue elements, so a
      // clamped start is always past the end.
      val page = size.fold(sorted) { n =>
        val start = math.min(index.toLong * n + 1L, Int.MaxValue.toLong).toInt
        slice(sorted, start, n)
      }
      transform(page, x => x.getField("__p"))
    }
    /** Rows aggregate over the rank-LIMITED relation when a page size
      * is in play: sort on the connection's keys + limit
      * (index+1)·size plans as TakeOrderedAndProject — per-partition
      * top-k, then a merge of only k·partitions rows — so a hub key's
      * edge list never lands in one reducer's collect_list buffer.
      * The collect+sort_array+slice inside [[rowsArray]] then works
      * on at most (index+1)·size rows.
      */
    def rowsDfFor(sel: Seq[Field], out: String): DataFrame = {
      val src = size.fold(c.flat) { n =>
        val limitN = math.min((index + 1).toLong * n, Int.MaxValue.toLong).toInt
        c.flat.sort(c.sortKeys: _*).limit(limitN)
      }
      src.agg(rowsArray(sel).as(out))
    }
    if (c.hasRows) {
      f.sel.foreach {
        case Field("count", _, Seq(), _) => ()
        case Field("rows", _, _, _) => ()
        case g @ Field("__typename", _, _, _) => noSubSel(g)
        case g => throw ParseError(
          s"unknown field '${g.name}' on $entity.${f.name} — supported: count, rows")
      }
      if (f.sel.isEmpty) throw ParseError(
        s"'$entity.${f.name}' needs a selection (count and/or rows)")
      // `count` aggregates the UNlimited edge relation (it is the
      // connection TOTAL), built join-free — the sub-entity joins
      // only serve row fields, and Catalyst cannot drop them itself
      val countDf: Option[DataFrame] =
        if (!f.sel.exists(_.name == "count")) None
        else {
          val base = conn(kg, entity, f.name, rootKey, Set.empty).flat
          Some(thresholdArg.fold(base)(t => base.filter(col("score") >= t))
            .agg(count(lit(1)).as("count")))
        }
      // ONE aggregate per aliased `rows` selection, each named by its
      // response key — `a: rows { phase } b: rows { drug { id } }`
      // serves each alias ITS OWN payload (the noDuplicates check
      // guarantees distinct outs; first-wins here would silently hand
      // b alias a's columns)
      val rowsDfs: Seq[DataFrame] = f.sel.collect {
        case g @ Field("rows", _, sel, _) => rowsDfFor(sel, g.out)
      }
      // all sides are 1-row relations; the cross joins are broadcasts
      val sides = countDf.toSeq ++ rowsDfs
      val combined =
        if (sides.isEmpty)
          // a __typename-only selection: nothing to aggregate, one
          // constant row
          c.flat.sparkSession.range(1).toDF()
        else sides.reduce((a, b) => a.crossJoin(broadcast(b)))
      combined.select(struct(f.sel.map { g =>
        (if (g.name == "__typename") lit(connType)
         else if (g.name == "count") col("count")
         else col(g.out)).as(g.out)
      }: _*).as(f.out))
    } else
      c.flat.agg(rowsArray(f.sel).as(f.out))
  }

  /** The `search(queryString:, entityNames:, page:)` root
    * (/root/reference/opentargets_query.py:7-13; the page argument is
    * opentargets.schema:1151-1159): case-insensitive substring match
    * over the selected entity tables' display names, hits
    * deterministically ordered (name, id) — the engine-side stand-in
    * for the server's relevance order. The substring scan is the
    * server's own semantics; `operators.InvertedIndex` is this
    * engine's indexed scale path for the same need.
    *
    * With `page`/`size` present, hits are rank-limited BEFORE the
    * array fold (sort+limit → TakeOrderedAndProject, the connection
    * discipline) and `total` stays the full match count. The
    * unpaginated form returns every hit — the match set is bounded by
    * the entity DIMENSION tables (not fact-scale), and the reference
    * scripts consume `hits[0]` from exactly this shape.
    */
  /** The hit payload of the `search` root: scalar hit fields plus
    * the union-typed `object` field (the hit AS its full entity —
    * `SearchResult.object: EntityUnionType`,
    * opentargets.schema:502,1290), selected through inline-fragment
    * arms. Per SURVEY §1.2's union encoding (Spark has no native
    * union type), `object` resolves to a struct of the union TAG
    * (`__typename`, discriminating on the hit's entity kind) plus
    * one NULLABLE struct per selected arm, non-null only on rows of
    * that type — the shape an Apollo-generated client's
    * `...on`-switch reads directly.
    */
  /** Loud rejection of arguments on a field that takes none — the
    * argument-list strictness the connection sites already enforce,
    * applied to the search-family sub-fields (a typo'd `hits(size:)`
    * silently ignored would be the quiet failure this dialect never
    * allows).
    */
  private def noArgs(f: Field, where: String): Field = {
    if (f.args.nonEmpty) throw ParseError(
      s"'$where.${f.name}' takes no arguments, got " +
        f.args.keys.toSeq.sorted.mkString(", "))
    f
  }

  /** `where` names the root whose hits these are ("search hits",
    * "mapIds mapping hits") — the noArgs pattern, so a mapIds user's
    * empty-selection error does not point at the search root.
    */
  private def hitStruct(sel: Seq[Field], where: String): Column = {
    if (sel.isEmpty) throw ParseError(s"$where need a selection")
    struct(sel.map { f =>
      (f.name match {
        case "__typename" => noSubSel(f); lit("SearchResult")
        case "object" => objectField(f)
        case "id" | "name" | "entity" =>
          if (f.sel.nonEmpty) throw ParseError(
            s"'hit.${f.name}' is a scalar — drop its selection")
          col(f.name)
        case other => throw ParseError(
          s"unknown field '$other' on $where — supported: " +
            "id, name, entity, object")
      }).as(f.out)
    }: _*)
  }

  private def objectField(f: Field): Column = {
    if (f.args.nonEmpty) throw ParseError("'object' takes no arguments")
    if (f.sel.isEmpty) throw ParseError(
      "'object' is a union — select '__typename' and/or inline-fragment " +
        "arms ('... on Target | Drug | Disease')")
    struct(f.sel.map { g =>
      (if (g.name == "__typename") {
        noSubSel(g)
        when(col("entity") === "disease", lit("Disease"))
          .when(col("entity") === "target", lit("Target"))
          .otherwise(lit("Drug"))
      } else if (g.name.startsWith(InlineMark)) {
        val tpe = g.name.stripPrefix(InlineMark)
        val (key, fields) = tpe match {
          case "Disease" => ("disease",
            Map("id" -> col("id"), "name" -> col("name")))
          case "Target" => ("target",
            Map("id" -> col("id"), "approvedSymbol" -> col("name"),
              "bioType" -> col("__bio")))
          case "Drug" => ("drug",
            Map("id" -> col("id"), "name" -> col("name"),
              "synonyms" -> col("__syn"), "drugType" -> col("__dtype"),
              "isApproved" -> col("__appr"),
              "maximumClinicalTrialPhase" -> col("__maxph")))
          case other => throw ParseError(
            s"unknown type condition '... on $other' — EntityUnionType " +
              "covers Target, Drug and Disease (opentargets.schema:502)")
        }
        when(col("entity") === key, entityStruct(key, g.sel, fields))
      } else throw ParseError(
        "'object' is a union — its members' fields are selected via " +
          "inline-fragment arms ('... on Drug { ... }') or " +
          s"'__typename', got '${g.name}'")
      ).as(g.out)
    }: _*)
  }

  /** The search hit relation (id, name, entity) over the selected
    * entity tables, WIDENED selection-driven for the union `object`
    * field: the scan pays for an arm's entity columns only when some
    * hits alias actually selects them (bioType is one dimension
    * column; the Drug facet block imports drugDetails' edge rollup,
    * so it joins in only when an arm reads past id/name). Shared by
    * the search and mapIds roots.
    */
  private def widenedSearchRel(kg: KnowledgeGraph, entities: Seq[String],
                               objSels: Seq[Field]): DataFrame = {
    def armFields(tpe: String): Set[String] = objSels.flatMap(_.sel)
      .filter(_.name == InlineMark + tpe).flatMap(_.sel.map(_.name)).toSet
    val needBio = armFields("Target")("bioType")
    val needDrugDetails =
      (armFields("Drug") -- Set("id", "name", "__typename")).nonEmpty
    val nullDetails = Seq(
      lit(null).cast("array<string>").as("__syn"),
      lit(null).cast("string").as("__dtype"),
      lit(null).cast("boolean").as("__appr"),
      lit(null).cast("double").as("__maxph"))
    def extras(bio: Option[Column], details: Option[Seq[Column]]): Seq[Column] =
      (if (needBio)
         Seq(bio.getOrElse(lit(null).cast("string")).as("__bio")) else Nil) ++
      (if (needDrugDetails) details.getOrElse(nullDetails) else Nil)
    entities.map {
      case "disease" => kg.diseases
        .select(Seq(col("id"), col("name"), lit("disease").as("entity")) ++
          extras(None, None): _*)
      case "target" => kg.targets
        .select(Seq(col("id"), col("approvedSymbol").as("name"),
          lit("target").as("entity")) ++
          extras(Some(col("bioType")), None): _*)
      case "drug" =>
        val src = if (needDrugDetails) kg.drugDetails else kg.drugs
        src.select(Seq(col("id"), col("name"), lit("drug").as("entity")) ++
          extras(None, Some(Seq(col("synonyms").as("__syn"),
            col("drugType").as("__dtype"), col("isApproved").as("__appr"),
            col("maximumClinicalTrialPhase").as("__maxph")))): _*)
      case other => throw ParseError(
        s"unknown entity '$other' in entityNames — supported: disease, target, drug")
    }.reduce(_.unionByName(_))
  }

  /** The `aggregations` field of SearchResults / MappingResults
    * (`SearchResultAggs`, opentargets.schema:1304-1312): total + one
    * aggregate per entity kind with nested per-category counts. This
    * dialect's category taxonomy is the entity kind (the facets
    * convention — the engine's entities carry no finer category
    * dimension), so each entity aggregate carries exactly one
    * category: itself. One keyed agg over the match relation, folded
    * to a 1-row struct column named by the field's response key.
    */
  private def aggregationsDf(rel: DataFrame, f: Field): DataFrame = {
    if (f.args.nonEmpty) throw ParseError("'aggregations' takes no arguments")
    if (f.sel.isEmpty) throw ParseError(
      "'aggregations' needs a selection — total and/or entities")
    def catStruct(sel: Seq[Field]): Column = {
      if (sel.isEmpty) throw ParseError(
        "'aggregations' categories need a selection")
      struct(sel.map { c =>
        (c.name match {
          case "__typename" => noSubSel(c); lit("SearchResultAggCategory")
          case "name" | "total" =>
            if (c.sel.nonEmpty) throw ParseError(
              s"'aggregations categories.${c.name}' is a scalar — drop its selection")
            if (c.name == "name") col("entity") else col("__n")
          case other => throw ParseError(
            s"unknown field '$other' on aggregations categories — " +
              "supported: name, total")
        }).as(c.out)
      }: _*)
    }
    def entStruct(sel: Seq[Field]): Column = {
      if (sel.isEmpty) throw ParseError(
        "'aggregations' entities need a selection")
      struct(sel.map { e =>
        (e.name match {
          case "__typename" => noSubSel(e); lit("SearchResultAggEntity")
          case "name" =>
            if (e.sel.nonEmpty) throw ParseError(
              "'aggregations entities.name' is a scalar — drop its selection")
            col("entity")
          case "total" =>
            if (e.sel.nonEmpty) throw ParseError(
              "'aggregations entities.total' is a scalar — drop its selection")
            col("__n")
          case "categories" => array(catStruct(e.sel))
          case other => throw ParseError(
            s"unknown field '$other' on aggregations entities — " +
              "supported: name, total, categories")
        }).as(e.out)
      }: _*)
    }
    val grouped = rel.groupBy(col("entity")).agg(count(lit(1)).as("__n"))
    val parts0 = f.sel.filterNot(_.name == "__typename").map {
      case g @ Field("total", _, Seq(), _) => sum(col("__n")).as(g.out)
      case g @ Field("entities", _, sel, _) =>
        transform(sort_array(collect_list(struct(
          col("entity").as("__k0"), entStruct(sel).as("__p")))),
          x => x.getField("__p")).as(g.out)
      case g => throw ParseError(
        s"unknown field '${g.name}' on aggregations — supported: " +
          "total, entities")
    }
    f.sel.find(_.name == "__typename").foreach(noSubSel)
    val parts = if (parts0.nonEmpty) parts0 else Seq(count(lit(1)).as("__c"))
    grouped.agg(parts.head, parts.tail: _*)
      .select(struct(f.sel.map { g =>
        (if (g.name == "__typename") lit("SearchResultAggs")
         else if (g.name == "total") coalesce(col(g.out), lit(0L))
         else col(g.out)).as(g.out)
      }: _*).as(f.out))
  }

  private def executeSearch(kg: KnowledgeGraph, root: Field): DataFrame = {
    val searchExtra = root.args.keySet.diff(
      Set("queryString", "entityNames", "page.index", "page.size", "size"))
    if (searchExtra.nonEmpty) throw ParseError(
      s"unknown argument${if (searchExtra.size > 1) "s" else ""} " +
        s"${searchExtra.toSeq.sorted.mkString(", ")} on search — " +
        "supported: queryString, entityNames, page")
    val qs = root.args.getOrElse("queryString", throw ParseError(
      "search requires the queryString argument"))
    val entities = root.args.get("entityNames")
      .map(splitList(_).distinct)
      .getOrElse(Seq("disease", "target", "drug"))
    val objSels: Seq[Field] = root.sel.filter(_.name == "hits")
      .flatMap(_.sel).filter(_.name == "object")
    def rel = widenedSearchRel(kg, entities, objSels)
      .filter(lower(col("name")).contains(qs.toLowerCase))
    val explicitSize = intArg(root.args, "page.size")
      .orElse(intArg(root.args, "size"))
    val index: Int = intArg(root.args, "page.index").getOrElse(0)
    if (index > 0 && explicitSize.isEmpty) throw ParseError(
      "page.index needs page.size")
    val size: Option[Int] = explicitSize.map(math.min(_, MaxPageSize))
    def hitsArray(sel: Seq[Field]): Column = {
      val payload = hitStruct(sel, "search hits")
      val sorted = sort_array(collect_list(struct(col("name").as("__k0"),
        col("id").as("__k1"), payload.as("__p"))))
      val page = size.fold(sorted) { n =>
        val start = math.min(index.toLong * n + 1L, Int.MaxValue.toLong).toInt
        slice(sorted, start, n)
      }
      transform(page, x => x.getField("__p"))
    }
    root.sel.foreach {
      case g @ Field("total", _, Seq(), _) => noArgs(g, "search"); ()
      case g @ Field("hits", _, _, _) => noArgs(g, "search"); ()
      case Field("aggregations", _, _, _) => ()
      case g @ Field("__typename", _, _, _) => noSubSel(g)
      case g => throw ParseError(
        s"unknown field '${g.name}' on search — supported: " +
          "total, hits, aggregations")
    }
    if (root.sel.isEmpty) throw ParseError("search needs a selection")
    // one aggregate per aliased `aggregations` selection — entity
    // facet counts over the FULL match set in both branches
    val aggsDfs: Seq[DataFrame] = root.sel.collect {
      case g @ Field("aggregations", _, _, _) => aggregationsDf(rel, g)
    }
    size match {
      case None =>
        // unpaginated: total and the full hit array fold in ONE agg;
        // __typename projects AFTER the agg — a literal INSIDE the
        // aggregate (first(lit)) is NULL over a zero-match relation
        val parts0 = root.sel
          .filterNot(g => g.name == "__typename" || g.name == "aggregations")
          .map {
            case g @ Field("total", _, Seq(), _) => count(lit(1)).as(g.out)
            case g @ Field("hits", _, sel, _) => hitsArray(sel).as(g.out)
            case g => throw ParseError(s"unreachable: ${g.name}")
          }
        val main: Option[DataFrame] =
          if (parts0.isEmpty) None
          else Some(rel.agg(parts0.head, parts0.tail: _*))
        val sides = main.toSeq ++ aggsDfs
        val combined =
          if (sides.isEmpty) rel.sparkSession.range(1).toDF()
          else sides.reduce((a, b) => a.crossJoin(broadcast(b)))
        combined.select(root.sel.map { g =>
          (if (g.name == "__typename") lit("SearchResults")
           else col(g.out)).as(g.out)
        }: _*)
      case Some(n) =>
        // paged: hits aggregate the rank-LIMITED relation (top-k
        // merge, never a whole-match collect); total stays the full
        // match count
        val totalDf: Option[DataFrame] =
          if (!root.sel.exists(_.name == "total")) None
          else Some(rel.agg(count(lit(1)).as("total")))
        // one aggregate per aliased `hits` selection, named by its
        // response key (the connection-rows discipline — each alias
        // gets its own payload, never first-wins)
        val hitsDfs: Seq[DataFrame] = root.sel.collect {
          case g @ Field("hits", _, sel, _) =>
            val limitN = math.min((index + 1).toLong * n,
              Int.MaxValue.toLong).toInt
            rel.sort(col("name"), col("id")).limit(limitN)
              .agg(hitsArray(sel).as(g.out))
        }
        val sides = totalDf.toSeq ++ hitsDfs ++ aggsDfs
        val combined =
          if (sides.isEmpty) rel.sparkSession.range(1).toDF()
          else sides.reduce((a, b) => a.crossJoin(broadcast(b)))
        combined.select(root.sel.map { g =>
          (if (g.name == "__typename") lit("SearchResults")
           else if (g.name == "total") col("total")
           else col(g.out)).as(g.out)
        }: _*)
    }
  }

  /** The `facets(queryString:, entityNames:, category:, page:)` root
    * (opentargets.schema:1161-1173; SearchFacetsResults :1254-1274) —
    * the last schema-declared search feature: facet rows over the
    * SAME substring-match hit relation as `search`, with per-category
    * counts for the facet-navigation UI. This dialect's facet
    * categories are the entity kinds (disease/target/drug); a facet
    * hit is (id, label, category) — label the display name. The
    * `category` argument narrows hits and total to one category,
    * while `categories { name total }` counts over the PRE-category
    * match set (the query + entityNames scope) — a category-filtered
    * page still shows the other categories' counts, which is what
    * makes facet navigation possible. `queryString` is OPTIONAL here
    * (nullable in the schema, unlike search's) — absent means the
    * whole entity scope. Hits are (label, id)-ordered and paged with
    * the search discipline: rank-limit BEFORE the array fold;
    * category counts are one keyed agg over dimension tables.
    */
  private def executeFacets(kg: KnowledgeGraph, root: Field): DataFrame = {
    val facetsExtra = root.args.keySet.diff(Set("queryString",
      "entityNames", "category", "page.index", "page.size", "size"))
    if (facetsExtra.nonEmpty) throw ParseError(
      s"unknown argument${if (facetsExtra.size > 1) "s" else ""} " +
        s"${facetsExtra.toSeq.sorted.mkString(", ")} on facets — " +
        "supported: queryString, entityNames, category, page")
    val entities = root.args.get("entityNames")
      .map(splitList(_).distinct)
      .getOrElse(Seq("disease", "target", "drug"))
    // the same entity-scope union the search root scans (no arm
    // widening — facet hits carry no union object)
    def scope = widenedSearchRel(kg, entities, Seq.empty)
      .filter(root.args.get("queryString")
        .map(qs => lower(col("name")).contains(qs.toLowerCase))
        .getOrElse(lit(true)))
    val category = root.args.get("category")
    category.foreach { c =>
      if (!entities.contains(c)) throw ParseError(
        s"category '$c' is outside the searched scope " +
          s"(${entities.mkString(", ")}) — this dialect's facet " +
          "categories are the entity kinds")
    }
    val hitsRel = category.fold(scope)(c => scope.filter(col("entity") === c))
    val explicitSize = intArg(root.args, "page.size")
      .orElse(intArg(root.args, "size"))
    val index: Int = intArg(root.args, "page.index").getOrElse(0)
    if (index > 0 && explicitSize.isEmpty) throw ParseError(
      "page.index needs page.size")
    val size: Option[Int] = explicitSize.map(math.min(_, MaxPageSize))
    root.sel.foreach {
      case g @ Field("total", _, Seq(), _) => noArgs(g, "facets"); ()
      case g @ Field("hits", _, _, _) => noArgs(g, "facets"); ()
      case g @ Field("categories", _, _, _) => noArgs(g, "facets"); ()
      case g @ Field("__typename", _, _, _) => noSubSel(g)
      case g => throw ParseError(
        s"unknown field '${g.name}' on facets — supported: " +
          "total, hits, categories")
    }
    if (root.sel.isEmpty) throw ParseError("facets needs a selection")
    def facetHit(sel: Seq[Field]): Column = {
      if (sel.isEmpty) throw ParseError("facets hits need a selection")
      struct(sel.map { f =>
        (f.name match {
          case "__typename" => noSubSel(f); lit("SearchFacetsResult")
          case "id" | "label" | "category" =>
            if (f.sel.nonEmpty) throw ParseError(
              s"'facets hits.${f.name}' is a scalar — drop its selection")
            f.name match {
              case "id" => col("id")
              case "label" => col("name")
              case _ => col("entity")
            }
          case other => throw ParseError(
            s"unknown field '$other' on facets hits — supported: " +
              "id, label, category")
        }).as(f.out)
      }: _*)
    }
    def hitsDfFor(g: Field): DataFrame = {
      val src = size.fold(hitsRel)(n => hitsRel.sort(col("name"), col("id"))
        .limit(math.min((index + 1).toLong * n, Int.MaxValue.toLong).toInt))
      val arr = sort_array(collect_list(struct(col("name").as("__k0"),
        col("id").as("__k1"), facetHit(g.sel).as("__p"))))
      val paged = size.fold(arr) { n =>
        val start = math.min(index.toLong * n + 1L, Int.MaxValue.toLong).toInt
        slice(arr, start, n)
      }
      src.agg(transform(paged, x => x.getField("__p")).as(g.out))
    }
    def catDfFor(g: Field): DataFrame = {
      if (g.sel.isEmpty) throw ParseError(
        "facets categories need a selection")
      val payload = struct(g.sel.map { f =>
        (f.name match {
          case "__typename" => noSubSel(f); lit("SearchFacetsCategory")
          case "name" | "total" =>
            if (f.sel.nonEmpty) throw ParseError(
              s"'facets categories.${f.name}' is a scalar — drop its selection")
            if (f.name == "name") col("entity") else col("n")
          case other => throw ParseError(
            s"unknown field '$other' on facets categories — supported: " +
              "name, total")
        }).as(f.out)
      }: _*)
      scope.groupBy(col("entity")).agg(count(lit(1)).as("n"))
        .agg(transform(sort_array(collect_list(struct(
          col("entity").as("__k0"), payload.as("__p")))),
          x => x.getField("__p")).as(g.out))
    }
    // 1-row sides per selection (one per ALIAS for hits/categories,
    // the connection-rows discipline), broadcast cross-joined
    val sides: Seq[DataFrame] =
      (if (root.sel.exists(_.name == "total"))
         Seq(hitsRel.agg(count(lit(1)).as("total"))) else Nil) ++
      root.sel.collect { case g @ Field("hits", _, _, _) => hitsDfFor(g) } ++
      root.sel.collect { case g @ Field("categories", _, _, _) => catDfFor(g) }
    val combined =
      if (sides.isEmpty) scope.sparkSession.range(1).toDF()
      else sides.reduce((a, b) => a.crossJoin(broadcast(b)))
    combined.select(root.sel.map { g =>
      (if (g.name == "__typename") lit("SearchFacetsResults")
       else if (g.name == "total") col("total")
       else col(g.out)).as(g.out)
    }: _*)
  }

  /** Serving cap on a `mapIds` term batch — the nearDupLookup
    * discipline: an unbounded term list belongs in a join against a
    * terms RELATION, not in one request.
    */
  val MaxMapTerms: Int = 1000

  /** The `mapIds(queryTerms:, entityNames:)` root
    * (opentargets.schema:1176-1181 → MappingResults :977-983): map a
    * BATCH of free-text terms to entity hits in one request — the
    * bulk companion of `search` (the schema's term-to-ID utility).
    * ONE pass over the entity scope: the term list rides as a
    * broadcast relation into the substring-match filter (never a scan
    * per term — the S4 batch-lookup discipline), then one keyed fold
    * per term builds its hit array; terms with NO hits still emit a
    * mapping with an empty array (the client iterates its own term
    * list positionally). `mappings` keeps the REQUEST order of
    * queryTerms; hits are (name, id)-ordered; `total` is the hit
    * count across all mappings; `aggregations` follows the search
    * root's entity-facet convention (counts over term-hit MATCHES).
    * Duplicate terms and a batch above [[MaxMapTerms]] are targeted
    * errors. Hits are full SearchResults — the union `object` field
    * and its inline-fragment arms work here unchanged.
    */
  private def executeMapIds(kg: KnowledgeGraph, root: Field): DataFrame = {
    val extra = root.args.keySet.diff(Set("queryTerms", "entityNames"))
    if (extra.nonEmpty) throw ParseError(
      s"unknown argument${if (extra.size > 1) "s" else ""} " +
        s"${extra.toSeq.sorted.mkString(", ")} on mapIds — " +
        "supported: queryTerms, entityNames")
    val terms = splitList(root.args.getOrElse("queryTerms", throw ParseError(
      "mapIds requires the queryTerms argument")))
      .filter(_.nonEmpty)
    if (terms.isEmpty) throw ParseError("queryTerms must not be empty")
    // an empty-STRING term would silently vanish from the positional
    // mappings array — reject it loudly instead
    if (splitList(root.args("queryTerms")).exists(_.isEmpty) &&
        root.args("queryTerms").nonEmpty) throw ParseError(
      "queryTerms must not contain empty strings")
    // duplicates keyed on the LOWERCASED term — the same normalization
    // the match filter applies, so ["Red", "red"] (two identical
    // mappings at serve time) is exactly the redundancy rejected here
    val dup = terms.groupBy(_.toLowerCase)
      .collect { case (_, ts) if ts.size > 1 => ts.head }
    if (dup.nonEmpty) throw ParseError(
      s"duplicate queryTerms (matching is case-insensitive): " +
        dup.toSeq.sorted.mkString(", "))
    if (terms.size > MaxMapTerms) throw ParseError(
      s"mapIds serves at most $MaxMapTerms terms per request, got " +
        s"${terms.size} — join against a terms relation for batch mapping")
    val entities = root.args.get("entityNames")
      .map(splitList(_).distinct)
      .getOrElse(Seq("disease", "target", "drug"))
    root.sel.foreach {
      case g @ Field("total", _, Seq(), _) => noArgs(g, "mapIds"); ()
      case g @ Field("mappings", _, _, _) => noArgs(g, "mapIds"); ()
      case Field("aggregations", _, _, _) => ()
      case g @ Field("__typename", _, _, _) => noSubSel(g)
      case g => throw ParseError(
        s"unknown field '${g.name}' on mapIds — supported: " +
          "total, mappings, aggregations")
    }
    if (root.sel.isEmpty) throw ParseError("mapIds needs a selection")
    val mappingsSels: Seq[Field] = root.sel.filter(_.name == "mappings")
    val objSels = mappingsSels.flatMap(_.sel).filter(_.name == "hits")
      .flatMap(_.sel).filter(_.name == "object")
    val rel = widenedSearchRel(kg, entities, objSels)
    val spark = rel.sparkSession
    // the term batch as a broadcast relation: (term, lowered, ord)
    val termsDf = {
      import scala.jdk.CollectionConverters._
      val rows = terms.zipWithIndex.map { case (t, i) =>
        org.apache.spark.sql.Row(t, t.toLowerCase, i)
      }.asJava
      spark.createDataFrame(rows,
        org.apache.spark.sql.types.StructType.fromDDL(
          "__term STRING, __lt STRING, __ord INT"))
    }
    // every (term, hit) match in ONE scan; a LEFT join back to the
    // term relation keeps zero-hit terms (their hit columns are null
    // and collect_list's when() guard folds them to an empty array)
    val matched = rel.crossJoin(broadcast(termsDf))
      .filter(lower(col("name")).contains(col("__lt")))
    val all = termsDf.join(matched.drop("__lt"),
      Seq("__term", "__ord"), "left")
    def mappingsDfFor(g: Field): DataFrame = {
      if (g.sel.isEmpty) throw ParseError("mapIds mappings need a selection")
      // per-alias hit arrays first (one grouped agg per term)...
      val hitParts = g.sel.collect {
        case h @ Field("hits", _, sel, _) =>
          transform(sort_array(collect_list(when(col("id").isNotNull,
            struct(col("name").as("__k0"), col("id").as("__k1"),
              hitStruct(sel, "mapIds mapping hits").as("__p"))))),
            x => x.getField("__p")).as(h.out)
      }
      val parts =
        if (hitParts.nonEmpty) hitParts else Seq(count(lit(1)).as("__c"))
      val grouped = all.groupBy(col("__term"), col("__ord"))
        .agg(parts.head, parts.tail: _*)
      // ...then the mapping structs fold in REQUEST order
      val payload = struct(g.sel.map { m =>
        (m.name match {
          case "__typename" => noSubSel(m); lit("MappingResult")
          case "term" =>
            if (m.sel.nonEmpty) throw ParseError(
              "'mappings.term' is a scalar — drop its selection")
            col("__term")
          case "hits" => col(m.out)
          case other => throw ParseError(
            s"unknown field '$other' on mapIds mappings — supported: " +
              "term, hits")
        }).as(m.out)
      }: _*)
      grouped.agg(transform(sort_array(collect_list(struct(
        col("__ord").as("__k0"), payload.as("__p")))),
        x => x.getField("__p")).as(g.out))
    }
    val sides: Seq[DataFrame] =
      (if (root.sel.exists(_.name == "total"))
         Seq(matched.agg(count(lit(1)).as("total"))) else Nil) ++
      root.sel.collect { case g @ Field("mappings", _, _, _) =>
        mappingsDfFor(g) } ++
      root.sel.collect { case g @ Field("aggregations", _, _, _) =>
        aggregationsDf(matched, g) }
    val combined =
      if (sides.isEmpty) spark.range(1).toDF()
      else sides.reduce((a, b) => a.crossJoin(broadcast(b)))
    combined.select(root.sel.map { g =>
      (if (g.name == "__typename") lit("MappingResults")
       else if (g.name == "total") col("total")
       else col(g.out)).as(g.out)
    }: _*)
  }

  /** The `meta` root (opentargets.schema:1118 → Meta :1013-1017):
    * API metadata as one row — the `name` scalar plus the
    * `apiVersion` / `dataVersion` object fields, each selection-
    * shaped. The values come off [[KnowledgeGraph.meta]]'s one-row
    * aggregate (dataVersion is the corpus's data cut), so the root is
    * a real computation the oracle replays, not a literal echo.
    */
  /** The dialect's executable Query type, introspection-shaped: root
    * field name → (args as (name, rendered type), rendered result
    * type). Renderings are the reference schema's own
    * (opentargets.schema:1116-1192), restricted to exactly the
    * surface [[execute]] dispatches — introspection is a CONTRACT
    * about what runs here, so a root appears iff it executes.
    */
  private val QueryRoots: Seq[(String, Seq[(String, String)], String)] = Seq(
    ("meta", Seq.empty, "Meta!"),
    ("target", Seq("ensemblId" -> "String!"), "Target"),
    ("targets", Seq("ensemblIds" -> "[String!]!"), "[Target!]!"),
    ("disease", Seq("efoId" -> "String!"), "Disease"),
    ("diseases", Seq("efoIds" -> "[String!]!"), "[Disease!]!"),
    ("drug", Seq("chemblId" -> "String!"), "Drug"),
    ("drugs", Seq("chemblIds" -> "[String!]!"), "[Drug!]!"),
    ("search", Seq("queryString" -> "String!", "entityNames" -> "[String!]",
      "page" -> "Pagination"), "SearchResults!"),
    ("facets", Seq("queryString" -> "String", "entityNames" -> "[String!]",
      "category" -> "String", "page" -> "Pagination"),
      "SearchFacetsResults!"),
    ("mapIds", Seq("queryTerms" -> "[String!]!",
      "entityNames" -> "[String!]"), "MappingResults!"),
    ("associationDatasources", Seq.empty, "[EvidenceSource!]!"),
    ("interactionResources", Seq.empty, "[InteractionResources!]!"),
    ("geneOntologyTerms", Seq("goIds" -> "[String!]!"),
      "[GeneOntologyTerm]!"))

  /** Entity/object types `__type(name:)` serves, with the field names
    * this dialect actually resolves on each (scalars + the connection
    * sites [[connectionDf]] executes). The executable-surface rule
    * again: a field appears iff a query selecting it runs.
    */
  private val IntroTypes: Map[String, Seq[String]] = Map(
    "Query" -> QueryRoots.map(_._1),
    "Disease" -> Seq("id", "name", "knownDrugs", "associatedTargets",
      "phenotypes", "evidences"),
    "Target" -> Seq("id", "approvedSymbol", "bioType", "knownDrugs",
      "associatedDiseases", "pathways", "tractability", "similarEntities"),
    "Drug" -> Seq("id", "name", "synonyms", "drugType", "isApproved",
      "maximumClinicalTrialPhase", "linkedTargets", "mechanismsOfAction"),
    "GeneOntologyTerm" -> Seq("id", "name"),
    "Tractability" -> Seq("label", "modality", "value"),
    "HPO" -> Seq("id", "name", "description", "namespace"),
    "Evidence" -> Seq("id", "score", "target", "disease"),
    "Similarity" -> Seq("category", "id", "score", "object"),
    "Meta" -> Seq("name", "apiVersion", "dataVersion"))

  /** Minimal GraphQL introspection — the first request every real
    * client (GraphiQL, Apollo, graphql-request) sends against an
    * endpoint shaped like this schema. Serves `__schema { queryType
    * { name fields { name args { name type { name } } type { name }
    * } } }` and `__type(name:)` over the dialect's OWN executable
    * surface. One documented divergence from full introspection: a
    * type reference's `name` carries the schema's RENDERED type
    * string (`[Target!]!`) instead of an `ofType` wrapper chain —
    * the flattened form is what the reference schema's own text
    * shows, and wrapper-chain walking is not served (selecting
    * `ofType` errors loudly, like every unknown introspection field
    * here — a client sees a targeted message, never a silent null).
    */
  private def executeSchemaIntrospection(kg: KnowledgeGraph,
                                         root: Field): DataFrame = {
    if (root.args.nonEmpty) throw ParseError(
      "__schema takes no arguments, got " +
        root.args.keys.toSeq.sorted.mkString(", "))
    if (root.sel.isEmpty) throw ParseError("'__schema' needs a selection")
    val out = root.sel.map { f =>
      (f.name match {
        case "__typename" => noSubSel(f); lit("__Schema")
        case "queryType" =>
          if (f.sel.isEmpty) throw ParseError(
            "'__schema.queryType' needs a selection")
          introQueryType(f.sel)
        case other => throw ParseError(
          s"unknown introspection field '$other' on __schema — " +
            "supported: queryType (this dialect serves the minimal " +
            "introspection surface)")
      }).as(f.out)
    }
    kg.diseases.sparkSession.range(1).select(out: _*)
  }

  private def introQueryType(sel: Seq[Field]): Column =
    struct(sel.map { g =>
      (g.name match {
        case "__typename" => noSubSel(g); lit("__Type")
        case "name" =>
          if (g.sel.nonEmpty) throw ParseError(
            "'queryType.name' is a scalar — drop its selection")
          lit("Query")
        case "kind" =>
          if (g.sel.nonEmpty) throw ParseError(
            "'queryType.kind' is a scalar — drop its selection")
          lit("OBJECT")
        case "fields" =>
          if (g.sel.isEmpty) throw ParseError(
            "'queryType.fields' needs a selection")
          array(QueryRoots.sortBy(_._1).map { case (n, args, ret) =>
            introFieldStruct(g.sel, n, args, ret)
          }: _*)
        case other => throw ParseError(
          s"unknown introspection field '$other' on __Type — " +
            "supported: fields, kind, name")
      }).as(g.out)
    }: _*)

  private def introFieldStruct(sel: Seq[Field], fname: String,
                               args: Seq[(String, String)],
                               ret: String): Column =
    struct(sel.map { h =>
      (h.name match {
        case "__typename" => noSubSel(h); lit("__Field")
        case "name" =>
          if (h.sel.nonEmpty) throw ParseError(
            "'fields.name' is a scalar — drop its selection")
          lit(fname)
        case "type" =>
          if (h.sel.isEmpty) throw ParseError(
            "'fields.type' needs a selection")
          introTypeRef(h.sel, ret)
        case "args" =>
          if (h.sel.isEmpty) throw ParseError(
            "'fields.args' needs a selection")
          if (args.isEmpty)
            // typed empty array: the template struct filtered away
            filter(array(introArgStruct(h.sel, "", "")), _ => lit(false))
          else array(args.sortBy(_._1).map { case (an, at) =>
            introArgStruct(h.sel, an, at)
          }: _*)
        case other => throw ParseError(
          s"unknown introspection field '$other' on __Field — " +
            "supported: args, name, type")
      }).as(h.out)
    }: _*)

  private def introArgStruct(sel: Seq[Field], aname: String,
                             atype: String): Column =
    struct(sel.map { h =>
      (h.name match {
        case "__typename" => noSubSel(h); lit("__InputValue")
        case "name" =>
          if (h.sel.nonEmpty) throw ParseError(
            "'args.name' is a scalar — drop its selection")
          lit(aname)
        case "type" =>
          if (h.sel.isEmpty) throw ParseError(
            "'args.type' needs a selection")
          introTypeRef(h.sel, atype)
        case other => throw ParseError(
          s"unknown introspection field '$other' on __InputValue — " +
            "supported: name, type")
      }).as(h.out)
    }: _*)

  private def introTypeRef(sel: Seq[Field], rendered: String): Column =
    struct(sel.map { h =>
      (h.name match {
        case "__typename" => noSubSel(h); lit("__Type")
        case "name" =>
          if (h.sel.nonEmpty) throw ParseError(
            "'type.name' is a scalar — drop its selection")
          lit(rendered)
        case other => throw ParseError(
          s"unknown introspection field '$other' on a __Type reference " +
            "— supported: name (the dialect renders wrapper chains " +
            "into the name; ofType walking is not served)")
      }).as(h.out)
    }: _*)

  /** `__type(name:)` — one named type of the executable surface:
    * name, kind, fields { name }. Unknown names error loudly with the
    * served catalog (a client probing an entity it cannot query must
    * learn that HERE, not from a null it dereferences later).
    */
  private def executeTypeIntrospection(kg: KnowledgeGraph,
                                       root: Field): DataFrame = {
    val extra = root.args.keySet - "name"
    if (extra.nonEmpty) throw ParseError(
      s"unknown argument${if (extra.size > 1) "s" else ""} " +
        s"${extra.toSeq.sorted.mkString(", ")} on __type — it takes only name")
    val tname = root.args.getOrElse("name", throw ParseError(
      "__type requires the name argument"))
    val tfields = IntroTypes.getOrElse(tname, throw ParseError(
      s"unknown type '$tname' — introspectable types: " +
        IntroTypes.keys.toSeq.sorted.mkString(", ")))
    if (root.sel.isEmpty) throw ParseError("'__type' needs a selection")
    val out = root.sel.map { f =>
      (f.name match {
        case "__typename" => noSubSel(f); lit("__Type")
        case "name" =>
          if (f.sel.nonEmpty) throw ParseError(
            "'__type.name' is a scalar — drop its selection")
          lit(tname)
        case "kind" =>
          if (f.sel.nonEmpty) throw ParseError(
            "'__type.kind' is a scalar — drop its selection")
          lit("OBJECT")
        case "fields" =>
          if (f.sel.isEmpty) throw ParseError(
            "'__type.fields' needs a selection")
          array(tfields.sorted.map { n =>
            struct(f.sel.map { h =>
              (h.name match {
                case "__typename" => noSubSel(h); lit("__Field")
                case "name" =>
                  if (h.sel.nonEmpty) throw ParseError(
                    "'fields.name' is a scalar — drop its selection")
                  lit(n)
                case other => throw ParseError(
                  s"unknown introspection field '$other' on __Field " +
                    "under __type — supported: name")
              }).as(h.out)
            }: _*)
          }: _*)
        case other => throw ParseError(
          s"unknown introspection field '$other' on __Type — " +
            "supported: fields, kind, name")
      }).as(f.out)
    }
    kg.diseases.sparkSession.range(1).select(out: _*)
  }

  private def executeMeta(kg: KnowledgeGraph, root: Field): DataFrame = {
    if (root.args.nonEmpty) throw ParseError(
      "meta takes no arguments, got " +
        root.args.keys.toSeq.sorted.mkString(", "))
    if (root.sel.isEmpty) throw ParseError("'meta' needs a selection")
    val subFields: Map[String, Map[String, Column]] = Map(
      "apiVersion" -> Map("x" -> col("x"), "y" -> col("y"), "z" -> col("z")),
      "dataVersion" -> Map("year" -> col("year"), "month" -> col("month"),
        "iteration" -> col("iteration")))
    kg.meta.select(root.sel.map { f =>
      (f.name match {
        case "__typename" => noSubSel(f); lit("Meta")
        case "name" =>
          if (f.sel.nonEmpty) throw ParseError(
            "'meta.name' is a scalar — drop its selection")
          col("name")
        case sub if subFields.contains(sub) =>
          if (f.args.nonEmpty) throw ParseError(
            s"'meta.$sub' takes no arguments")
          entityStruct(sub, f.sel, subFields(sub))
        case other => throw ParseError(
          s"unknown field '$other' on meta — supported: " +
            "name, apiVersion, dataVersion")
      }).as(f.out)
    }: _*)
  }

  /** The two argument-less catalog roots — `associationDatasources`
    * (opentargets.schema:1183-1184, EvidenceSource :659-662) and
    * `interactionResources` (:1186-1187, :827-830). Each is one row
    * whose root column is the key-sorted array of catalog entries
    * (the executeBatch list convention); the views behind them are
    * low-cardinality map-side-combined aggs ([[KnowledgeGraph]]), so
    * "the complete list of all possible X" stays catalog-cost at any
    * corpus scale.
    */
  private def executeCatalog(kg: KnowledgeGraph, root: Field): DataFrame = {
    val (base, sortKey, fields) = root.name match {
      case "associationDatasources" => (kg.associationDatasources,
        "datasource",
        Map("datasource" -> col("datasource"), "datatype" -> col("datatype")))
      case "interactionResources" => (kg.interactionResources,
        "sourceDatabase",
        Map("databaseVersion" -> col("databaseVersion"),
          "sourceDatabase" -> col("sourceDatabase")))
      case other => throw ParseError(s"not a catalog root: $other")
    }
    if (root.args.nonEmpty) throw ParseError(
      s"${root.name} takes no arguments, got " +
        root.args.keys.toSeq.sorted.mkString(", "))
    if (root.sel.isEmpty) throw ParseError(
      s"'${root.name}' needs a selection")
    val payload = entityStruct(root.name, root.sel, fields)
    base.agg(transform(sort_array(collect_list(struct(
        col(sortKey).as("__k0"), payload.as("__p")))),
      x => x.getField("__p")).as(root.out))
  }

  /** The `geneOntologyTerms(goIds: [...])` root (opentargets.schema:
    * 1189-1192 → GeneOntologyTerm :714-717). The S4 batch-lookup plan
    * over [[KnowledgeGraph.goTerms]] — the id batch rides as a
    * broadcast relation into ONE exact-match scan, never a scan per
    * id — with the mapIds POSITIONAL discipline: the result list
    * keeps the request order of goIds and a missing GO id emits a
    * null entry (the schema's element type is nullable —
    * `[GeneOntologyTerm]!` — unlike the other batch roots' `[X!]!`),
    * so the client indexes the response by its own request list.
    */
  private def executeGoTerms(kg: KnowledgeGraph, root: Field): DataFrame = {
    val extra = root.args.keySet - "goIds"
    if (extra.nonEmpty) throw ParseError(
      s"unknown argument${if (extra.size > 1) "s" else ""} " +
        s"${extra.toSeq.sorted.mkString(", ")} on geneOntologyTerms — " +
        "it takes only goIds")
    val rawArg = root.args.getOrElse("goIds", throw ParseError(
      "geneOntologyTerms requires the goIds argument"))
    // an empty-string id would silently shift the positional result —
    // reject it loudly (the mapIds discipline). Checked BEFORE the
    // empty-list collapse so `goIds: ["", ""]` names the actual
    // defect (empty entries) rather than reporting an empty list.
    // A SINGLE empty token is indistinguishable from `[]` after the
    // list join, so that case stays "must not be empty".
    val rawAll = splitList(rawArg)
    if (rawAll.size > 1 && rawAll.exists(_.isEmpty))
      throw ParseError("goIds must not contain empty strings")
    val raw = rawAll.filter(_.nonEmpty)
    if (raw.isEmpty) throw ParseError("goIds must not be empty")
    // duplicate ids are two identical positional entries — redundancy
    // rejected loudly; GO ids are exact-match identifiers, so the
    // check is case-sensitive like the lookup itself
    val dup = raw.groupBy(identity).collect { case (t, ts) if ts.size > 1 => t }
    if (dup.nonEmpty) throw ParseError(
      s"duplicate goIds: ${dup.toSeq.sorted.mkString(", ")}")
    if (raw.size > MaxMapTerms) throw ParseError(
      s"geneOntologyTerms serves at most $MaxMapTerms ids per request, " +
        s"got ${raw.size} — join against an id relation for batch mapping")
    if (root.sel.isEmpty) throw ParseError(
      "'geneOntologyTerms' needs a selection")
    val terms = kg.goTerms
    val spark = terms.sparkSession
    val idsDf = {
      import scala.jdk.CollectionConverters._
      val rows = raw.zipWithIndex.map { case (g, i) =>
        org.apache.spark.sql.Row(g, i)
      }.asJava
      spark.createDataFrame(rows,
        org.apache.spark.sql.types.StructType.fromDDL(
          "__gid STRING, __ord INT"))
    }
    val payload = entityStruct("geneOntologyTerms", root.sel,
      Map("id" -> col("id"), "name" -> col("name")))
    // left join keeps missing ids; the struct wrapper keeps their
    // NULL payloads as array entries (collect_list drops bare nulls).
    // The CATALOG side broadcasts (left-outer builds right) — at any
    // corpus scale goTerms is a low-cardinality distinct.
    idsDf.join(broadcast(terms), col("__gid") === col("id"), "left")
      .agg(transform(sort_array(collect_list(struct(
          col("__ord").as("__k0"),
          when(col("id").isNotNull, payload).as("__p")))),
        x => x.getField("__p")).as(root.out))
  }

  /** Batch point-lookup roots — `targets(ensemblIds: [...])` /
    * `diseases(efoIds:)` / `drugs(chemblIds:)`
    * (opentargets.schema:1125-1148, declared but unused by the
    * reference scripts — they loop one query per id, the documented
    * missed optimization of SURVEY §4.1). Here the id list becomes
    * ONE `isin`-filtered scan (the S4 batch-lookup plan): N lookups,
    * one pass over the entity table. Result is the GraphQL list —
    * one row whose root column is the id-sorted array of entities.
    */
  private def executeBatch(kg: KnowledgeGraph, root: Field): DataFrame = {
    val (entity, keyArg, base, fields) = root.name match {
      case "targets" => ("target", "ensemblIds", kg.targets,
        Map("id" -> col("id"), "approvedSymbol" -> col("approvedSymbol"),
          "bioType" -> col("bioType")))
      case "diseases" => ("disease", "efoIds", kg.diseases,
        Map("id" -> col("id"), "name" -> col("name")))
      case "drugs" => ("drug", "chemblIds", kg.drugDetails,
        Map("id" -> col("id"), "name" -> col("name"),
          "synonyms" -> col("synonyms"), "drugType" -> col("drugType"),
          "isApproved" -> col("isApproved"),
          "maximumClinicalTrialPhase" -> col("maximumClinicalTrialPhase")))
      case other => throw ParseError(s"not a batch root: $other")
    }
    val ids = splitList(root.args.getOrElse(keyArg, throw ParseError(
      s"${root.name} requires the $keyArg argument"))).filter(_.nonEmpty)
    val batchExtra = root.args.keySet - keyArg
    if (batchExtra.nonEmpty) throw ParseError(
      s"unknown argument${if (batchExtra.size > 1) "s" else ""} " +
        s"${batchExtra.toSeq.sorted.mkString(", ")} on ${root.name} — " +
        s"it takes only $keyArg")
    if (ids.isEmpty) throw ParseError(s"$keyArg must not be empty")
    if (root.sel.isEmpty) throw ParseError(
      s"'${root.name}' needs a selection")
    val payload = entityStruct(entity, root.sel, fields)
    base.filter(col("id").isin(ids: _*))
      .agg(transform(sort_array(collect_list(struct(
        col("id").as("__k0"), payload.as("__p")))),
        x => x.getField("__p")).as(root.out))
  }

  /** Execute `query` against the knowledge graph. One row out (the
    * GraphQL `data` object); nested columns in selection order.
    * `variables` binds `query ($x: Type!)` declarations — the form
    * the Open Targets docs use for every parameterized example.
    */
  def execute(kg: KnowledgeGraph, query: String,
              variables: Map[String, String] = Map.empty): DataFrame = {
    val root = parse(query, variables)
    checkInline(Field("query", Map.empty, Seq(root)), underUnion = false)
    if (root.name == "__schema") return executeSchemaIntrospection(kg, root)
    if (root.name == "__type") return executeTypeIntrospection(kg, root)
    if (root.name == "search") return executeSearch(kg, root)
    if (root.name == "facets") return executeFacets(kg, root)
    if (root.name == "mapIds") return executeMapIds(kg, root)
    if (root.name == "meta") return executeMeta(kg, root)
    if (root.name == "geneOntologyTerms") return executeGoTerms(kg, root)
    if (Set("associationDatasources", "interactionResources")(root.name))
      return executeCatalog(kg, root)
    if (Set("targets", "diseases", "drugs")(root.name))
      return executeBatch(kg, root)
    val (entity, keyArg, base) = root.name match {
      case "disease" => ("disease", "efoId", kg.diseases)
      case "target" => ("target", "ensemblId", kg.targets)
      case "drug" => ("drug", "chemblId", kg.drugDetails)
      case other => throw ParseError(
        s"unknown root '$other' — supported: disease(efoId:), " +
          "target(ensemblId:), drug(chemblId:), search(queryString:), " +
          "facets(queryString:), mapIds(queryTerms:), " +
          "targets(ensemblIds:), diseases(efoIds:), drugs(chemblIds:), " +
          "geneOntologyTerms(goIds:), meta, associationDatasources, " +
          "interactionResources — the schema's full Query type " +
          "(opentargets.schema:1116-1192) — plus the __schema/__type " +
          "introspection roots")
    }
    val rootKey = root.args.getOrElse(keyArg, throw ParseError(
      s"$entity requires the $keyArg argument; got " +
        (if (root.args.isEmpty) "none" else root.args.keys.mkString(", "))))
    val extraArgs = root.args.keySet - keyArg
    if (extraArgs.nonEmpty) throw ParseError(
      s"unknown argument${if (extraArgs.size > 1) "s" else ""} " +
        s"${extraArgs.toSeq.sorted.mkString(", ")} on $entity — " +
        s"it takes only $keyArg (opentargets.schema:1125-1148)")
    if (root.sel.isEmpty) throw ParseError(s"'$entity' needs a selection")
    var df = base.filter(col("id") === rootKey)
    val outCols = root.sel.map { f =>
      if (f.name == "__typename") {
        noSubSel(f)
        lit(TypeNames(entity)).as(f.out)
      } else Scalars.get((entity, f.name)) match {
        case Some(src) =>
          if (f.sel.nonEmpty) throw ParseError(
            s"'$entity.${f.name}' is a scalar — drop its selection")
          col(src).as(f.out)
        case None =>
          df = df.crossJoin(broadcast(connectionDf(kg, entity, f, rootKey)))
          col(f.out)
      }
    }
    df.select(outCols: _*)
  }
}
