package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.algebra._

/** SPARQL FILTER/expression → Catalyst `Column`.
  *
  * Replaces the reference's tuple-at-a-time interpreter
  * (`/root/reference/ontario/operators/nonblocking/Xfilter.py:64-243`) with
  * codegen'd built-in column functions — no UDFs. SPARQL's error→false
  * semantics in FILTER maps onto SQL three-valued logic: a type error or
  * unbound variable becomes `null`, and `DataFrame.filter` drops nulls,
  * matching `evaluateEBV` (Xfilter.py:203-243) for the supported surface.
  */
object ExprCompiler {

  def compile(e: Expr, df: DataFrame): Column = e match {
    case Expr.TermRef(t)      => term(t, df)
    case Expr.Cmp(op, l, r)   => cmp(op, l, r, df)
    case Expr.Arith(op, l, r) => arith(op, compile(l, df), compile(r, df))
    case Expr.And(l, r)       => ebv(l, df) && ebv(r, df)
    case Expr.Or(l, r)        => ebv(l, df) || ebv(r, df)
    case Expr.Not(x)          => !ebv(x, df)
    case Expr.Call(fn, args)  => call(fn, args, df)
  }

  /** Top-level FILTER: effective boolean value. */
  def predicate(e: Expr, df: DataFrame): Column = ebv(e, df)

  private def ebv(e: Expr, df: DataFrame): Column = e match {
    case Expr.TermRef(Var(n)) =>
      colType(df, n) match {
        case Some(BooleanType)                  => df.col(n)
        case Some(_: NumericType)               => df.col(n) =!= lit(0)
        case Some(StringType)                   => length(df.col(n)) > 0
        case Some(_)                            => df.col(n).isNotNull
        case None                               => lit(null).cast(BooleanType)
      }
    case _ => compile(e, df).cast(BooleanType)
  }

  private def term(t: Term, df: DataFrame): Column = t match {
    case Var(n) =>
      if (df.columns.contains(n)) df.col(n)
      else lit(null) // unbound var in FILTER ⇒ error ⇒ null ⇒ false
    case Iri(u) => lit(u)
    case Lit(lex, dt, _) => dt match {
      case Some(Terms.XsdInt)      => lit(lex.toLong)
      case Some(Terms.XsdDecimal)  => lit(lex.toDouble)
      case Some(Terms.XsdDouble)   => lit(lex.toDouble)
      case Some(Terms.XsdBoolean)  => lit(lex == "true")
      case Some(Terms.XsdDateTime) => to_timestamp(lit(lex.replace("T", " ")))
      case _                       => lit(lex)
    }
  }

  /** TRY-mode cast: malformed values become null (⇒ FILTER false), never a
    * runtime error — SPARQL's error→false under Spark 4's default ANSI
    * mode, which would otherwise throw on e.g. `"abc" > 5`. */
  private def tryCast(c: Column, dt: DataType): Column = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode}
    GraftBridge.column(Cast(GraftBridge.expression(c), dt, None, EvalMode.TRY))
  }

  private def staticType(e: Expr, df: DataFrame): Option[DataType] = e match {
    case Expr.TermRef(Var(n))          => colType(df, n)
    case Expr.TermRef(Iri(_))          => Some(StringType)
    case Expr.TermRef(Lit(_, dt, _)) => Some(dt match {
      case Some(Terms.XsdInt)      => LongType
      case Some(Terms.XsdDecimal) | Some(Terms.XsdDouble) => DoubleType
      case Some(Terms.XsdBoolean)  => BooleanType
      case Some(Terms.XsdDateTime) => TimestampType
      case _                       => StringType
    })
    case _ => None
  }

  private def cmp(op: String, le: Expr, re: Expr, df: DataFrame): Column = {
    var l = compile(le, df)
    var r = compile(re, df)
    // SPARQL numeric promotion: a string operand against a numeric operand
    // compares numerically; non-numeric lexical forms ⇒ null ⇒ false
    (staticType(le, df), staticType(re, df)) match {
      case (Some(StringType), Some(_: NumericType)) => l = tryCast(l, DoubleType)
      case (Some(_: NumericType), Some(StringType)) => r = tryCast(r, DoubleType)
      case _ => ()
    }
    cmpCols(op, l, r)
  }

  private def cmpCols(op: String, l: Column, r: Column): Column = op match {
    case "="  => l === r
    case "!=" => l =!= r
    case "<"  => l < r
    case ">"  => l > r
    case "<=" => l <= r
    case ">=" => l >= r
  }

  private def arith(op: String, l: Column, r: Column): Column = op match {
    case "+" => l + r
    case "-" => l - r
    case "*" => l * r
    case "/" => l / r
  }

  /** IRI heuristic: scheme prefix (we control the mapped vocab — urn:/http). */
  private val iriRegex = "^[A-Za-z][A-Za-z0-9+.-]*:.*"

  private def call(fn: String, args: List[Expr], df: DataFrame): Column = {
    def a(i: Int): Column = compile(args(i), df)
    fn match {
      case "bound"      => a(0).isNotNull
      case "str"        => a(0).cast(StringType)
      case "regex" =>
        val pat = args(1) match {
          case Expr.TermRef(Lit(p, _, _)) =>
            val flags = args.lift(2).collect { case Expr.TermRef(Lit(f, _, _)) => f }
            if (flags.exists(_.contains("i"))) s"(?i)$p" else p
          case _ => throw new UnsupportedOperationException("dynamic regex pattern")
        }
        a(0).cast(StringType).rlike(pat)
      case "contains"   => a(0).contains(a(1))
      case "strstarts"  => a(0).startsWith(a(1))
      case "strends"    => a(0).endsWith(a(1))
      case "strlen"     => length(a(0).cast(StringType))
      case "ucase"      => upper(a(0))
      case "lcase"      => lower(a(0))
      case "concat"     => concat(args.map(x => compile(x, df).cast(StringType)): _*)
      case "substr" =>
        if (args.size >= 3) a(0).substr(a(1), a(2))
        else a(0).substr(a(1), lit(Int.MaxValue))
      case "replace"    => regexp_replace(a(0), args(1) match {
          case Expr.TermRef(Lit(p, _, _)) => p
          case _ => throw new UnsupportedOperationException("dynamic replace pattern")
        }, args(2) match {
          case Expr.TermRef(Lit(rr, _, _)) => rr
          case _ => throw new UnsupportedOperationException("dynamic replacement")
        })
      case "strbefore" =>
        val (s0, d0) = (a(0).cast(StringType), a(1).cast(StringType))
        when(instr(s0, d0) > 0, substring(s0, lit(1), instr(s0, d0) - 1)).otherwise(lit(""))
      case "strafter" =>
        val (s0, d0) = (a(0).cast(StringType), a(1).cast(StringType))
        when(instr(s0, d0) > 0,
          s0.substr(instr(s0, d0) + length(d0), lit(Int.MaxValue))).otherwise(lit(""))
      case "md5"    => md5(a(0).cast(StringType))
      case "sha1"   => sha1(a(0).cast(StringType))
      case "sha256" => sha2(a(0).cast(StringType), 256)
      case "sha384" => sha2(a(0).cast(StringType), 384)
      case "sha512" => sha2(a(0).cast(StringType), 512)
      // SPARQL wants RFC 3986 percent-encoding; url_encode is form-style
      case "encode_for_uri" =>
        regexp_replace(url_encode(a(0).cast(StringType)), "\\+", "%20")
      case "hours"   => hour(a(0))
      case "minutes" => minute(a(0))
      case "seconds" => second(a(0))
      // timestamps live in the engine's fixed UTC session zone (SURVEY §1.5),
      // so every dateTime carries the Z offset: TZ is its lexical form,
      // TIMEZONE the equivalent xsd:dayTimeDuration (§17.4.5.7-8); both are
      // errors (⇒ null) on non-timestamp input
      case "tz"       => when(tryCast(a(0), TimestampType).isNotNull, lit("Z"))
      case "timezone" => when(tryCast(a(0), TimestampType).isNotNull, lit("PT0S"))
      case "abs"        => abs(a(0))
      case "round"      => round(a(0))
      case "ceil"       => ceil(a(0))
      case "floor"      => floor(a(0))
      case "year"       => year(a(0))
      case "month"      => month(a(0))
      case "day"        => dayofmonth(a(0))
      case "isiri" | "isuri" => a(0).cast(StringType).rlike(iriRegex)
      case "isblank"    => a(0).cast(StringType).startsWith("_:")
      case "isliteral"  => !a(0).cast(StringType).rlike(iriRegex)
      case "isnumeric" =>
        args.head match {
          case Expr.TermRef(Var(n)) => colType(df, n) match {
            case Some(_: NumericType) => lit(true)
            case Some(StringType)     => tryCast(a(0), DoubleType).isNotNull
            case _                    => lit(false)
          }
          case _ => tryCast(a(0), DoubleType).isNotNull
        }
      case "sameterm"   => a(0) === a(1)
      // lang tags surface via hidden __lang_<var> columns when the mapping
      // declares a lang column (RefMap.langColumn); literals without tags
      // and unmapped vars yield "" per SPARQL
      case "lang" => args.head match {
        case Expr.TermRef(Var(n)) if df.columns.contains(s"__lang_$n") =>
          coalesce(df.col(s"__lang_$n"), lit(""))
        case Expr.TermRef(Lit(_, _, lang)) => lit(lang.getOrElse(""))
        case _ => lit("")
      }
      case "langmatches" =>
        args(1) match {
          case Expr.TermRef(Lit("*", _, _)) => a(0) =!= lit("")
          case _                            => lower(a(0)) === lower(a(1))
        }
      case "datatype" =>
        args.head match {
          case Expr.TermRef(Var(n)) =>
            lit(colType(df, n).map(xsdOf).getOrElse(Terms.XsdString))
          case Expr.TermRef(Lit(_, dt, _)) => lit(dt.getOrElse(Terms.XsdString))
          case _ => lit(Terms.XsdString)
        }
      case "coalesce"   => coalesce(args.map(compile(_, df)): _*)
      // FILTER (?x IN (…)) — OR-of-equals; Catalyst folds literal lists to In
      case "in" =>
        val target = a(0)
        args.tail.map(x => target === compile(x, df)).reduce(_ || _)
      case "if"         => when(ebv(args(0), df), a(1)).otherwise(a(2))
      // term constructors: terms are lexical strings in this engine, so
      // IRI/STRDT/STRLANG carry the lexical form (datatype/lang tags live
      // in the mapping, not the value — SURVEY.md §1.5)
      case "iri" | "uri" => a(0).cast(StringType)
      case "strdt"       => a(0).cast(StringType)
      case "strlang"     => a(0).cast(StringType)
      // NOW(): one timestamp for the whole query per §17.4.5.1 —
      // current_timestamp() is query-constant in Spark by the same rule
      case "now"         => current_timestamp()
      // fresh-per-solution terms (§17.4.2.2, §17.4.4.5-6): Spark's uuid()
      // draws per row; BNODE(str) is stable for the same argument WITHIN a
      // solution but distinct ACROSS solutions (§17.4.2.2) — the label
      // mixes the argument digest with a per-row id (all instances of
      // monotonically_increasing_id see the same row position, so two
      // BNODE(?x) calls in one solution agree); never collides with
      // parsed `_:` labels. Known limit: the within-solution agreement
      // holds for instances evaluated in the same plan operator over the
      // same row stream (the normal projection case); instances split
      // across operators with different row sets (one inside a FILTER,
      // one in SELECT) may disagree, as in any per-row-counter engine
      case "uuid"        => concat(lit("urn:uuid:"), expr("uuid()"))
      case "struuid"     => expr("uuid()")
      case "rand"        => rand()
      case "bnode" =>
        if (args.isEmpty) concat(lit("_:u"), regexp_replace(expr("uuid()"), "-", ""))
        else concat(lit("_:h"), md5(a(0).cast(StringType)), lit("r"),
          monotonically_increasing_id())
      // xsd:* constructor casts (ontario/sparql/__init__.py:8-60 binaryFunctor)
      case c if c.startsWith("http://www.w3.org/2001/XMLSchema#") =>
        // TRY semantics: an invalid lexical form is a SPARQL error ⇒ null
        c.stripPrefix("http://www.w3.org/2001/XMLSchema#") match {
          case "integer" | "int" | "long" => tryCast(a(0), LongType)
          case "decimal" | "double" | "float" => tryCast(a(0), DoubleType)
          case "boolean"  => tryCast(a(0), BooleanType)
          case "dateTime" => tryCast(a(0), TimestampType)
          case "string"   => a(0).cast(StringType)
          case other => throw new UnsupportedOperationException(s"xsd cast $other")
        }
      case other => throw new UnsupportedOperationException(s"builtin $other")
    }
  }

  private def colType(df: DataFrame, name: String): Option[DataType] =
    df.schema.fields.find(_.name == name).map(_.dataType)

  private def xsdOf(dt: DataType): String = dt match {
    case _: IntegerType | _: LongType | _: ShortType => Terms.XsdInt
    case _: DoubleType | _: FloatType   => Terms.XsdDouble
    case _: DecimalType                 => Terms.XsdDecimal
    case _: BooleanType                 => Terms.XsdBoolean
    case _: TimestampType | _: DateType => Terms.XsdDateTime
    case _                              => Terms.XsdString
  }
}
