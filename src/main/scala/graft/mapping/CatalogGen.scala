package graft.mapping

import org.apache.spark.sql.{DataFrame, functions => F}

/** RDF-MT catalog generation by probing the data sources — the Spark-native
  * rebuild of the reference's `scripts/create_rdfmts.py` +
  * `ontario/rdfmt/__init__.py`: typed-concept discovery (`:115`
  * `get_typed_concepts` — here: one class per table, the tabular-lake case),
  * per-concept predicate discovery (`:364` `get_predicates` — here: the
  * column set), cardinality stats (`:670` `get_cardinality` — row counts
  * feeding broadcast hints), and inter-source link discovery (`:791`
  * `create_inter_ds_links` — here: foreign-key probing by key-pattern
  * matching plus exact containment checks).
  *
  * Structure is *discovered*; vocabulary is *configured* (`prefix`,
  * `aliases`, `source`), exactly the split the reference makes between
  * probing and its `config.json` templates.
  *
  * Probing is a deploy-time operation (the reference pages SPARQL endpoints
  * for minutes): each table costs one aggregate job for counts/keys plus
  * one distinct-domain anti-join per foreign-key candidate. The containment
  * joins project the candidate/key columns only, so at warehouse scale each
  * probe shuffles one distinct key domain, never a full table.
  */
object CatalogGen {

  /** Vocabulary + probe knobs. `aliases` maps table name → the short name
    * used inside subject URIs (`customer` → `cust`); unlisted tables use
    * the singular table name. */
  final case class GenOptions(
      prefix: String = "urn:g:",
      aliases: Map[String, String] = Map.empty,
      source: String => String = _ => "default",
      /** tables at or below this probed row count are marked broadcast-safe
        * (dimension molecules — their joins never shuffle). */
      broadcastRowThreshold: Long = 1000L)

  private val IdLike = "(?i).*(key|id|number|seq)$".r

  private final case class TableProbe(
      table: String,
      columns: List[String],
      rowCount: Long,
      /** id-like column → distinct count */
      distincts: Map[String, Long])

  def fromTables(tables: Map[String, DataFrame],
                 opts: GenOptions = GenOptions()): Catalog = {
    val probes = tables.toList.sortBy(_._1).map { case (t, df) =>
      t -> probeTable(t, df)
    }.toMap

    // phase A — single-column subject keys: the first id-like column whose
    // distinct count equals the row count (key-pattern sampling, reference
    // get_typed_concepts' instance probing collapsed to one aggregate)
    val singleKey: Map[String, String] = probes.flatMap { case (t, p) =>
      p.columns.find(c => IdLike.matches(c) &&
        p.distincts.get(c).contains(p.rowCount)).map(t -> _)
    }

    // phase B — inter-table links: column c of T references U's key k when
    // the names agree after prefix-stripping (key-pattern match) AND every
    // distinct c value exists among k's values (exact containment probe)
    val fks: Map[(String, String), String] = (for {
      (t, p) <- probes.toList
      c <- p.columns if IdLike.matches(c) && !singleKey.get(t).contains(c)
      (u, k) <- singleKey if u != t
      if stripPrefix(p.columns, c) == stripPrefix(probes(u).columns, k)
      if contained(tables(t), c, tables(u), k)
    } yield (t, c) -> u).toMap

    // phase C — composite keys for tables with no unique single column:
    // the fact-table convention, parent foreign key + first ordinal id-like
    // column (order key + line number, not whichever pair happens to be
    // most distinct in a sample)
    val subjectKeys: Map[String, List[String]] = probes.map { case (t, p) =>
      t -> (singleKey.get(t) match {
        case Some(k) => List(k)
        case None =>
          val fkCols = p.columns.filter(c => fks.contains((t, c)))
          val ordinal = p.columns.find(c =>
            IdLike.matches(c) && !fks.contains((t, c)))
          (fkCols.headOption.toList ++ ordinal.toList) match {
            case Nil  => p.columns.take(1) // degenerate: first column
            case keys => keys
          }
      })
    }

    def aliasOf(t: String): String = opts.aliases.getOrElse(t, singular(t))
    def subjectTemplate(t: String): Template = Template(
      s"${opts.prefix}${aliasOf(t)}:" +
        subjectKeys(t).map(c => s"{$c}").mkString("_"))

    val molecules = probes.toList.sortBy(_._1).map { case (t, p) =>
      val keyCols = subjectKeys(t).toSet
      val preds = p.columns.flatMap { c =>
        fks.get((t, c)) match {
          case Some(target) =>
            // link predicate named after the target concept; object built
            // with the *target's* subject template over the local column
            val tpl = Template(s"${opts.prefix}${aliasOf(target)}:{$c}")
            Some(s"${opts.prefix}${singular(target)}" -> (TemplateMap(tpl): TermMap))
          case None if keyCols.contains(c) => None // subject position only
          case None =>
            Some(s"${opts.prefix}${predName(p.columns, c)}" -> (RefMap(c): TermMap))
        }
      }.toMap
      Molecule(
        rdfType = s"${opts.prefix}${className(t)}",
        table = t,
        subject = subjectTemplate(t),
        predicates = preds,
        source = opts.source(t),
        broadcastHint = p.rowCount <= opts.broadcastRowThreshold,
        cardinality = p.rowCount)
    }
    Catalog(molecules)
  }

  /** One aggregate job: row count + distinct count of every id-like column. */
  private def probeTable(t: String, df: DataFrame): TableProbe = {
    val cols = df.columns.toList
    val idCols = cols.filter(IdLike.matches)
    val aggs = F.count(F.lit(1)).as("__n") ::
      idCols.map(c => F.count_distinct(F.col(c)).as(s"__d_$c"))
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    TableProbe(t, cols, row.getLong(0),
      idCols.zipWithIndex.map { case (c, i) => c -> row.getLong(i + 1) }.toMap)
  }

  /** Exact containment: no distinct value of `T.c` missing from `U.k`.
    * Distinct-projected anti-join — the probe shuffles key domains only. */
  private def contained(t: DataFrame, c: String, u: DataFrame, k: String): Boolean =
    t.select(F.col(c)).na.drop().distinct()
      .join(u.select(F.col(k).as(c)).distinct(), Seq(c), "left_anti")
      .isEmpty

  /** TPC-H style column naming: strip the table's single-letter prefix when
    * every column shares it (`c_name` → `name`). */
  private def stripPrefix(all: List[String], c: String): String = {
    val shared = all.forall(_.matches("^[a-z]_.+")) &&
      all.map(_.charAt(0)).distinct.size == 1
    if (shared) c.substring(2) else c
  }

  /** Predicate local name: prefix-stripped column, underscores removed
    * (`n_chars` → `nchars`). */
  private def predName(all: List[String], c: String): String =
    stripPrefix(all, c).replace("_", "")

  private def singular(t: String): String = t.stripSuffix("s")

  private def className(t: String): String = singular(t).capitalize
}
