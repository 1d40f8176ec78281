package graft.api

import graft.mapping._

/** Fixture mapping registry: presents the driver's TPC-H-ish parquet tables
  * as RDF molecules (FIXTURES.md §2), in the `urn:g:` vocabulary. Federation
  * membership is simulated with three source ids so source selection and
  * star pruning have something to select over.
  */
object TpchCatalog {
  val G = "urn:g:"

  val catalog: Catalog = Catalog(List(
    Molecule(
      rdfType = s"${G}Customer", table = "customer",
      subject = Template(s"${G}cust:{c_custkey}"),
      predicates = Map(
        s"${G}name"       -> RefMap("c_name"),
        s"${G}nation"     -> TemplateMap(Template(s"${G}nation:{c_nationkey}")),
        s"${G}acctbal"    -> RefMap("c_acctbal"),
        s"${G}mktsegment" -> RefMap("c_mktsegment")),
      source = "srcA"),
    Molecule(
      rdfType = s"${G}Order", table = "orders",
      subject = Template(s"${G}order:{o_orderkey}"),
      predicates = Map(
        s"${G}customer"      -> TemplateMap(Template(s"${G}cust:{o_custkey}")),
        s"${G}orderdate"     -> RefMap("o_orderdate"),
        s"${G}totalprice"    -> RefMap("o_totalprice"),
        s"${G}orderstatus"   -> RefMap("o_orderstatus"),
        s"${G}orderpriority" -> RefMap("o_orderpriority")),
      source = "srcA"),
    Molecule(
      rdfType = s"${G}Lineitem", table = "lineitem",
      // multi-column subject template (reference list-column case,
      // sparqltosql.py:247-258)
      subject = Template(s"${G}line:{l_orderkey}_{l_linenumber}"),
      predicates = Map(
        s"${G}order"         -> TemplateMap(Template(s"${G}order:{l_orderkey}")),
        s"${G}part"          -> TemplateMap(Template(s"${G}part:{l_partkey}")),
        s"${G}supplier"      -> TemplateMap(Template(s"${G}supp:{l_suppkey}")),
        s"${G}quantity"      -> RefMap("l_quantity"),
        s"${G}extendedprice" -> RefMap("l_extendedprice"),
        s"${G}discount"      -> RefMap("l_discount"),
        s"${G}tax"           -> RefMap("l_tax"),
        s"${G}shipdate"      -> RefMap("l_shipdate"),
        s"${G}returnflag"    -> RefMap("l_returnflag"),
        s"${G}linestatus"    -> RefMap("l_linestatus")),
      source = "srcB"),
    Molecule(
      rdfType = s"${G}Part", table = "part",
      subject = Template(s"${G}part:{p_partkey}"),
      predicates = Map(
        s"${G}name"        -> RefMap("p_name"),
        s"${G}brand"       -> RefMap("p_brand"),
        s"${G}type"        -> RefMap("p_type"),
        s"${G}size"        -> RefMap("p_size"),
        s"${G}retailprice" -> RefMap("p_retailprice")),
      source = "srcB"),
    Molecule(
      rdfType = s"${G}Supplier", table = "supplier",
      subject = Template(s"${G}supp:{s_suppkey}"),
      predicates = Map(
        s"${G}name"    -> RefMap("s_name"),
        s"${G}nation"  -> TemplateMap(Template(s"${G}nation:{s_nationkey}")),
        s"${G}acctbal" -> RefMap("s_acctbal")),
      source = "srcB"),
    Molecule(
      rdfType = s"${G}Nation", table = "nation",
      subject = Template(s"${G}nation:{n_nationkey}"),
      predicates = Map(
        s"${G}name"   -> RefMap("n_name"),
        s"${G}region" -> TemplateMap(Template(s"${G}region:{n_regionkey}"))),
      source = "srcC", broadcastHint = true),
    Molecule(
      rdfType = s"${G}Region", table = "region",
      subject = Template(s"${G}region:{r_regionkey}"),
      predicates = Map(s"${G}name" -> RefMap("r_name")),
      source = "srcC", broadcastHint = true),
    Molecule(
      rdfType = s"${G}Document", table = "documents",
      subject = Template(s"${G}doc:{doc_id}"),
      predicates = Map(
        // text carries a per-row language tag (xml:lang equivalent)
        s"${G}text"   -> RefMap("text", langColumn = Some("lang")),
        s"${G}lang"   -> RefMap("lang"),
        s"${G}source" -> RefMap("source"),
        s"${G}nchars" -> RefMap("n_chars")),
      source = "srcD")))
}
