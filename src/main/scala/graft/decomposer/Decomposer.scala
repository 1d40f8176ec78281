package graft.decomposer

import graft.algebra._
import graft.mapping.{Catalog, Molecule}

/** Star decomposition + source selection.
  *
  * Reimplements the reference's `MediatorCatalyst` decomposition
  * (`/root/reference/ontario/mediator/Decomposer.py:120-335`): group the
  * BGP's triples by subject term into star-shaped subqueries, then match
  * each star to candidate molecules — by rdf:type constant when present
  * (`checkRDFTypeStatemnt`, Decomposer.py:184-207), else by predicate-index
  * intersection (`find_rdfmt_by_preds`, config/__init__.py:96-114).
  * Pure Scala, no Spark dependency — unit-testable in isolation.
  */
final case class Star(
    subject: Term,
    triples: List[TriplePattern],
    molecules: List[Molecule]) {
  def vars: Set[String] = triples.flatMap(_.vars).toSet
}

object Decomposer {

  /** Group BGP triples into stars by subject (bgp_stars,
    * Decomposer.py:120-136) preserving first-appearance order. */
  def decompose(triples: List[TriplePattern], catalog: Catalog): List[Star] = {
    val order = scala.collection.mutable.LinkedHashMap[Term, List[TriplePattern]]()
    triples.foreach { t =>
      order(t.s) = order.getOrElse(t.s, Nil) :+ t
    }
    order.map { case (subj, ts) => makeStar(subj, ts, catalog) }.toList
  }

  private def makeStar(subj: Term, ts: List[TriplePattern], catalog: Catalog): Star = {
    val typeConst: Option[String] = ts.collectFirst {
      case TriplePattern(_, Iri(Terms.RdfType), Iri(cls)) => cls
    }
    val constPreds: Set[String] = ts.collect {
      case TriplePattern(_, Iri(p), _) if p != Terms.RdfType => p
    }.toSet
    val candidates: List[Molecule] = typeConst match {
      case Some(cls) =>
        catalog.byType.getOrElse(cls, Nil)
          .filter(m => constPreds.subsetOf(m.predicates.keySet))
      case None =>
        // variable predicates in the star ⇒ every molecule stays a candidate
        // (the reference's wrappers enumerate all triple maps then)
        val hasVarPred = ts.exists(t => t.p.isInstanceOf[Var])
        if (hasVarPred && constPreds.isEmpty) catalog.molecules
        else catalog.findByPreds(constPreds)
    }
    if (candidates.isEmpty)
      throw new IllegalArgumentException(
        s"no molecule matches star on $subj with predicates $constPreds" +
          typeConst.fold("")(c => s" (rdf:type <$c>)"))
    Star(subj, ts, candidates)
  }

  /** Star-to-star connection vars (getStarsConnections, Decomposer.py:138-170):
    * shared variables between two stars, used to pick a join order that
    * avoids cartesian products (Tree.py:322-323 shareAtLeastOneVar). */
  def sharedVars(a: Star, b: Star): Set[String] = a.vars intersect b.vars
}
