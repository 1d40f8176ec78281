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
    * Decomposer.py:120-136) preserving first-appearance order, then prune
    * candidates by join-link consistency. */
  def decompose(triples: List[TriplePattern], catalog: Catalog): List[Star] = {
    val order = scala.collection.mutable.LinkedHashMap[Term, List[TriplePattern]]()
    triples.foreach { t =>
      order(t.s) = order.getOrElse(t.s, Nil) :+ t
    }
    prune(order.map { case (subj, ts) => makeStar(subj, ts, catalog) }.toList)
  }

  /** Link-consistency pruning (the reference's RDF-MT range pruning,
    * `Decomposer.py:209-287` via `getMTsConnection` ranges): when a
    * variable is produced as a template URI by one star's predicate and
    * consumed as another star's subject (or produced by two stars), the
    * template signatures must agree — candidates whose signatures cannot
    * match any counterpart are dropped. Runs to fixpoint. A variable with
    * any non-template (RefMap) usage is left unpruned. */
  private def prune(stars: List[Star]): List[Star] = {
    import graft.mapping.{TemplateMap, Molecule}
    var current = stars.toArray

    // usages of each var: Left(starIdx) = subject of that star;
    // Right((starIdx, pred)) = object of pred in that star
    val usages = scala.collection.mutable.Map[String, List[Either[Int, (Int, String)]]]()
    current.zipWithIndex.foreach { case (st, i) =>
      st.subject match {
        case Var(v) => usages(v) = usages.getOrElse(v, Nil) :+ Left(i)
        case _      => ()
      }
      st.triples.foreach {
        case TriplePattern(_, Iri(p), Var(v)) if p != Terms.RdfType =>
          usages(v) = usages.getOrElse(v, Nil) :+ Right((i, p))
        case _ => ()
      }
    }

    def sigsOf(m: Molecule, usage: Either[Int, (Int, String)]): Option[String] =
      usage match {
        case Left(_) => Some(m.subject.signature)
        case Right((_, p)) => m.predicates.get(p) match {
          case Some(TemplateMap(t)) => Some(t.signature)
          case _                    => None // RefMap/constant: unconstrained
        }
      }

    var changed = true
    var rounds = 0
    while (changed && rounds < 8) {
      changed = false
      rounds += 1
      usages.foreach { case (_, us) =>
        if (us.size > 1) {
          // per-usage signature sets; skip the var if any usage is unconstrained
          val perUsage = us.map { u =>
            val idx = u.fold(identity, _._1)
            val sigs = current(idx).molecules.flatMap(m => sigsOf(m, u)).toSet
            (u, idx, sigs,
              current(idx).molecules.exists(m => sigsOf(m, u).isEmpty))
          }
          if (!perUsage.exists(_._4)) {
            val common = perUsage.map(_._3).reduce(_ intersect _)
            perUsage.foreach { case (u, idx, _, _) =>
              val kept = current(idx).molecules.filter(m =>
                sigsOf(m, u).forall(common.contains))
              if (kept.size != current(idx).molecules.size) {
                if (kept.isEmpty)
                  throw new IllegalArgumentException(
                    s"join-link pruning left no molecule for star on ${current(idx).subject}")
                current(idx) = current(idx).copy(molecules = kept)
                changed = true
              }
            }
          }
        }
      }
    }
    current.toList
  }

  private def makeStar(subj: Term, ts: List[TriplePattern], catalog: Catalog): Star = {
    val typeConst: Option[String] = ts.collectFirst {
      case TriplePattern(_, Iri(Terms.RdfType), Iri(cls)) => cls
    }
    val constPreds: Set[String] = ts.collect {
      case TriplePattern(_, Iri(p), _) if p != Terms.RdfType => p
    }.toSet
    val base: List[Molecule] = typeConst match {
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
    // constant subject: only molecules whose subject template can produce it
    val candidates = subj match {
      case Iri(u) => base.filter(m => m.subject.invert(u).isDefined)
      case _      => base
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
