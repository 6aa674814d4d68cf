package graft.deps

import graft.ddl.Fk

/** FK dependency ordering (SURVEY.md §2.5 O1).
  *
  * Kahn topological sort parent→child over the FK DAG, with the
  * reference's cycle fallback: on a cycle, remaining tables keep their
  * original order (fill_db.py:39-61). Driver-side plain Scala — this is
  * metadata scale (85 nodes), not data scale.
  */
object Deps {

  /** Tables in an order where every FK parent precedes its children.
    * Self-referencing FKs are ignored (a table can't precede itself).
    * Stable: ties resolve in `tables` order. */
  def topoOrder(tables: Seq[String], fks: Seq[Fk]): Seq[String] = {
    val tableSet = tables.toSet
    val edges = fks
      .filter(f => f.table != f.refTable && tableSet(f.table) && tableSet(f.refTable))
      .map(f => f.refTable -> f.table).distinct
    val inDeg = scala.collection.mutable.Map(tables.map(_ -> 0): _*)
    edges.foreach { case (_, child) => inDeg(child) += 1 }
    val children = edges.groupBy(_._1).map { case (p, es) => p -> es.map(_._2) }

    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    val ready = scala.collection.mutable.ArrayBuffer(tables.filter(inDeg(_) == 0): _*)
    while (ready.nonEmpty) {
      val t = ready.remove(0)
      order += t
      children.getOrElse(t, Seq.empty).foreach { c =>
        inDeg(c) -= 1
        if (inDeg(c) == 0) ready += c
      }
    }
    // cycle fallback: remaining tables in original order (fill_db.py:55-59)
    order.toSeq ++ tables.filterNot(order.toSet)
  }

  /** Same order, grouped into waves: wave k tables depend only on waves
    * < k, so each wave's tables can generate/write fully in parallel —
    * this replaces the reference's strictly sequential table loop
    * (run_engine.py:220) with an order-free plan per wave. */
  def waves(tables: Seq[String], fks: Seq[Fk]): Seq[Seq[String]] = {
    val tableSet = tables.toSet
    val parentsOf = fks
      .filter(f => f.table != f.refTable && tableSet(f.table) && tableSet(f.refTable))
      .groupBy(_.table).map { case (t, es) => t -> es.map(_.refTable).distinct }
    val level = scala.collection.mutable.Map.empty[String, Int]
    def levelOf(t: String, seen: Set[String]): Int = level.getOrElseUpdate(t, {
      val ps = parentsOf.getOrElse(t, Seq.empty).filterNot(seen)
      if (ps.isEmpty) 0 else 1 + ps.map(p => levelOf(p, seen + t)).max
    })
    tables.groupBy(t => levelOf(t, Set(t))).toSeq.sortBy(_._1).map(_._2)
  }
}
