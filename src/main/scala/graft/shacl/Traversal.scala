package graft.shacl

/** Inter-shape evaluation-order planning: seed-shape heuristics and DFS/BFS
  * traversal of the shape dependency graph. Semantics ported from the
  * reference (ShapeSchema.get_starting_point, core/ShapeSchema.py:72-128;
  * GraphTraversal, core/GraphTraversal.py:12-72) — this layer sits ABOVE
  * Catalyst as driver-side orchestration; verdicts are invariant to it
  * (the test grid asserts planner-invariance).
  */
object Traversal extends Enumeration {
  val DFS, BFS = Value

  final case class Heuristics(target: Boolean, degree: String, properties: String)
  /** Reference default: `TARGET IN BIG` (app/__init__.py:14-18). */
  val DefaultHeuristics: Heuristics = Heuristics(target = true, degree = "in", properties = "big")

  def startingPoints(schema: ShapeSchema, h: Heuristics): Seq[String] = {
    var candidates: Seq[Shape] = Seq.empty

    if (h.target)
      candidates = schema.shapes.filter(s => s.targetClass.isDefined || s.targetNode.isDefined)

    def byMax(ps: Seq[Shape], f: Shape => Int): Seq[Shape] =
      if (ps.size > 1) { val m = ps.map(f).max; ps.filter(f(_) == m) } else ps
    def indeg(ps: Seq[Shape]) = byMax(ps, s => schema.inDegree(s.id))
    def outdeg(ps: Seq[Shape]) = byMax(ps, s => schema.outDegree(s.id))
    def orElseAll(ps: Seq[Shape]) = if (ps.nonEmpty) ps else schema.shapes

    h.degree match {
      case "in"    => candidates = indeg(orElseAll(candidates))
      case "out"   => candidates = outdeg(orElseAll(candidates))
      case "inout" => candidates = outdeg(indeg(orElseAll(candidates)))
      case "outin" => candidates = indeg(outdeg(orElseAll(candidates)))
      case _       =>
    }

    h.properties match {
      case "small" =>
        candidates = orElseAll(candidates)
        if (candidates.size > 1) {
          val m = candidates.map(_.constraints.size).min
          candidates = candidates.filter(_.constraints.size == m)
        }
      case "big" =>
        if (candidates.size > 1) {
          val m = candidates.map(_.constraints.size).max
          candidates = candidates.filter(_.constraints.size == m)
        }
      case _ =>
    }
    candidates.map(_.id)
  }

  /** Traverse the dependency graph, restarting per connected component
    * (GraphTraversal.traverse_graph). DFS prioritizes forward dependencies and
    * falls back to reverse edges while unvisited nodes remain; BFS treats the
    * graph as undirected. */
  def nodeOrder(schema: ShapeSchema, algo: Value, start: String): Seq[String] = {
    val deps = schema.dependencies
    val rdeps = schema.reverseDependencies
    val all = schema.shapes.map(_.id)
    val visited = scala.collection.mutable.ArrayBuffer[String]()

    def dfs(node: String): Unit = {
      if (!visited.contains(node)) {
        visited += node
        deps.getOrElse(node, Nil).foreach(dfs)
        if (visited.size != all.size)
          rdeps.getOrElse(node, Nil).foreach(dfs)
      } else if (visited.size != all.size) {
        deps.getOrElse(node, Nil).foreach(n => if (!visited.contains(n)) dfs(n))
        rdeps.getOrElse(node, Nil).foreach(n => if (!visited.contains(n)) dfs(n))
      }
    }

    def bfs(node: String): Unit = {
      val queue = scala.collection.mutable.Queue(node)
      visited += node
      while (queue.nonEmpty) {
        val n = queue.dequeue()
        (deps.getOrElse(n, Nil) ++ rdeps.getOrElse(n, Nil)).foreach { nb =>
          if (!visited.contains(nb)) { visited += nb; queue.enqueue(nb) }
        }
      }
    }

    var remaining = all.toBuffer
    var sp = start
    while (remaining.nonEmpty) {
      if (algo == DFS) dfs(sp) else bfs(sp)
      remaining = remaining.filterNot(visited.contains)
      if (remaining.nonEmpty) sp = remaining.head
    }
    visited.toSeq
  }

  def plan(schema: ShapeSchema, algo: Value = DFS, h: Heuristics = DefaultHeuristics): Seq[String] = {
    val starts = startingPoints(schema, h)
    val start = if (starts.nonEmpty) starts.head else schema.shapes.head.id
    nodeOrder(schema, algo, start)
  }
}
