package graft

import scala.collection.mutable

/**
 * Driver-side Scala ports of the reference's host (CPU) golden oracles —
 * these are "the reference's own test outputs" the engine must match:
 *
 *  - pagerank:  /root/reference/cpp/tests/link_analysis/pagerank_test.cpp:43-130
 *  - wcc:       /root/reference/cpp/tests/components/weakly_connected_components_test.cpp:40-70
 *  - triangles: /root/reference/cpp/tests/community/triangle_count_test.cpp:43-90
 *  - lpa:       no impl exists in the reference (SURVEY.md §2.j) — pinned
 *               synchronous LPA, most-frequent neighbor label, tie → smallest.
 *
 * All take a directed edge list (undirected graphs = both directions
 * present) and the vertex universe.
 */
object RefOracles {

  type E = (Long, Long, Double)

  /** Pull-model power iteration with dangling redistribution and L1
   * stop; optional personalization and initial guess exactly as the
   * reference host oracle (pagerank_test.cpp:43-130). */
  def pagerank(
      edges: Seq[E],
      vertices: Seq[Long],
      alpha: Double = 0.85,
      eps: Double = 1e-6,
      maxIter: Int = 100,
      personalization: Option[Map[Long, Double]] = None,
      initialGuess: Option[Map[Long, Double]] = None): Map[Long, Double] = {
    val vs = vertices.distinct.sorted
    val n = vs.size
    if (n == 0) return Map.empty
    val outw = mutable.Map[Long, Double]().withDefaultValue(0.0)
    edges.foreach { case (s, _, w) => outw(s) += w }
    val in = edges.groupBy(_._2) // dst -> incoming edges
    var pr = initialGuess match {
      case None => vs.map(v => v -> 1.0 / n).toMap
      case Some(g0) =>
        val s = g0.values.sum
        vs.map(v => v -> g0.getOrElse(v, 0.0) / s).toMap
    }
    val pSum = personalization.map(_.values.sum).getOrElse(0.0)
    var it = 0
    var done = false
    while (!done) {
      it += 1
      val danglingSum = vs.iterator.filter(outw(_) == 0.0).map(pr).sum
      val mass = danglingSum * alpha + (1.0 - alpha)
      val next = vs.map { v =>
        val gather = in.getOrElse(v, Nil).iterator
          .map { case (u, _, w) => alpha * pr(u) * (w / outw(u)) }.sum
        val tele = personalization match {
          case None => mass / n
          case Some(p) => mass * (p.getOrElse(v, 0.0) / pSum)
        }
        v -> (gather + tele)
      }.toMap
      val l1 = vs.iterator.map(v => math.abs(next(v) - pr(v))).sum
      pr = next
      done = l1 < eps || it >= maxIter
    }
    pr
  }

  /** BFS flood fill; labels canonicalized to min vertex id per component
   * (the reference compares labels up to bijection —
   * weakly_connected_components_test.cpp:178-190 — min-id is our pinned
   * canonical form). Treats edges as undirected. */
  def wcc(edges: Seq[E], vertices: Seq[Long]): Map[Long, Long] = {
    val adj = mutable.Map[Long, mutable.ArrayBuffer[Long]]()
    def add(a: Long, b: Long): Unit =
      adj.getOrElseUpdate(a, mutable.ArrayBuffer()) += b
    edges.foreach { case (s, d, _) => add(s, d); add(d, s) }
    val comp = mutable.Map[Long, Long]()
    vertices.distinct.sorted.foreach { root =>
      if (!comp.contains(root)) {
        val q = mutable.Queue(root)
        comp(root) = root
        while (q.nonEmpty) {
          val v = q.dequeue()
          adj.getOrElse(v, Nil).foreach { u =>
            if (!comp.contains(u)) { comp(u) = root; q += u }
          }
        }
      }
    }
    comp.toMap
  }

  /** Exact per-vertex triangle counts over the undirected simple graph
   * (self-loops and duplicate edges removed first, like the reference's
   * own preprocessing — triangle_count_impl.cuh:193-226). */
  def triangles(edges: Seq[E], vertices: Seq[Long]): Map[Long, Long] = {
    val nbrs = mutable.Map[Long, mutable.Set[Long]]()
    edges.foreach { case (s, d, _) =>
      if (s != d) {
        nbrs.getOrElseUpdate(s, mutable.Set()) += d
        nbrs.getOrElseUpdate(d, mutable.Set()) += s
      }
    }
    vertices.distinct.map { v =>
      val nv = nbrs.getOrElse(v, mutable.Set.empty[Long]).toSeq
      var c = 0L
      for (i <- nv.indices; j <- (i + 1) until nv.size) {
        val (a, b) = (nv(i), nv(j))
        if (nbrs(a).contains(b)) c += 1
      }
      v -> c
    }.toMap
  }

  /** Synchronous label propagation: every vertex simultaneously adopts
   * the most frequent label among its (undirected) neighbors, ties
   * broken toward the smallest label; isolated vertices keep their own.
   * Stops at fixpoint or maxIter. */
  def lpa(edges: Seq[E], vertices: Seq[Long], maxIter: Int = 10): Map[Long, Long] = {
    val adj = mutable.Map[Long, mutable.ArrayBuffer[Long]]()
    edges.foreach { case (s, d, _) =>
      if (s != d) {
        adj.getOrElseUpdate(s, mutable.ArrayBuffer()) += d
        adj.getOrElseUpdate(d, mutable.ArrayBuffer()) += s
      }
    }
    val vs = vertices.distinct.sorted
    var lbl = vs.map(v => v -> v).toMap
    var it = 0
    var changed = true
    while (changed && it < maxIter) {
      it += 1
      val next = vs.map { v =>
        val nb = adj.getOrElse(v, Nil)
        if (nb.isEmpty) v -> lbl(v)
        else {
          val freq = nb.groupBy(lbl).map { case (l, xs) => (l, xs.size) }
          val best = freq.toSeq.minBy { case (l, c) => (-c, l) }._1
          v -> best
        }
      }.toMap
      changed = next != lbl
      lbl = next
    }
    lbl
  }

  /** Canonicalize a labeling to min-member-per-class (bijection compare). */
  def canonicalize(labels: Map[Long, Long]): Map[Long, Long] = {
    val minOf = labels.toSeq.groupBy(_._2)
      .map { case (l, vs) => l -> vs.map(_._1).min }
    labels.map { case (v, l) => v -> minOf(l) }
  }
}

/** Oracles for the extended algorithm set (same reference-semantics
 * ports, driver-side). Kept separate from RefOracles's core four. */
object RefOraclesX {
  import RefOracles.E

  /** katz_centrality_impl.cuh: init 0; k' = alpha*sum_in(k*w) + beta;
   * L1 stop; optional L2 normalize. */
  def katz(edges: Seq[E], vertices: Seq[Long], alpha: Double, beta: Double,
      eps: Double, maxIter: Int, normalize: Boolean): Map[Long, Double] = {
    val vs = vertices.distinct.sorted
    val in = edges.groupBy(_._2)
    var k = vs.map(v => v -> 0.0).toMap
    var done = false
    var it = 0
    while (!done && it < maxIter) {
      it += 1
      val next = vs.map { v =>
        v -> (alpha * in.getOrElse(v, Nil).map { case (u, _, w) => k(u) * w }.sum + beta)
      }.toMap
      val l1 = vs.map(v => math.abs(next(v) - k(v))).sum
      k = next
      done = l1 < eps
    }
    if (normalize) {
      val l2 = math.sqrt(k.values.map(x => x * x).sum)
      k.map { case (v, x) => v -> x / l2 }
    } else k
  }

  /** hits_impl.cuh: init hub 1/V; auth=sum_in hub; hub=sum_out auth;
   * both /= max; stop on L1(hub); final /= sum. Weights ignored. */
  def hits(edges: Seq[E], vertices: Seq[Long], eps: Double, maxIter: Int)
      : Map[Long, (Double, Double)] = {
    val vs = vertices.distinct.sorted
    val in = edges.groupBy(_._2)
    val out = edges.groupBy(_._1)
    var hub = vs.map(v => v -> 1.0 / vs.size).toMap
    var auth = vs.map(v => v -> 0.0).toMap
    var it = 0
    var done = false
    while (!done && it < maxIter) {
      it += 1
      val prevHub = hub
      auth = vs.map(v => v -> in.getOrElse(v, Nil).map(e => prevHub(e._1)).sum).toMap
      hub = vs.map(v => v -> out.getOrElse(v, Nil).map(e => auth(e._2)).sum).toMap
      val hm = hub.values.max; val am = auth.values.max
      hub = hub.map { case (v, x) => v -> x / hm }
      auth = auth.map { case (v, x) => v -> x / am }
      done = vs.map(v => math.abs(hub(v) - prevHub(v))).sum < eps
    }
    val hs = hub.values.sum; val as = auth.values.sum
    vs.map(v => v -> (hub(v) / hs, auth(v) / as)).toMap
  }

  /** eigenvector_centrality_impl.cuh: init 1/V; c' = sum_in c*w; /= L2;
   * stop when L1 < V*eps. */
  def eigenvector(edges: Seq[E], vertices: Seq[Long], eps: Double,
      maxIter: Int): Map[Long, Double] = {
    val vs = vertices.distinct.sorted
    val in = edges.groupBy(_._2)
    var c = vs.map(v => v -> 1.0 / vs.size).toMap
    var it = 0
    var done = false
    while (!done && it < maxIter) {
      it += 1
      val old = c
      var next = vs.map { v =>
        v -> in.getOrElse(v, Nil).map { case (u, _, w) => old(u) * w }.sum
      }.toMap
      val l2 = math.sqrt(next.values.map(x => x * x).sum)
      next = next.map { case (v, x) => v -> x / l2 }
      done = vs.map(v => math.abs(next(v) - old(v))).sum < vs.size * eps
      c = next
    }
    c
  }

  /** Classic sequential k-core peel (undirected, self-loops ignored). */
  def coreNumber(edges: Seq[E], vertices: Seq[Long]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Long]]()
    edges.foreach { case (s, d, _) =>
      if (s != d) {
        adj.getOrElseUpdate(s, scala.collection.mutable.Set()) += d
        adj.getOrElseUpdate(d, scala.collection.mutable.Set()) += s
      }
    }
    val core = scala.collection.mutable.Map[Long, Long]()
    vertices.distinct.foreach(v => core(v) = 0L)
    var k = 0L
    val remaining = scala.collection.mutable.Set[Long](adj.keys.toSeq: _*)
    while (remaining.nonEmpty) {
      k += 1
      var changed = true
      while (changed) {
        val peel = remaining.filter(v =>
          adj(v).count(remaining.contains) <= k).toSeq
        changed = peel.nonEmpty
        peel.foreach { v => core(v) = k; remaining -= v }
      }
    }
    core.toMap
  }

  /** BFS hop distances from sources over directed edges. */
  def bfs(edges: Seq[E], sources: Seq[Long]): Map[Long, Long] = {
    val out = edges.groupBy(_._1)
    val dist = scala.collection.mutable.Map[Long, Long]()
    var frontier = sources.distinct
    frontier.foreach(v => dist(v) = 0L)
    var d = 0L
    while (frontier.nonEmpty) {
      d += 1
      val next = frontier.flatMap(v => out.getOrElse(v, Nil).map(_._2))
        .distinct.filterNot(dist.contains)
      next.foreach(v => dist(v) = d)
      frontier = next
    }
    dist.toMap
  }
}
