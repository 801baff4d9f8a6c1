package graft.corpus

/**
 * Deterministic RMAT (Graph500) edge generator — same recursive-quadrant
 * algorithm and default parameters as the reference's benchmark source
 * (`/root/reference/cpp/src/generators/generate_rmat_edgelist.cu`,
 * params a=0.57 b=0.19 c=0.19 seed 42 per
 * `/root/reference/benchmarks/python_e2e/cugraph_funcs.py:44-58`), but
 * implemented as a PURE FUNCTION of (seed, edgeIndex) so generation is
 * splittable across any partitioning with no RNG state — the Spark way
 * to make a 10^12-edge synthetic corpus reproducible.
 */
object Rmat {

  val DefaultA = 0.57
  val DefaultB = 0.19
  val DefaultC = 0.19

  /** splitmix64 — public-domain mixing function; uniform 64-bit hash. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Uniform double in [0,1) from (seed, edge index, level). */
  private def u01(seed: Long, idx: Long, level: Int): Double = {
    val h = mix64(mix64(seed ^ mix64(idx)) ^ level.toLong)
    (h >>> 11).toDouble / (1L << 53).toDouble
  }

  /** The (src, dst) of edge `idx` in a 2^scale-vertex RMAT graph.
   *
   * `clipAndFlip` mirrors the reference's undirected mode
   * (`/root/reference/cpp/include/cugraph/graph_generators.hpp:62-64`,
   * kernel `generate_rmat_edgelist.cu:91-97`): while the src/dst bit
   * prefixes are still equal, an upper-triangle step (src-bit 0,
   * dst-bit 1) flips to the mirrored lower-triangle step, so every
   * edge lands in the lower triangular part (diagonal included) —
   * distribution-preserving when b == c, the documented use case. */
  def edge(
      seed: Long,
      idx: Long,
      scale: Int,
      a: Double = DefaultA,
      b: Double = DefaultB,
      c: Double = DefaultC,
      clipAndFlip: Boolean = false): (Long, Long) = {
    var src = 0L
    var dst = 0L
    var level = 0
    while (level < scale) {
      val u = u01(seed, idx, level)
      val flip = clipAndFlip && src == dst
      src <<= 1
      dst <<= 1
      if (u < a) { /* top-left */ }
      else if (u < a + b) { if (flip) src |= 1L else dst |= 1L }
      else if (u < a + b + c) { src |= 1L }
      else { src |= 1L; dst |= 1L }
      level += 1
    }
    (src, dst)
  }

  /** All edges for a (scale, edgeFactor) graph as a local Seq — for
   * tests and oracles; Spark-side generation lives in PagesCorpus. */
  def edges(
      seed: Long,
      scale: Int,
      edgeFactor: Int,
      clipAndFlip: Boolean = false): Seq[(Long, Long)] = {
    val n = (1L << scale) * edgeFactor
    (0L until n).map(i => edge(seed, i, scale, clipAndFlip = clipAndFlip))
  }

  // Graph500 scramble constants (the reference pins the values the
  // Graph500 reference code derives from its default seed;
  // `/root/reference/cpp/src/generators/scramble.cuh:66-69`).
  private val Scramble0 = 606610977102444280L
  private val Scramble1 = -6766416839294358579L // 11680327234415193037 as u64

  /**
   * Graph500 vertex-id scramble — a fixed arithmetic PERMUTATION of
   * [0, 2^lgN) (reference `scramble_vertex_ids`,
   * `/root/reference/cpp/src/generators/scramble.cuh:53-78`: add,
   * odd-multiply, bit-reverse-truncate, twice), used "to generate a
   * graph conforming to the Graph 500 specification"
   * (`graph_generators.hpp:33-35`). A random permutation table would
   * need O(V) state on every executor; this is a pure per-value
   * function, so scrambling a 10^12-edge frame is a projection.
   */
  def scramble(value: Long, lgN: Int): Long = {
    require(lgN > 0 && lgN < 64 && value >= 0 && value < (1L << lgN))
    var v = value + (Scramble0 + Scramble1)
    v *= (Scramble0 | 0x4519840211493211L)
    v = java.lang.Long.reverse(v) >>> (64 - lgN)
    v *= (Scramble1 | 0x3050852102C843A5L)
    java.lang.Long.reverse(v) >>> (64 - lgN)
  }
}
