package graft.algos

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{Lineage, LinkGraph}
import graft.core.LinkGraph.{DST, ID, SRC, WEIGHT}

/**
 * ForceAtlas2 layout (reference
 * `/root/reference/cpp/include/cugraph/algorithms.hpp:197`, kernels
 * `cpp/src/layout/legacy/fa2_kernels.cuh` + `exact_repulsion.cuh`):
 * iterative 2D force-directed embedding with FA2's adaptive global
 * speed. Force model mirrors the reference kernels:
 *
 *  - mass = out-degree (`exact_fa2.cuh:96`);
 *  - repulsion between every vertex pair u!=v: magnitude
 *    scalingRatio * m_u * m_v / d (computed as factor = k*m*m/d^2
 *    applied to the displacement vector, `exact_repulsion.cuh:58`);
 *  - attraction once per undirected edge (the canonical src<dst copy,
 *    `fa2_kernels.cuh:49`): linear in distance (lin-log optional),
 *    scaled by weight^edgeWeightInfluence, divided by the canonical
 *    source's mass when outboundAttractionDistribution, and by the
 *    compensation coefficient sum(mass)/n (`exact_fa2.cuh:105-110`);
 *  - gravity toward the origin: mass*g (strong: mass*g*scaling*d);
 *  - per-vertex swing/traction vs the previous displacement feed the
 *    FA2 global speed adaptation (`fa2_kernels.cuh:240-275`), then
 *    pos += d * speed / (1 + sqrt(speed * swing)).
 *
 * Spark shape: attraction is the standard co-partitioned edge gather
 * (same as PageRank). Repulsion is all-pairs, so there are two paths:
 * an EXACT path (guarded crossJoin, like the exact-ANN baseline) for
 * small vertex sets, and a GRID path for scale — bin vertices into a
 * bounding-box grid (<= maxCells cells), aggregate per-cell mass +
 * centroid, apply far-field repulsion vertex-vs-cell through ONE
 * broadcast array column (no row amplification: `functions.aggregate`
 * over the cell array), and exact near-field within the 3x3 cell
 * neighborhood via a bucket join — the reference's Barnes-Hut variant
 * (`barnes_hut.cuh`) plays the same role on a quadtree. The grid
 * re-fits the bounding box every iteration so occupancy tracks the
 * layout; a pathologically dense cell degrades the near-field join
 * quadratically (documented trade: the quadtree fixes it, the grid
 * keeps every superstep a plain join + aggregate).
 *
 * Determinism: positions, previous displacements, and the global
 * swing/traction scalars are micro-rounded (1e-6) every iteration, so
 * float-sum ordering noise (~1e-13) cannot compound and the unrolled
 * SQL oracle reproduces the evolution exactly. Initial positions are
 * a deterministic hash spread over [-100,100]^2 (the reference seeds
 * uniform_random_fill(seed=0), `exact_fa2.cuh:85`); callers may pass
 * explicit start positions like the reference's x_start/y_start.
 */
object ForceAtlas2 {

  final case class Config(
      maxIter: Int = 50,
      scalingRatio: Double = 2.0,
      gravity: Double = 1.0,
      strongGravity: Boolean = false,
      linLog: Boolean = false,
      outboundAttraction: Boolean = true,
      edgeWeightInfluence: Double = 1.0,
      jitterTolerance: Double = 1.0,
      /** <= this many vertices: exact all-pairs repulsion. */
      exactThreshold: Long = 2048,
      /** grid resolution bound: G*G cells with G^2 <= maxCells. */
      maxCells: Int = 1024,
      /** Cells holding more vertices than this leave the exact
       * near-field join and act as centroids instead (see
       * gridRepulsion) — bounds the 3x3 bucket join when positions
       * collapse into few cells. */
      maxCellOccupancy: Long = 1L << 16)

  private val EPS = 1e-9

  /** Micro-round for cross-engine determinism. */
  private def mr(c: Column): Column = round(c * 1e6, 0) / 1e6
  private def mrd(x: Double): Double = math.round(x * 1e6) / 1e6

  /** Layout `g` (expected symmetrized); returns (id, x, y). */
  def run(
      g: LinkGraph,
      cfg: Config = Config(),
      start: Option[DataFrame] = None): DataFrame = {
    val spark = g.spark
    val nParts = g.numPartitions

    // Mass = out-degree (exact_fa2.cuh:96); vertices with no out-edges
    // keep mass 0 like the reference's overwritten fill.
    val mass = g.edges.groupBy(col(SRC).as(ID))
      .agg(count(lit(1)).cast("double").as("m"))
    val verts0 = g.vertices.join(mass, Seq(ID), "left")
      .select(col(ID), coalesce(col("m"), lit(0.0)).as("m"))

    // Deterministic spread over [-100,100]^2 (hash residues; the
    // reference fills uniform random with a fixed seed).
    val init = start.getOrElse(
      verts0.select(col(ID),
        mr((pmod(col(ID) * 37 + 11, lit(193L)) / 96.0 - 1.0) * 100.0).as("x"),
        mr((pmod(col(ID) * 53 + 29, lit(181L)) / 90.0 - 1.0) * 100.0).as("y")))
    var pos = Lineage.materialize(
      verts0.join(init.select(col(ID), col("x"), col("y")), Seq(ID))
        .select(col(ID), col("m"),
          col("x").cast("double").as("x"), col("y").cast("double").as("y"),
          lit(0.0).as("odx"), lit(0.0).as("ody"))
        .repartition(nParts, col(ID)))

    val nRow = pos.df.agg(count(lit(1)), sum(col("m"))).head()
    val n = nRow.getLong(0)
    require(n > 0, "empty graph")
    val massSum = nRow.getDouble(1)
    val coef =
      if (cfg.outboundAttraction) massSum / n.toDouble else 1.0

    // Scale-adaptive layout (guide §2): the iteration loop runs ~4
    // aggregation stages per superstep, and on a fixture-sized graph a
    // fixed session partition count spends the whole wall clock
    // scheduling near-empty tasks (measured: 14.5k tasks / 13 s for a
    // 36-vertex layout at 32 partitions). Derive the loop's partition
    // count from the measured vertex count — ~1k vertices per
    // partition, clamped to the session layout for big graphs, where
    // this is a no-op.
    val pEff = math.max(1L, math.min(nParts.toLong, n / 1024L + 1L)).toInt
    if (pEff < nParts) {
      val rp = Lineage.materialize(pos.df.repartition(pEff, col(ID)))
      pos.release(); pos = rp
    }

    // Canonical one-copy-per-undirected-edge table for attraction
    // (fa2_kernels.cuh:49 skips dst <= src).
    val canon = Lineage.materialize(
      g.edges.filter(col(SRC) < col(DST))
        .select(col(SRC), col(DST),
          pow(col(WEIGHT), lit(cfg.edgeWeightInfluence)).as("w"))
        .repartition(pEff, col(SRC)))

    graft.core.SparkTuning.withShufflePartitions(spark, pEff) {
    var speed = 1.0
    var speedEff = 1.0
    var it = 0
    while (it < cfg.maxIter) {
      it += 1
      val repel = if (n <= cfg.exactThreshold) exactRepulsion(pos.df, cfg)
        else gridRepulsion(pos.df, cfg)

      // Attraction gather: join positions to both endpoints of the
      // canonical edges, push force contributions to each side.
      val ps = pos.df.select(col(ID).as(SRC), col("x").as("sx"),
        col("y").as("sy"), col("m").as("sm"))
      val pd = pos.df.select(col(ID).as(DST), col("x").as("dx_"), col("y").as("dy_"))
      val e = canon.df.join(ps, Seq(SRC)).join(pd, Seq(DST))
      val xd = col("sx") - col("dx_")
      val yd = col("sy") - col("dy_")
      val linFactor = lit(-coef) * col("w")
      val factor0 =
        if (cfg.linLog) {
          val dist = sqrt(xd * xd + yd * yd + lit(EPS))
          linFactor * log(lit(1.0) + dist) / dist
        } else linFactor
      val factor =
        if (cfg.outboundAttraction) factor0 / col("sm") else factor0
      val attr = e.select(col(SRC).as(ID), (xd * factor).as("ax"), (yd * factor).as("ay"))
        .unionByName(
          e.select(col(DST).as(ID), (-xd * factor).as("ax"), (-yd * factor).as("ay")))
        .groupBy(ID).agg(sum("ax").as("ax"), sum("ay").as("ay"))

      // Total displacement force per vertex: repulsion + attraction +
      // gravity (gravity folds into the attraction sum like
      // apply_gravity writing into attract_x/y).
      val joined = pos.df
        .join(repel, Seq(ID), "left")
        .join(attr, Seq(ID), "left")
        .select(col(ID), col("m"), col("x"), col("y"), col("odx"), col("ody"),
          (coalesce(col("rx"), lit(0.0)) + coalesce(col("ax"), lit(0.0))).as("fx0"),
          (coalesce(col("ry"), lit(0.0)) + coalesce(col("ay"), lit(0.0))).as("fy0"))
      val gravFactor =
        if (cfg.strongGravity) lit(cfg.scalingRatio * cfg.gravity) * col("m")
        else col("m") * lit(cfg.gravity) /
          sqrt(col("x") * col("x") + col("y") * col("y") + lit(EPS))
      val forces = Lineage.materialize(
        joined.select(col(ID), col("m"), col("x"), col("y"),
          col("odx"), col("ody"),
          mr(col("fx0") - col("x") * gravFactor).as("fx"),
          mr(col("fy0") - col("y") * gravFactor).as("fy")),
        eager = false)

      // Swing / traction vs previous displacement -> global speed.
      val swT = forces.df.select(
        (col("m") * sqrt(
          pow(col("odx") - col("fx"), 2) + pow(col("ody") - col("fy"), 2)))
          .as("sw"),
        (lit(0.5) * col("m") * sqrt(
          pow(col("odx") + col("fx"), 2) + pow(col("ody") + col("fy"), 2)))
          .as("tr"))
        .agg(sum("sw"), sum("tr")).head()
      val s = mrd(swT.getDouble(0))
      val t = mrd(swT.getDouble(1))

      // adapt_speed (fa2_kernels.cuh:243-275), scalar arithmetic on
      // the micro-rounded globals.
      val estimatedJt = 0.05 * math.sqrt(n.toDouble)
      val minJt = math.sqrt(estimatedJt)
      var jt = cfg.jitterTolerance *
        math.max(minJt, math.min(10.0, estimatedJt * t / (n.toDouble * n)))
      if (t > 0 && s / t > 2.0) {
        if (speedEff > 0.05) speedEff *= 0.5
        jt = math.max(jt, cfg.jitterTolerance)
      }
      val targetSpeed = if (s == 0) Double.MaxValue else jt * speedEff * t / s
      if (s > jt * t) { if (speedEff > 0.05) speedEff *= 0.7 }
      else if (speed < 1000) speedEff *= 1.3
      speed = mrd(speed + math.min(targetSpeed - speed, 0.5 * speed))
      speedEff = mrd(speedEff)

      // pos += f * speed / (1 + sqrt(speed * swing_v)).
      val swingV = col("m") * sqrt(
        pow(col("odx") - col("fx"), 2) + pow(col("ody") - col("fy"), 2))
      val fct = lit(speed) / (lit(1.0) + sqrt(lit(speed) * swingV))
      val next = Lineage.materialize(
        forces.df.select(col(ID), col("m"),
          mr(col("x") + col("fx") * fct).as("x"),
          mr(col("y") + col("fy") * fct).as("y"),
          col("fx").as("odx"), col("fy").as("ody")),
        eager = false)
      next.df.count()
      pos.release(); forces.release()
      pos = next
    }
    canon.release()
    val out = pos.df.select(col(ID), col("x"), col("y")).cache()
    out.count()
    pos.release()
    out
    } // withShufflePartitions
  }

  /** Exact all-pairs repulsion (exact_repulsion.cuh:44-63) — guarded
   * crossJoin, small-n only (the reference's non-Barnes-Hut mode). */
  private def exactRepulsion(pos: DataFrame, cfg: Config): DataFrame = {
    val a = pos.select(col(ID), col("x"), col("y"), col("m"))
    val b = pos.select(col(ID).as("jid"), col("x").as("jx"),
      col("y").as("jy"), col("m").as("jm"))
    val xd = col("x") - col("jx")
    val yd = col("y") - col("jy")
    val d2 = xd * xd + yd * yd + lit(EPS)
    a.crossJoin(b).filter(col(ID) =!= col("jid"))
      .select(col(ID),
        (xd * lit(cfg.scalingRatio) * col("m") * col("jm") / d2).as("px"),
        (yd * lit(cfg.scalingRatio) * col("m") * col("jm") / d2).as("py"))
      .groupBy(ID).agg(mr(sum("px")).as("rx"), mr(sum("py")).as("ry"))
  }

  /** Grid-binned repulsion: far field against per-cell (mass,
   * centroid) aggregates carried as ONE broadcast array column; near
   * field exact over the 3x3 cell neighborhood via a bucket join.
   *
   * Occupancy guard: a cell holding more than cfg.maxCellOccupancy
   * vertices (positions collapsed into few cells — the shape that
   * would make the 3x3 bucket join quadratic) is EXCLUDED from the
   * exact near-field join and instead acts on its 3x3 neighborhood
   * as a centroid super-vertex, exactly like a far cell (own-cell
   * contribution subtracts the vertex's own mass). Below the bound
   * the arithmetic is bit-identical to the unguarded plan: the
   * guard's extra aggregate terms multiply by a zero mass. */
  private def gridRepulsion(pos: DataFrame, cfg: Config): DataFrame = {
    val grid = math.max(2, math.sqrt(cfg.maxCells.toDouble).toInt)
    val bb = pos.agg(min("x"), max("x"), min("y"), max("y")).head()
    val (x0, x1, y0, y1) =
      (bb.getDouble(0), bb.getDouble(1), bb.getDouble(2), bb.getDouble(3))
    val wx = math.max((x1 - x0) / grid, 1e-6)
    val wy = math.max((y1 - y0) / grid, 1e-6)
    val binned = pos.select(col(ID), col("x"), col("y"), col("m"),
      least(floor((col("x") - lit(x0)) / lit(wx)), lit(grid - 1)).cast("int").as("cx"),
      least(floor((col("y") - lit(y0)) / lit(wy)), lit(grid - 1)).cast("int").as("cy"))

    // Per-cell aggregates, folded to a single broadcast array row.
    val cells = binned.groupBy("cx", "cy").agg(
      sum("m").as("cm"),
      (sum(col("m") * col("x")) / sum("m")).as("ccx"),
      (sum(col("m") * col("y")) / sum("m")).as("ccy"),
      count(lit(1)).as("cnt"))
    val cellArr = broadcast(
      cells.agg(collect_list(struct(col("cx"), col("cy"),
        col("cm"), col("ccx"), col("ccy"), col("cnt"))).as("cells")))

    // Centroid field in ONE array pass per vertex: cells at Chebyshev
    // distance > 1 always act as centroid super-vertices (far field);
    // cells within the 3x3 neighborhood act as centroids ONLY when
    // overfull (occupancy guard), with the vertex's own mass removed
    // from its own cell's contribution. Everything else contributes
    // an exact 0.0 here and is handled by the exact near join below.
    val far = binned.crossJoin(cellArr).select(col(ID), col("cx"), col("cy"),
      col("x"), col("y"), col("m"),
      aggregate(
        col("cells"),
        struct(lit(0.0).as("fx"), lit(0.0).as("fy")),
        (acc, c) => {
          val cheby =
            greatest(abs(c("cx") - col("cx")), abs(c("cy") - col("cy")))
          val ownCell = c("cx") === col("cx") && c("cy") === col("cy")
          val em = when(cheby > 1, c("cm"))
            .when(c("cnt") > cfg.maxCellOccupancy,
              when(ownCell, c("cm") - col("m")).otherwise(c("cm")))
            .otherwise(lit(0.0))
          val xd = col("x") - c("ccx")
          val yd = col("y") - c("ccy")
          val d2 = xd * xd + yd * yd + lit(EPS)
          struct(
            (acc("fx") + xd * lit(cfg.scalingRatio) * col("m") * em / d2).as("fx"),
            (acc("fy") + yd * lit(cfg.scalingRatio) * col("m") * em / d2).as("fy"))
        }).as("ff"))
      .select(col(ID), col("ff.fx").as("px"), col("ff.fy").as("py"))

    // Near field: exact pairs within the 3x3 neighborhood; overfull
    // cells are represented by their centroid above, so they leave
    // the join's build side and the per-bucket fanout stays bounded
    // by 9 * maxCellOccupancy rows per probing vertex.
    val probes = binned.select(col(ID), col("x"), col("y"), col("m"),
        explode(sequence(col("cx") - 1, col("cx") + 1)).as("ncx"), col("cy"))
      .select(col(ID), col("x"), col("y"), col("m"), col("ncx"),
        explode(sequence(col("cy") - 1, col("cy") + 1)).as("ncy"))
    val cellCnt = cells.select(col("cx").as("ncx"), col("cy").as("ncy"),
      col("cnt"))
    val others = binned.select(col("cx").as("ncx"), col("cy").as("ncy"),
      col(ID).as("jid"), col("x").as("jx"), col("y").as("jy"), col("m").as("jm"))
      .join(broadcast(cellCnt), Seq("ncx", "ncy"))
      .filter(col("cnt") <= cfg.maxCellOccupancy)
      .drop("cnt")
    val xd = col("x") - col("jx")
    val yd = col("y") - col("jy")
    val d2 = xd * xd + yd * yd + lit(EPS)
    val near = probes.join(others, Seq("ncx", "ncy"))
      .filter(col(ID) =!= col("jid"))
      .select(col(ID),
        (xd * lit(cfg.scalingRatio) * col("m") * col("jm") / d2).as("px"),
        (yd * lit(cfg.scalingRatio) * col("m") * col("jm") / d2).as("py"))

    near.unionByName(far)
      .groupBy(ID).agg(mr(sum("px")).as("rx"), mr(sum("py")).as("ry"))
  }
}
