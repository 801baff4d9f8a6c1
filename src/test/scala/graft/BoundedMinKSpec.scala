package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BoundedMinK, KeyedValue}

/**
 * Property tests for the bounded min-k aggregation buffer: for ANY
 * sequence of inserts split into ANY partitioning merged in ANY
 * order, the result must equal sort-take-k of the whole input —
 * that's what makes the aggregation safe for partial aggregation
 * (map-side combine) on an arbitrary partitioning.
 */
class BoundedMinKSpec extends AnyFunSuite {

  private def sortTake(xs: Seq[KeyedValue], k: Int): Seq[Long] =
    xs.sortBy(x => (x.key, x.v)).take(k).map(_.v)

  private val entryGen: Gen[KeyedValue] = for {
    key <- Gen.listOfN(4, Gen.alphaNumChar).map(_.mkString)
    v <- Gen.choose(0L, 1000L)
  } yield KeyedValue(key, v)

  test("reduce-only sequence equals sort-take-k") {
    val prop = Prop.forAll(
      Gen.choose(1, 8),
      Gen.listOf(entryGen)) { (k, xs) =>
      val agg = new BoundedMinK(k)
      val buf = xs.foldLeft(agg.zero)(agg.reduce)
      agg.finish(buf) == sortTake(xs, k)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("arbitrary partition + merge order equals sort-take-k") {
    val prop = Prop.forAll(
      Gen.choose(1, 8),
      Gen.listOf(entryGen),
      Gen.choose(1, 5)) { (k, xs, parts) =>
      val agg = new BoundedMinK(k)
      val chunks = xs.grouped(math.max(1, xs.size / parts + 1)).toSeq
      val bufs = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
      // fold merges left-to-right AND right-to-left: both must agree
      val l = bufs.foldLeft(agg.zero)(agg.merge)
      val r = bufs.foldRight(agg.zero)((a, b) => agg.merge(b, a))
      agg.finish(l) == sortTake(xs, k) && agg.finish(r) == sortTake(xs, k)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("buffer never exceeds k entries") {
    val agg = new BoundedMinK(3)
    val xs = (1 to 100).map(i => KeyedValue(f"k$i%03d", i.toLong))
    val buf = xs.foldLeft(agg.zero)(agg.reduce)
    assert(buf.size == 3)
    val merged = agg.merge(buf, xs.reverse.foldLeft(agg.zero)(agg.reduce))
    assert(merged.size == 3)
  }
}
