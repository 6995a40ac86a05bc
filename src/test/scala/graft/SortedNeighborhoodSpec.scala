package graft

import graft.operators.SortedNeighborhood
import org.apache.spark.sql.functions._

/** Sorted-neighborhood candidate generation (d4's generator): bounded
  * candidate volume, identical-signature recall, prefix-block adjacency,
  * and the boundary join across blocks.
  */
class SortedNeighborhoodSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(sigs: Seq[(Long, Long)], window: Int = 4): Set[(Long, Long)] =
    SortedNeighborhood
      .candidates(sigs.toDF("id", "sig"), "id", "sig", window = window)
      .as[(Long, Long)].collect().toSet

  test("identical signatures within the window size all pair") {
    // 5 identical sigs, window 4: every one of the C(5,2)=10 pairs is within
    // 4 sorted positions of its partner
    val got = pairs((1L to 5L).map(i => i -> 0xABCD1234L))
    val want = (for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)).toSet
    assert(got == want)
  }

  test("candidate volume is bounded at rotations*n*window regardless of skew") {
    // Pathological skew: ALL 60 signatures identical — byte-block bucketing
    // would emit C(60,2)=1770 pairs; sorted-neighborhood stays <= 4*n*W
    val n = 60
    val got = pairs((1L to n.toLong).map(i => i -> 0x0F0F0F0FL))
    assert(got.size <= 4 * n * 4, s"got ${got.size} pairs")
    // and each id pairs only with sorted neighbors: ids adjacent in the
    // (identical-key ⇒ id-ordered) sort
    assert(got.forall { case (a, b) => b - a <= 4 })
  }

  test("near signatures sharing a rotated prefix are candidates") {
    // differ only in the low byte: rotation 0 sorts them adjacently
    val got = pairs(Seq(1L -> 0x12345600L, 2L -> 0x123456FFL, 3L -> 0x7E345600L))
    assert(got.contains((1L, 2L)))
  }

  test("boundary join pairs the tail of one prefix block with the head of the next") {
    // Two sigs in DIFFERENT 16-bit prefix blocks of every rotation, each
    // alone in its block: only the cross-block boundary join can pair them.
    val got = pairs(Seq(1L -> 0x11111111L, 2L -> 0x22222222L))
    assert(got == Set((1L, 2L)))
  }

  test("matches a brute-force global-sort reference when no block spans >= 2 boundaries") {
    // Random-ish spread signatures, dense enough that some blocks collide;
    // reference = per-rotation global sort, pair ranks within W, minus pairs
    // whose gap crosses >= 2 non-empty block boundaries (the documented
    // decomposition semantics).
    val W = 3
    val sigs = (1L to 40L).map(i => i -> ((i * 2654435761L) & 0xFFFFFFFFL))
    val ref = (0 until 4).flatMap { r =>
      val rot = sigs.map { case (id, s) =>
        id -> (((s << (8 * r)) | (s >>> (32 - 8 * r))) & 0xFFFFFFFFL)
      }.sortBy { case (id, rk) => (rk, id) }
      val blkOf = rot.map { case (_, rk) => rk >> 16 }
      for {
        i <- rot.indices
        j <- (i + 1) to math.min(i + W, rot.size - 1)
        // distinct non-empty blocks strictly between the two endpoints
        if blkOf.slice(i + 1, j).count(b => b != blkOf(i) && b != blkOf(j)) == 0
      } yield (math.min(rot(i)._1, rot(j)._1), math.max(rot(i)._1, rot(j)._1))
    }.toSet
    val got = pairs(sigs, window = W)
    assert(got == ref, s"missing=${(ref -- got).take(5)} extra=${(got -- ref).take(5)}")
  }
}
