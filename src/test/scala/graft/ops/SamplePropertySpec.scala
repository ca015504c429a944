package graft.ops

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants of the temperature-weight derivation
  * (X40): domain preservation, positivity, the alpha=1 identity,
  * monotonicity in counts, and that lowering alpha genuinely flattens
  * (the scarce/abundant weight ratio rises).
  */
object SamplePropertySpec extends Properties("TemperatureWeights") {

  private val countsGen: Gen[Map[String, Long]] =
    Gen.chooseNum(1, 8).flatMap { k =>
      Gen.listOfN(k, Gen.chooseNum(1L, 1000000L)).map { ns =>
        ns.zipWithIndex.map { case (n, i) => s"d$i" -> n }.toMap
      }
    }

  private val alphaGen: Gen[Long] = Gen.chooseNum(0L, 1000L)

  property("same domains, all weights positive") =
    forAll(countsGen, alphaGen) { (counts, a) =>
      val w = Sample.temperatureWeightsPpm(counts, a)
      w.keySet == counts.keySet && w.values.forall(_ >= 1L)
    }

  property("alpha = 1000 returns the counts themselves (exact proportions)") =
    forAll(countsGen) { counts =>
      Sample.temperatureWeightsPpm(counts, 1000L) == counts
    }

  property("weights are monotone in counts at every alpha") =
    forAll(countsGen, alphaGen) { (counts, a) =>
      val w = Sample.temperatureWeightsPpm(counts, a)
      val byCount = counts.toSeq.sortBy(_._2)
      byCount.zip(byCount.tail).forall { case ((d1, _), (d2, _)) =>
        w(d1) <= w(d2)
      }
    }

  property("lowering alpha flattens: scarce/abundant weight ratio never drops") =
    forAll(countsGen.suchThat(_.size >= 2), alphaGen, alphaGen) { (counts, a1, a2) =>
      import org.scalacheck.Prop.propBoolean
      val (lo, hi) = if (a1 <= a2) (a1, a2) else (a2, a1)
      val (small, nSmall) = counts.minBy(_._2)
      val (big, nBig) = counts.maxBy(_._2)
      val wLo = Sample.temperatureWeightsPpm(counts, lo)
      val wHi = Sample.temperatureWeightsPpm(counts, hi)
      // guard out near-degenerate cases where the true ratio gap is
      // below the ppm rounding resolution (alpha gap or count gap tiny)
      (hi - lo >= 100L && nBig >= 2L * nSmall) ==>
        // cross-multiplied to stay in integers: ratio(lo) >= ratio(hi)
        (wLo(small) * wHi(big) >= wHi(small) * wLo(big))
    }
}
