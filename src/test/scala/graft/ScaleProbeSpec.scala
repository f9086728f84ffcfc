package graft

import org.apache.spark.sql.functions._

/** Pins the ScaleProbe perturbation-ring invariants. Review r17 caught
  * a real bug of this class: a 9-letter ring made copy 9 byte-identical
  * to copy 0 at copies=10, handing every document one cross-copy EXACT
  * duplicate — the probe then measured the data's C(n,2) dup blowup,
  * not the engine. These specs make that bug unreintroducible: every
  * supported rotation must be a distinct non-identity bijection, and
  * the perturbed text must round-trip (so each copy's internal dup
  * structure is isomorphic to the original's).
  */
class ScaleProbeSpec extends SparkSpec {
  import ScaleProbe.{perturb, ring, rot}

  test("ring is duplicate-free (rotation stays a bijection)") {
    assert(ring.distinct == ring)
    assert(ring == ring.toLowerCase)
  }

  test("rotations 1..copies-1 are distinct non-identities for all supported copies") {
    // main guards copies <= ring.length; under that bound every pair of
    // copies k != j must map the same letter differently, else two
    // copies collide into exact cross-copy duplicates
    val rots = (0 until ring.length).map(rot)
    assert(rots.distinct.length == ring.length)
    rots.tail.foreach(r => assert(r != ring, s"identity rotation: $r"))
  }

  test("perturb is a bijection on text: inverse rotation restores the original") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      "The quick brown fox jumps over the lazy dog! 42 times.",
      "MixedCase WITH CAPS and punctuation, digits 123 — unchanged?",
      "short", "").toDF("text")
    (1 until ring.length by 5).foreach { k =>
      // applying rotation k then rotation (len - k) composes to identity
      val roundTrip = docs
        .select(perturb(col("text"), k).as("p"), col("text"))
        .select(perturb(col("p"), ring.length - k).as("rt"), col("text"))
        .where(col("rt") =!= col("text"))
      assert(roundTrip.count() == 0L, s"rotation $k did not round-trip")
    }
  }

  test("distinct copies produce distinct text for letter-bearing docs") {
    val spark2 = spark
    import spark2.implicits._
    val doc = Seq("the common english letters appear here").toDF("text")
    val variants = (0 until ring.length).map { k =>
      doc.select(perturb(col("text"), k)).head().getString(0)
    }
    assert(variants.distinct.length == ring.length)
  }
}
