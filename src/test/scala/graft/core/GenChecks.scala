package graft.core

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property driver over ScalaCheck Gen (the
  * scalatest<->scalacheck bridge artifact isn't in the offline cache).
  */
trait GenChecks {
  def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    collectSamples(g, n).foreach(f)

  def collectSamples[A](g: Gen[A], n: Int): Seq[A] = {
    var seed = Seed(42L)
    (1 to n).flatMap { _ =>
      val out = g.apply(Gen.Parameters.default, seed)
      seed = seed.next
      out
    }
  }
}
