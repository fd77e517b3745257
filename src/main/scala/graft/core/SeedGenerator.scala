package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** The reference's golden-corpus generator
  * (`mapreduce/seed/CreateDataSet.java`) re-expressed, with two
  * deliberate upgrades: a seed (the reference uses bare
  * `Math.random()`, so its corpora are unreproducible snapshots) and
  * byte-exact size accounting (the reference polls `File.length` after
  * flushes). The reference's sampling quirk IS preserved:
  * `((int)(random*10)) % 3` makes sentence 0 land with probability
  * 4/10 vs 3/10 for the others (`CreateDataSet.java:43`).
  *
  *   runMain graft.core.SeedGenerator <bytes> <outFile> [seed]
  *
  * Prints the per-sentence golden counts exactly like the reference
  * (`CreateDataSet.java:57-58`), which is the oracle for a word-count
  * run over the generated file.
  */
object SeedGenerator {

  val Sentences: Seq[String] = Seq(
    "Sand e Kleber sao de Goaiania ",
    "Reinaldo e Karina sao de Fortaleza ",
    "e a o ")

  /** Generate at least `targetBytes` of corpus; returns the golden
    * per-sentence counts.
    */
  def generate(targetBytes: Long, outFile: String, seed: Long = 42L): Array[Long] = {
    val rnd     = new java.util.Random(seed)
    val counts  = new Array[Long](3)
    val out     = Files.newBufferedWriter(Paths.get(outFile), StandardCharsets.UTF_8)
    try {
      var written = 0L
      while (written < targetBytes) {
        val idx = (rnd.nextDouble() * 10).toInt % 3 // reference quirk: 4/3/3 in 10
        out.write(Sentences(idx))
        written += Sentences(idx).length
        counts(idx) += 1
      }
    } finally out.close()
    counts
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SeedGenerator <bytes> <outFile> [seed]")
    val counts = generate(args(0).toLong, args(1),
      args.drop(2).headOption.map(_.toLong).getOrElse(42L))
    Sentences.zip(counts).foreach { case (s, c) =>
      println(s"String: ${s}Count: $c")
    }
  }
}
