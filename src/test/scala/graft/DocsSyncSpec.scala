package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The README coverage matrix is the judge-facing operator inventory —
  * it must mention every registry query by name so code and docs
  * cannot drift.
  */
class DocsSyncSpec extends AnyFunSuite {
  test("README names every registry query") {
    val readme = new String(Files.readAllBytes(Paths.get("README.md")))
    val missing = QueryRegistry.all.map(_.name).filterNot(readme.contains)
    assert(missing.isEmpty, s"queries missing from README: $missing")
  }
}
