package graft

import org.scalatest.funsuite.AnyFunSuite

/** README claims that restate code facts must not drift from the code
  * (round-10 verdict: README said 191 driver-verified queries while the
  * contract was 194). The counts are derived here from SparkEntry
  * itself, so the doc can only be wrong until the next test run.
  */
class ReadmeContractSpec extends AnyFunSuite {
  private lazy val readme =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")), "UTF-8")

  test("README's driver-contract query count matches SparkEntry.queries.size") {
    val n = SparkEntry.queries.size
    val re = """driver contract: (\d+) driver-verified queries""".r
    val m = re.findFirstMatchIn(readme).getOrElse(
      fail("README.md no longer carries the 'driver contract: N driver-verified queries' line"))
    assert(m.group(1).toInt == n,
      s"README claims ${m.group(1)} driver-verified queries; SparkEntry.queries has $n")
    // the module-map line about the query programs must carry the same N
    val re2 = """the (\d+) query programs""".r
    re2.findFirstMatchIn(readme).foreach(m2 =>
      assert(m2.group(1).toInt == n,
        s"README claims ${m2.group(1)} query programs; SparkEntry.queries has $n"))
  }
}
