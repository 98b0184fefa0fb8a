package graft

/** Byte-stability gate for the six structurally no-oracle decode
  * kernels (r18, VERDICT r17 item 5): each kernel's full raw output at
  * sf0.001 must hash to the value COMMITTED in
  * `src/main/resources/graft/golden_mm.txt`. A JDK/ImageIO/javax.sound
  * behavior change — or an unintentional kernel edit — fails here
  * loudly instead of silently shifting spec-only rows. After an
  * INTENTIONAL kernel change, regenerate with
  * `GRAFT_GOLDEN_WRITE=1 runMain graft.Verify <sfDir> <out>` and
  * commit the new lines.
  */
class GoldenHashSpec extends SparkSpec {

  test("all six decode kernels match their committed golden hash (sf0.001)") {
    val checks = graft.ext.GoldenHash.check(spark, sf())
    assert(checks.map(_.name) == graft.ext.GoldenHash.kernels)
    val bad = checks.filterNot(_.ok)
    assert(bad.isEmpty, bad.map(c =>
      s"${c.name}: computed ${c.computed}, committed " +
        s"${c.expected.getOrElse("<absent from golden_mm.txt>")}")
      .mkString("\n"))
  }

  test("golden file covers both gate scales for every kernel") {
    // sf0.001 feeds this suite; sf0.01 feeds the driver's Verify run —
    // a kernel missing either line would pass one gate vacuously
    for (tag <- Seq("sf0.001", "sf0.01"); k <- graft.ext.GoldenHash.kernels)
      assert(graft.ext.GoldenHash.committed.contains((tag, k)),
        s"golden_mm.txt missing $tag $k")
  }
}
