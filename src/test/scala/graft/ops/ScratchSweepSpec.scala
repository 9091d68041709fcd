package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pins the scratch-dir reclamation policy: the sweep deletes only
  * graft-scratch dirs whose owning pid is dead (or that predate the pid
  * marker), and never a live JVM's dirs — it deletes files, so a policy
  * regression is data loss for a concurrently running bench/test JVM.
  */
class ScratchSweepSpec extends AnyFunSuite {

  private val tmp = java.nio.file.Paths.get(sys.props("java.io.tmpdir"))

  private def mkdir(name: String): java.nio.file.Path = {
    val p = tmp.resolve(name)
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.writeString(p.resolve("f.txt"), "x")
    p
  }

  test("sweep deletes dead-owner and legacy dirs, keeps live-owner dirs") {
    val self = ProcessHandle.current().pid()
    // a pid that cannot be a live process (max_pid is far below this)
    val deadPid = 999999999L
    val dead = mkdir(s"graft_scratch_swtest_p$deadPid")
    val deadU = mkdir(s"graft_scratch_swtest_p${deadPid}_12345")
    val legacy = mkdir("graft_scratch_swtest_ab12cd")
    val live = mkdir(s"graft_scratch_swtest_p$self")
    val unrelated = mkdir("graft_unrelated_swtest")
    try {
      CoreOps.sweepDeadScratchNow()
      assert(!java.nio.file.Files.exists(dead), "dead-owner dir must go")
      assert(!java.nio.file.Files.exists(deadU), "dead-owner unique dir must go")
      assert(!java.nio.file.Files.exists(legacy), "pre-marker dir must go")
      assert(java.nio.file.Files.exists(live), "own dir must survive")
      assert(java.nio.file.Files.exists(unrelated),
        "non-graft dirs must never be touched")
    } finally Seq(dead, deadU, legacy, live, unrelated).foreach { p =>
      try {
        java.nio.file.Files.deleteIfExists(p.resolve("f.txt"))
        java.nio.file.Files.deleteIfExists(p)
      } catch { case _: java.io.IOException => () }
    }
  }
}
