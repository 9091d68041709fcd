package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pins the scratch-dir reclamation policy: the sweep deletes only
  * graft-scratch dirs whose owning pid is dead, or markerless dirs that
  * have sat untouched long past any job's lifetime — and never a live
  * JVM's dirs, never outside the temp root, and never throws into its
  * caller. It deletes files, so a policy regression is data loss for a
  * concurrently running bench/test JVM.
  */
class ScratchSweepSpec extends AnyFunSuite {

  private val tmp = java.nio.file.Paths.get(sys.props("java.io.tmpdir"))

  private def mkdir(name: String): java.nio.file.Path = {
    val p = tmp.resolve(name)
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.writeString(p.resolve("f.txt"), "x")
    p
  }

  private def setAge(p: java.nio.file.Path, ageMs: Long): Unit =
    java.nio.file.Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - ageMs))

  private def cleanup(ps: Seq[java.nio.file.Path]): Unit = ps.foreach { p =>
    try {
      java.nio.file.Files.deleteIfExists(p.resolve("f.txt"))
      java.nio.file.Files.deleteIfExists(p)
    } catch { case _: java.io.IOException => () }
  }

  test("sweep deletes dead-owner and aged markerless dirs, keeps live-owner dirs") {
    val self = ProcessHandle.current().pid()
    // a pid that cannot be a live process (max_pid is far below this)
    val deadPid = 999999999L
    val dead = mkdir(s"graft_scratch_swtest_p$deadPid")
    val deadU = mkdir(s"graft_scratch_swtest_p${deadPid}_12345")
    val legacyOld = mkdir("graft_scratch_swtest_ab12cd")
    setAge(legacyOld, CoreOps.MarkerlessReclaimAgeMs + 3600 * 1000)
    val live = mkdir(s"graft_scratch_swtest_p$self")
    val unrelated = mkdir("graft_unrelated_swtest")
    try {
      CoreOps.sweepDeadScratchNow()
      assert(!java.nio.file.Files.exists(dead), "dead-owner dir must go")
      assert(!java.nio.file.Files.exists(deadU), "dead-owner unique dir must go")
      assert(!java.nio.file.Files.exists(legacyOld),
        "aged pre-marker dir must go")
      assert(java.nio.file.Files.exists(live), "own dir must survive")
      assert(java.nio.file.Files.exists(unrelated),
        "non-graft dirs must never be touched")
    } finally cleanup(Seq(dead, deadU, legacyOld, live, unrelated))
  }

  test("fresh markerless dirs survive (upgrade-window race)") {
    // an old-version JVM (no pid marker in its paths) may still be
    // running and mid-read on this dir — only age proves abandonment
    val fresh = mkdir("graft_scratch_swtest_fresh00")
    try {
      CoreOps.sweepDeadScratchNow()
      assert(java.nio.file.Files.exists(fresh),
        "recent markerless dir must survive the sweep")
    } finally cleanup(Seq(fresh))
  }

  test("a malformed >19-digit pid marker neither throws nor is deleted fresh") {
    // pid.toLong on 25 digits throws NumberFormatException — the sweep
    // must treat the entry as markerless (age rule), not propagate and
    // break every scratch allocation in the JVM
    val weird = mkdir("graft_scratch_swtest_p9999999999999999999999999")
    try {
      CoreOps.sweepDeadScratchNow() // must not throw
      assert(java.nio.file.Files.exists(weird),
        "unparseable marker = markerless; fresh ⇒ kept")
      setAge(weird, CoreOps.MarkerlessReclaimAgeMs + 3600 * 1000)
      CoreOps.sweepDeadScratchNow()
      assert(!java.nio.file.Files.exists(weird),
        "unparseable marker + aged ⇒ reclaimed")
    } finally cleanup(Seq(weird))
  }

  test("sweep unlinks symlinked scratch entries without following them") {
    val deadPid = 999999998L
    val target = mkdir("graft_symlink_target_swtest")
    val link = tmp.resolve(s"graft_scratch_swtest_link_p$deadPid")
    java.nio.file.Files.deleteIfExists(link)
    java.nio.file.Files.createSymbolicLink(link, target)
    try {
      CoreOps.sweepDeadScratchNow()
      assert(!java.nio.file.Files.exists(link,
        java.nio.file.LinkOption.NOFOLLOW_LINKS), "link itself must go")
      assert(java.nio.file.Files.exists(target.resolve("f.txt")),
        "link target's contents must NOT be deleted")
    } finally {
      try java.nio.file.Files.deleteIfExists(link)
      catch { case _: java.io.IOException => () }
      cleanup(Seq(target))
    }
  }
}
