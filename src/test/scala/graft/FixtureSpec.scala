package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** [[RegistryCore.buildFixtureOnce]] — the /tmp fixture publish contract:
  * version-gated rebuilds, atomic publication, config-derived markers. */
class FixtureSpec extends AnyFunSuite {

  private def tempTarget(): String =
    Files.createTempDirectory("graft_fixture_spec").toString + "/fx"

  test("buildFixtureOnce builds once per version, rebuilds on a version " +
    "change, and never leaves a half-published target") {
    val path = tempTarget()
    var builds = 0
    def build(content: String)(tmp: String): Unit = {
      builds += 1
      Files.createDirectories(Paths.get(tmp))
      Files.writeString(Paths.get(s"$tmp/data.txt"), content)
    }
    RegistryCore.buildFixtureOnce(path, "v1")(build("one"))
    assert(builds == 1)
    assert(Files.readString(Paths.get(s"$path/data.txt")) == "one")
    assert(Files.readString(Paths.get(s"$path/VERSION")) == "v1")
    // same version: served from disk, the builder never runs
    RegistryCore.buildFixtureOnce(path, "v1")(build("one-again"))
    assert(builds == 1)
    assert(Files.readString(Paths.get(s"$path/data.txt")) == "one")
    // changed version (config edit / data regenerated): rebuilt in place
    RegistryCore.buildFixtureOnce(path, "v2")(build("two"))
    assert(builds == 2)
    assert(Files.readString(Paths.get(s"$path/data.txt")) == "two")
    assert(Files.readString(Paths.get(s"$path/VERSION")) == "v2")
    // no .build.* temp litter survives a successful publish
    val parent = Paths.get(path).getParent
    import scala.jdk.CollectionConverters._
    assert(!Files.list(parent).iterator().asScala
      .exists(_.getFileName.toString.contains(".build.")))
  }

  test("a racing same-version publish wins and the loser's build is " +
    "discarded, not layered over it") {
    val path = tempTarget()
    // simulate: builder B starts (sees no fixture), builder A publishes
    // v1 mid-build; B's publish must keep A's copy
    RegistryCore.buildFixtureOnce(path, "v1") { tmp =>
      Files.createDirectories(Paths.get(tmp))
      Files.writeString(Paths.get(s"$tmp/data.txt"), "A")
    }
    // B re-enters with the same version but different (late) bytes; the
    // fresh re-check inside must discard B's tmp and keep A
    RegistryCore.buildFixtureOnce(path, "v1") { tmp =>
      Files.createDirectories(Paths.get(tmp))
      Files.writeString(Paths.get(s"$tmp/data.txt"), "B")
    }
    assert(Files.readString(Paths.get(s"$path/data.txt")) == "A")
  }

  test("knnStandingVersion is derived from the build config and the " +
    "source-data fingerprint") {
    val v = RegistryCore.knnStandingVersion("/root/testdata/sf0.001")
    // the actual knnDescent/srpBucketed parameters appear in the marker
    assert(v.contains("knnDescent(k5,r2)") && v.contains("srp(p8,t4)"))
    // the embeddings fingerprint is folded in, and differs across dirs
    assert(v.contains("src="))
    assert(v != RegistryCore.knnStandingVersion("/root/testdata/sf0.01"))
  }
}
