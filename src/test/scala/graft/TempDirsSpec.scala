package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[TempDirs.memoized]]'s publish protocol: the `_OK` marker rides
  * the atomic rename (never a window where a published root lacks it),
  * repeat calls reuse without rebuilding, and a stale UNPUBLISHED root —
  * crash residue — self-heals instead of poisoning every later call.
  */
class TempDirsSpec extends AnyFunSuite {

  private def freshKeyFile(tag: String): String = {
    val f = Files.createTempFile(s"tempdirs_key_$tag", ".txt")
    Files.write(f, s"key-$tag".getBytes("UTF-8"))
    f.toFile.deleteOnExit()
    f.toString
  }

  test("publish is marker-atomic and repeat calls reuse the built artifact") {
    val key = freshKeyFile("reuse")
    var builds = 0
    def run() = TempDirs.memoized("graft_tdspec_a", key) { tmp =>
      builds += 1
      Files.write(tmp.resolve("payload.txt"), "built".getBytes("UTF-8"))
    }
    val r1 = run()
    assert(Files.exists(r1.resolve("_OK")), "published root must carry _OK")
    assert(Files.exists(r1.resolve("payload.txt")))
    val r2 = run()
    assert(r1 == r2 && builds == 1, "second call must reuse, not rebuild")
  }

  test("a stale root WITHOUT _OK (crash residue) is deleted and rebuilt") {
    val key = freshKeyFile("heal")
    // plant the poisoned state: the memo root exists, unpublished
    val ident = s"$key|${Files.getLastModifiedTime(Paths.get(key)).toMillis}" +
      s"|${Files.size(Paths.get(key))}"
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(ident.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val root = Paths.get(System.getProperty("java.io.tmpdir"), s"graft_tdspec_b_$md5")
    Files.createDirectories(root)
    Files.write(root.resolve("partial.txt"), "torn".getBytes("UTF-8"))
    assert(!Files.exists(root.resolve("_OK")))
    val r = TempDirs.memoized("graft_tdspec_b", key) { tmp =>
      Files.write(tmp.resolve("payload.txt"), "healed".getBytes("UTF-8"))
    }
    assert(r == root)
    assert(Files.exists(r.resolve("_OK")) && Files.exists(r.resolve("payload.txt")),
      "the stale root must be replaced by a published rebuild")
    assert(!Files.exists(r.resolve("partial.txt")), "crash residue must be gone")
  }
}
