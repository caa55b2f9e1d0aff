package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.PosixFilePermissions
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import scala.sys.process._

/** Executes the aspell subprocess protocol and the seclists git
  * clone/pull protocol for real — against a stub `aspell` binary and a
  * local `file://` git remote, since the container has neither aspell
  * nor network egress. What these pin is the engine's side of each
  * protocol: argument vectors, stdout parsing, blank-line policy,
  * content hashing, clone-vs-ff-pull dispatch, cache layout.
  */
class SourcesLiveSpec extends AnyFunSuite with SparkTestBase {

  private def writeExecutable(dir: Path, name: String, body: String): Path = {
    val p = dir.resolve(name)
    Files.write(p, body.getBytes("UTF-8"))
    Files.setPosixFilePermissions(p, PosixFilePermissions.fromString("rwxr-xr-x"))
    p
  }

  test("aspell protocol: version probe, dict listing, master dump (stub binary)") {
    val dir = Files.createTempDirectory("aspell-stub")
    val stub = writeExecutable(dir, "aspell",
      """#!/bin/sh
        |case "$1" in
        |  version) echo "@(#) International Ispell Version 3.1.20 (but really Aspell 0.60.8)";;
        |  dicts) printf "en\nen\nde\n";;
        |  -d) if [ "$3" = "dump" ] && [ "$4" = "master" ]
        |      then printf "apple\nbanana\n\ncherry\n"
        |      else exit 2; fi;;
        |  *) exit 1;;
        |esac
        |""".stripMargin)
    val prev = sys.props.get("graft.aspell.cmd")
    sys.props("graft.aspell.cmd") = stub.toString
    try {
      assert(AspellSource.isAvailable)
      assert(AspellSource.listLanguages() == Seq("de", "en"))
      val src = WordSource.parse("aspell:en")
      assert(src.name == "aspell-en")
      val words = src.words(spark).collect().toSet
      assert(words == Set("apple", "banana", "cherry")) // blank dropped (P5)
      assert(src.contentHash.exists(_.length == 64)) // blake3 of the dump
    } finally {
      prev match {
        case Some(v) => sys.props("graft.aspell.cmd") = v
        case None => sys.props.remove("graft.aspell.cmd")
      }
    }
  }

  test("aspell isAvailable is false (not an exception) when the binary is missing") {
    val prev = sys.props.get("graft.aspell.cmd")
    sys.props("graft.aspell.cmd") = "/nonexistent/graft-aspell-missing"
    try assert(!AspellSource.isAvailable)
    finally prev match {
      case Some(v) => sys.props("graft.aspell.cmd") = v
      case None => sys.props.remove("graft.aspell.cmd")
    }
  }

  test("seclists protocol: shallow clone, list, scan, ff-only update (local remote)") {
    val upstream = Files.createTempDirectory("seclists-upstream")
    def git(args: String*): Unit = {
      val cmd = Seq("git", "-C", upstream.toString,
        "-c", "user.email=t@example.invalid", "-c", "user.name=t") ++ args
      assert(Process(cmd).!(ProcessLogger(_ => ())) == 0, cmd.mkString(" "))
    }
    git("init", "-q")
    Files.createDirectories(upstream.resolve("Passwords"))
    Files.write(upstream.resolve("Passwords/common.txt"),
      "123456\npassword\n\nqwerty\n".getBytes("UTF-8"))
    git("add", ".")
    git("commit", "-q", "-m", "seed")

    val cache = Files.createTempDirectory("seclists-cache").resolve("repo")
    val prevRepo = sys.props.get("graft.seclists.repo")
    val prevDir = sys.props.get("graft.seclists.dir")
    sys.props("graft.seclists.repo") = s"file://$upstream"
    sys.props("graft.seclists.dir") = cache.toString
    try {
      // words() before pull(): the documented failure mode
      val notPulled = intercept[IllegalStateException] {
        WordSource.parse("seclists:Passwords/common.txt").words(spark)
      }
      assert(notPulled.getMessage.contains("pull"))

      SecListsSource.pull() // clone path
      assert(SecListsSource.list() == Seq("Passwords/common.txt"))
      assert(SecListsSource.path("Passwords/common.txt")
        == s"$cache/Passwords/common.txt")
      val src = WordSource.parse("seclists:Passwords/common.txt")
      assert(src.name == "common")
      assert(src.words(spark).collect().toSet ==
        Set("123456", "password", "qwerty")) // blank dropped (P5)
      val hash1 = src.contentHash.get

      // upstream grows; pull() takes the ff-only update path
      Files.write(upstream.resolve("Passwords/common.txt"),
        "123456\npassword\n\nqwerty\nletmein\n".getBytes("UTF-8"))
      git("commit", "-q", "-am", "grow")
      SecListsSource.pull()
      val src2 = WordSource.parse("seclists:Passwords/common.txt")
      assert(src2.words(spark).collect().toSet ==
        Set("123456", "password", "qwerty", "letmein"))
      assert(src2.contentHash.get != hash1) // fingerprint tracks content
    } finally {
      def restore(k: String, v: Option[String]): Unit = v match {
        case Some(x) => sys.props(k) = x
        case None => sys.props.remove(k)
      }
      restore("graft.seclists.repo", prevRepo)
      restore("graft.seclists.dir", prevDir)
    }
  }

  // ---------------------------------------------------------------------
  // LIVE variants — auto-enabled when the real capability exists in the
  // environment, visibly CANCELED (assume()) otherwise. The stub tests
  // above always run; these prove the same protocols against the real
  // thing when a deploy has it (TESTDATA.md §live-paths).
  // ---------------------------------------------------------------------

  test("LIVE aspell: real binary on PATH drives the full dump protocol") {
    assume(sys.props.get("graft.aspell.cmd").isEmpty && AspellSource.isAvailable,
      "no real aspell binary on PATH — stub test above covers the protocol")
    val langs = AspellSource.listLanguages()
    assume(langs.nonEmpty, "aspell present but no dictionaries installed")
    val src = WordSource.parse(s"aspell:${langs.head}")
    assert(src.name == s"aspell-${langs.head}")
    val words = src.words(spark).cache()
    try {
      assert(words.count() > 0)
      import org.apache.spark.sql.functions.{col, length}
      assert(words.filter(length(col("value")) === 0).count() == 0) // P5
      assert(src.contentHash.exists(_.length == 64))
    } finally { words.unpersist(); () }
  }

  test("LIVE http: real egress fetch when GRAFT_LIVE_HTTP_URL is set") {
    val url = sys.env.get("GRAFT_LIVE_HTTP_URL")
    assume(url.isDefined,
      "set GRAFT_LIVE_HTTP_URL to a small wordlist URL to enable")
    val src = WordSource.parse(url.get)
    assert(src.isInstanceOf[UrlSource])
    assert(src.words(spark).count() > 0)
    assert(src.contentHash.exists(_.length == 64))
  }

  test("LIVE seclists: real upstream clone when GRAFT_LIVE_SECLISTS=true") {
    // several-GB clone — opt-in even where egress exists
    assume(sys.env.get("GRAFT_LIVE_SECLISTS").contains("true"),
      "set GRAFT_LIVE_SECLISTS=true to clone the real SecLists repo")
    SecListsSource.pull()
    val files = SecListsSource.list()
    assert(files.nonEmpty)
    assert(WordSource.parse(s"seclists:${files.head}").words(spark).count() >= 0)
  }
}
