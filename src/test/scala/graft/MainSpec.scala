package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.config.GraftConfig

/** E2E CLI tests in the style of the reference's binary tests
  * (tests/integration.rs:668-1047) — drive Main.run and assert the exact
  * formatted output.
  */
class MainSpec extends AnyFunSuite with SparkTestBase {

  private def runCli(args: String*): (Int, String, String) = {
    spark // ensure the shared session exists so Main's getOrCreate reuses it
    val out = new ByteArrayOutputStream(); val err = new ByteArrayOutputStream()
    val code = Main.run(args.toList, new PrintStream(out), new PrintStream(err))
    (code, out.toString.trim, err.toString.trim)
  }

  private def wordFile(words: String*): String = {
    val f = Files.createTempFile("cli-words", ".txt")
    Files.writeString(f, words.mkString("\n"))
    f.toString
  }

  test("build → query → info round-trip through the CLI (README quick-start)") {
    val db = Files.createTempDirectory("cli-db").toString + "/pw.db"
    val f = wordFile("password", "hello", "")

    val (bc, bout, _) = runCli("build", f, "-o", db, "-a", "sha256", "--quiet")
    assert(bc == 0 && bout == s"Wrote 2 records to $db")

    val full = "5e884898da28047151d0e56f8dc6292773603d0d6aabbdd62a11ef721d1542d8"
    val (qc, qout, _) = runCli("query", full, "-d", db, "--quiet")
    assert(qc == 0)
    val srcName = java.nio.file.Paths.get(f).getFileName.toString.stripSuffix(".txt")
    assert(qout == s"password (sha256, $srcName)\nFound 1 result(s)")

    val (ic, iout, _) = runCli("info", "-d", db, "--quiet")
    assert(ic == 0 && iout.startsWith("Total records: 2"))
    val (jc, jout, _) = runCli("info", "-d", db, "-f", "json", "--quiet")
    assert(jc == 0 && jout.contains("\"total_records\":2") &&
      jout.contains("\"algorithms\":[\"sha256\"]"))
  }

  test("dry-run prints counts without writing (integration.rs:668-707)") {
    val db = Files.createTempDirectory("cli-db").toString + "/dry.db"
    val f = wordFile("hello", "hello", "world")
    val (c, out, _) = runCli("build", f, "-o", db, "-a", "md5", "-a", "sha256",
      "--dry-run", "--quiet")
    assert(c == 0)
    assert(out == "Total words: 3\nUnique words: 2\nRecords to create: 4")
    assert(!Files.exists(java.nio.file.Paths.get(db)))
  }

  test("bad invocations exit 2 with usage; bad hex is rejected") {
    assert(runCli()._1 == 2)
    assert(runCli("build")._1 == 2)
    val (c, _, err) = runCli("query", "zz", "-d", "/nope", "--quiet")
    assert(c == 2 && err.contains("invalid hex"))
  }

  test("incremental rebuild is skipped until --force") {
    val db = Files.createTempDirectory("cli-db").toString + "/inc.db"
    val f = wordFile("alpha", "beta")
    assert(runCli("build", f, "-o", db, "--quiet")._2.startsWith("Wrote"))
    val (c2, out2, _) = runCli("build", f, "-o", db, "--append", "--quiet")
    assert(c2 == 0 && out2.contains("skipped"))
    val (c3, out3, _) = runCli("build", f, "-o", db, "--append", "--force", "--quiet")
    assert(c3 == 0 && out3.startsWith("Wrote"))
  }

  test("config layering: file < env < flags (config.rs:97-144)") {
    val dir = Files.createTempDirectory("cfg")
    Files.writeString(dir.resolve(".graft.toml"),
      "[s3]\nendpoint = \"https://file.example\"\naccess_key_id = \"file-key\"\n")
    val cfg = GraftConfig.load(
      flags = Map("s3.access_key_id" -> "flag-key"),
      env = Map("GRAFT_S3_ENDPOINT" -> "https://env.example"),
      cwd = dir, home = Files.createTempDirectory("home"))
    assert(cfg.get("s3.endpoint") == Some("https://env.example")) // env > file
    assert(cfg.get("s3.access_key_id") == Some("flag-key")) // flag > all
    val s3a = cfg.s3aSettings
    assert(s3a("fs.s3a.endpoint") == "https://env.example")
    assert(s3a("fs.s3a.access.key") == "flag-key")
    assert(s3a("fs.s3a.path.style.access") == "true")
  }

  test("toml subset parser: sections, comments, quotes") {
    val parsed = GraftConfig.parse(Seq(
      "# comment", "", "top = 1", "[r2]", "bucket = \"b\"", "flag=raw"))
    assert(parsed == Map("top" -> "1", "r2.bucket" -> "b", "r2.flag" -> "raw"))
  }
}
