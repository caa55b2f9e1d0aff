package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.length
import graft.core.Blake3
import graft.core.Hashers.hex

/** Pluggable wordlist sources with the reference's spec grammar
  * (reference src/source/mod.rs:21-43):
  *   "-" → stdin · http(s)://… → URL · seclists:path · aspell:lang ·
  *   file:path or bare path → file.
  *
  * Distributed-friendly sources (file, seclists) become
  * `spark.read.textFile` scans; inherently driver-local ones (stdin, URL,
  * aspell) are fetched once on the driver and parallelized. Every source
  * drops blank lines (P5) and exposes a blake3 content fingerprint for
  * incremental builds (S11, reference file.rs:43-56) — None for stdin.
  */
sealed trait WordSource {
  def name: String
  def words(spark: SparkSession): Dataset[String]
  def contentHash: Option[String]

  protected def nonEmpty(ds: Dataset[String]): Dataset[String] = {
    import ds.sparkSession.implicits._
    ds.filter(length($"value") > 0)
  }

  protected def fromLines(spark: SparkSession, lines: Seq[String]): Dataset[String] = {
    import spark.implicits._
    // driver-held lists can still be large (aspell dumps) — spread them
    spark.createDataset(lines)
      .repartition(math.max(1, math.min(32, lines.size / 50000 + 1)))
      .filter(length($"value") > 0)
  }
}

object WordSource {

  /** S1: source spec dispatch (reference src/source/mod.rs:21-43). */
  def parse(spec: String): WordSource = spec match {
    case "-" => StdinSource
    case s if s.startsWith("http://") || s.startsWith("https://") => UrlSource(s)
    case s if s.startsWith("seclists:") => SecListsSource(s.stripPrefix("seclists:"))
    case s if s.startsWith("aspell:") => AspellSource(s.stripPrefix("aspell:"))
    case s if s.startsWith("file:") => FileSource(s.stripPrefix("file:"))
    case s => FileSource(s)
  }

  /** F6: name derivation — file stem (reference src/source/file.rs:17-22). */
  def fileStem(path: String): String = {
    val base = Paths.get(path).getFileName.toString
    val dot = base.lastIndexOf('.')
    if (dot > 0) base.substring(0, dot) else base
  }
}

/** S2: file line scan (reference src/source/file.rs:31-41). */
final case class FileSource(path: String) extends WordSource {
  def name: String = WordSource.fileStem(path)
  def words(spark: SparkSession): Dataset[String] =
    nonEmpty(spark.read.textFile(path))
  def contentHash: Option[String] =
    if (Files.exists(Paths.get(path)))
      Some(hex(Blake3.hash(Files.readAllBytes(Paths.get(path)))))
    else None
}

/** S3: stdin line scan (reference src/source/stdin.rs:26-34); unbounded-ish,
  * so no content hash.
  */
case object StdinSource extends WordSource {
  def name: String = "stdin"
  def words(spark: SparkSession): Dataset[String] =
    fromLines(spark, scala.io.Source.stdin.getLines().toSeq)
  def contentHash: Option[String] = None
}

/** S4: HTTP scan (reference src/source/url.rs:14-58): eager blocking GET,
  * body cached, non-2xx bodies accepted (the reference never calls
  * `error_for_status` — pinned by its test integration.rs:521-539).
  */
final case class UrlSource(url: String) extends WordSource {
  @transient private lazy val body: String = UrlSource.fetch(url)

  def name: String = {
    // F6: last path segment before extension (reference url.rs:16-21)
    val seg = url.split('/').lastOption.filter(_.nonEmpty).getOrElse("url")
    val dot = seg.lastIndexOf('.')
    if (dot > 0) seg.substring(0, dot) else seg
  }
  def words(spark: SparkSession): Dataset[String] =
    fromLines(spark, body.linesIterator.toSeq)
  def contentHash: Option[String] =
    Some(hex(Blake3.hash(body.getBytes("UTF-8"))))
}

object UrlSource {
  private[sources] def fetch(url: String): String = {
    val client = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).GET().build()
    client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString()).body()
  }
}

/** S5/S8: aspell dictionary dump via subprocess (reference
  * src/source/aspell.rs:15-64, 72-106). The executable resolves through
  * the `graft.aspell.cmd` system property (default `aspell`) so deploys
  * can pin a path — and so the subprocess protocol is testable against a
  * stub binary where aspell isn't installed (SourcesLiveSpec).
  */
final case class AspellSource(lang: String) extends WordSource {
  @transient private lazy val dump: String =
    scala.sys.process.Process(Seq(AspellSource.cmd, "-d", lang, "dump", "master")).!!

  def name: String = s"aspell-$lang"
  def words(spark: SparkSession): Dataset[String] =
    fromLines(spark, dump.linesIterator.toSeq)
  def contentHash: Option[String] = Some(hex(Blake3.hash(dump.getBytes("UTF-8"))))
}

object AspellSource {
  private[sources] def cmd: String =
    sys.props.getOrElse("graft.aspell.cmd", "aspell")
  def isAvailable: Boolean =
    try scala.sys.process.Process(Seq(cmd, "version"))
      .!(scala.sys.process.ProcessLogger(_ => ())) == 0
    catch { case _: java.io.IOException => false }
  def listLanguages(): Seq[String] =
    scala.sys.process.Process(Seq(cmd, "dicts")).!!.linesIterator.toSeq.distinct.sorted
}

/** S6/S7: seclists corpus under a git-cloned cache (reference
  * src/source/seclists.rs:19-57, 86-169).
  */
final case class SecListsSource(relPath: String) extends WordSource {
  private def full = s"${SecListsSource.cacheDir}/$relPath"
  def name: String = WordSource.fileStem(relPath)
  def words(spark: SparkSession): Dataset[String] = {
    if (!Files.exists(Paths.get(full)))
      throw new IllegalStateException(
        s"seclists file not found: $full — run SecListsSource.pull() first")
    nonEmpty(spark.read.textFile(full))
  }
  def contentHash: Option[String] =
    if (Files.exists(Paths.get(full)))
      Some(hex(Blake3.hash(Files.readAllBytes(Paths.get(full)))))
    else None
}

object SecListsSource {
  import scala.jdk.CollectionConverters._
  /** Upstream remote; `graft.seclists.repo` overrides (mirrors, and the
    * spec's local `file://` fixture remote — the clone/pull protocol is
    * identical either way).
    */
  private def repo: String = sys.props.getOrElse("graft.seclists.repo",
    "https://github.com/danielmiessler/SecLists.git")
  def cacheDir: String =
    sys.props.get("graft.seclists.dir")
      .orElse(sys.env.get("GRAFT_SECLISTS_DIR"))
      .getOrElse(s"${sys.props("user.home")}/.cache/graft/seclists")

  /** `pull`: shallow clone or ff-only update (reference seclists.rs:86-123). */
  def pull(): Unit = {
    import scala.sys.process._
    val dir = Paths.get(cacheDir)
    if (Files.exists(dir.resolve(".git")))
      Process(Seq("git", "-C", cacheDir, "pull", "--ff-only")).!!
    else {
      Files.createDirectories(dir.getParent)
      Process(Seq("git", "clone", "--depth", "1", repo, cacheDir)).!!
    }
  }

  /** `list`: recursive *.txt walk, sorted (reference seclists.rs:125-152). */
  def list(): Seq[String] = {
    val root = Paths.get(cacheDir)
    if (!Files.exists(root)) Seq.empty
    else {
      val s = Files.walk(root)
      try s.iterator().asScala
        .filter(p => p.toString.endsWith(".txt"))
        .map(p => root.relativize(p).toString).toSeq.sorted
      finally s.close()
    }
  }

  def path(rel: String): String = s"$cacheDir/$rel"
}
