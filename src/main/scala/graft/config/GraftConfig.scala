package graft.config

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Config layering with the reference's precedence (reference
  * src/config.rs:97-159): CLI flag > environment variable > `./.graft.toml`
  * > `~/.config/graft/config.toml`. The files use the TOML subset the
  * reference actually reads — `key = "value"` pairs under `[r2]`-style
  * sections — parsed here without a TOML dependency (offline classpath).
  *
  * Recognized keys mirror the reference's R2/S3 settings and map onto
  * Hadoop S3A configuration (SURVEY.md §2 K4):
  *   endpoint → fs.s3a.endpoint · access_key_id → fs.s3a.access.key ·
  *   secret_access_key → fs.s3a.secret.key · bucket → bucket name.
  */
final case class GraftConfig(values: Map[String, String]) {
  def get(key: String): Option[String] = values.get(key)

  /** Hadoop conf pairs for S3A access (path-style, per R2/minio-like
    * endpoints).
    */
  def s3aSettings: Map[String, String] = {
    val m = Map.newBuilder[String, String]
    get("s3.endpoint").foreach(v => m += ("fs.s3a.endpoint" -> v))
    get("s3.access_key_id").foreach(v => m += ("fs.s3a.access.key" -> v))
    get("s3.secret_access_key").foreach(v => m += ("fs.s3a.secret.key" -> v))
    m += ("fs.s3a.path.style.access" -> "true")
    m.result()
  }

  def applyTo(spark: org.apache.spark.sql.SparkSession): Unit =
    s3aSettings.foreach { case (k, v) =>
      spark.sparkContext.hadoopConfiguration.set(k, v)
    }
}

object GraftConfig {

  private val EnvMapping = Map(
    "GRAFT_S3_ENDPOINT" -> "s3.endpoint",
    "GRAFT_S3_ACCESS_KEY_ID" -> "s3.access_key_id",
    "GRAFT_S3_SECRET_ACCESS_KEY" -> "s3.secret_access_key",
    "GRAFT_S3_BUCKET" -> "s3.bucket",
    "GRAFT_ALGORITHMS" -> "build.algorithms"
  )

  def load(
      flags: Map[String, String] = Map.empty,
      env: Map[String, String] = sys.env,
      cwd: Path = Paths.get("."),
      home: Path = Paths.get(sys.props("user.home"))
  ): GraftConfig = {
    val user = parseFile(home.resolve(".config/graft/config.toml"))
    val project = parseFile(cwd.resolve(".graft.toml"))
    val envLayer = EnvMapping.flatMap { case (e, k) => env.get(e).map(k -> _) }
    // lowest precedence first; later layers override
    GraftConfig(user ++ project ++ envLayer ++ flags)
  }

  /** `key = "value"` / `key = value` pairs; `[section]` headers prefix keys
    * with `section.`; `#` comments and blanks skipped.
    */
  private[config] def parseFile(p: Path): Map[String, String] =
    if (!Files.exists(p)) Map.empty
    else parse(Files.readAllLines(p).asScala.toSeq)

  private[graft] def parse(lines: Seq[String]): Map[String, String] = {
    var section = ""
    val out = Map.newBuilder[String, String]
    lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).foreach {
      case l if l.startsWith("[") && l.endsWith("]") =>
        section = l.substring(1, l.length - 1).trim + "."
      case l if l.contains("=") =>
        val Array(k, v) = l.split("=", 2)
        val cleaned = v.trim.stripPrefix("\"").stripSuffix("\"")
        out += (section + k.trim) -> cleaned
      case _ => ()
    }
    out.result()
  }
}
