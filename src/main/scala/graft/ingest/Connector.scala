package graft.ingest

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Authenticated-connector configuration surface (SURVEY §2.1 S3b).
  *
  * Reference analog: the Washington feed logs into ArcGIS Online before
  * its export — `_get_secrets()` reads `secrets/secrets.json` and
  * `arcgis.gis.GIS(org, user, password)` authenticates
  * (CountyAddressPointETL.py:4723-4728). This engine has no network in
  * the sandbox, so the TRANSPORT stays pluggable (file-based here), but
  * everything around it is the real contract a credentialed source
  * needs:
  *  - secrets load from a JSON file OUTSIDE the job config (path only;
  *    never inline), at connect time, on the driver;
  *  - config renders REDACTED everywhere (`toString`, logs, lineage) —
  *    a secret can never leak through an exception message or a plan
  *    string;
  *  - missing/malformed secrets fail typed and actionable BEFORE any
  *    stream starts, not as an opaque mid-run auth error.
  */
final case class ConnectorConfig(
    endpoint: String,     // source locator (feature-service URL analog; a dir here)
    org: String,          // tenant/org (GIS(org, …) analog)
    user: String,
    secretsPath: String,  // JSON file holding {"user": …, "password": …}
    secretKey: String = "password") {
  /** Redacted ALWAYS — there is no unredacted renderer. */
  override def toString: String =
    s"ConnectorConfig(endpoint=$endpoint, org=$org, user=$user, " +
      s"secretsPath=<redacted>, secretKey=<redacted>)"
}

/** Typed pre-flight failure: the connector refused to start. */
final case class ConnectorAuthException(detail: String)
    extends RuntimeException(s"connector auth failed: $detail")

object Connector {

  private val mapper = new ObjectMapper()

  /** Load and validate credentials. Validation is the part the
    * reference does implicitly (a bad login throws deep inside arcgis);
    * here it is explicit, typed, and secret-free in its messages. */
  private[ingest] def credentials(cfg: ConnectorConfig): (String, String) = {
    val p = Paths.get(cfg.secretsPath)
    if (!Files.isRegularFile(p))
      throw ConnectorAuthException(s"secrets file not found at ${cfg.secretsPath}")
    val node =
      try mapper.readTree(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
      catch {
        case scala.util.control.NonFatal(_) =>
          throw ConnectorAuthException(s"secrets file ${cfg.secretsPath} is not valid JSON")
      }
    val user = Option(node.get("user")).map(_.asText())
      .getOrElse(throw ConnectorAuthException("secrets file missing key: user"))
    val secret = Option(node.get(cfg.secretKey)).map(_.asText()).filter(_.nonEmpty)
      .getOrElse(throw ConnectorAuthException(s"secrets file missing key: ${cfg.secretKey}"))
    if (user != cfg.user)
      throw ConnectorAuthException(
        s"secrets file user does not match configured user ${cfg.user}")
    (user, secret)
  }

  /** Open the change-log STREAM behind the credentialed endpoint:
    * validates credentials up front (fail-fast, typed), then hands back
    * the streaming source. In the sandbox the endpoint is a change-log
    * directory; on a real deployment the transport swap (JDBC binlog
    * client, Kafka with SASL, REST export) happens here and ONLY here —
    * every consumer downstream of the returned frame is transport-
    * agnostic. */
  def openStream(spark: SparkSession, cfg: ConnectorConfig): DataFrame = {
    credentials(cfg) // pre-flight: throws ConnectorAuthException
    spark.readStream
      .schema(graft.operators.Conform.EventSchema)
      .parquet(s"${cfg.endpoint}/batch-*")
  }

  /** Batch twin of [[openStream]] (the reference's one-shot export). */
  def openBatch(spark: SparkSession, cfg: ConnectorConfig): DataFrame = {
    credentials(cfg)
    spark.read
      .schema(graft.operators.Conform.EventSchema)
      .parquet(s"${cfg.endpoint}/batch-*")
  }
}
