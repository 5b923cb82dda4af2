package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}

/** External-API pull stage (operator S7) — the engine-side analog of the
  * reference's internal-exporter pod (reference
  * dags/stellar_etl_airflow/build_internal_export_task.py:26-108): GET an
  * NDJSON feed from an endpoint, land it at
  * `{outRoot}/{runId}/{taskName}-exported-entity.txt` (the reference's
  * output-path contract, ibid.:60-64), stamping the batch lineage fields
  * onto every record (the `-u batch_id=…` metadata flag, ibid.:67-75).
  * The landed file then flows through the ordinary S4 NDJSON load path
  * ([[Ndjson.read]]) — the pull is a boundary stage, deliberately thin:
  * no parsing, no schema, no retry policy beyond the caller's rerun.
  *
  * Idempotency: the fetch streams into a temp file in the target
  * directory and is atomically renamed over the output, so a retried run
  * (the Airflow retry contract) replaces the file in one step — readers
  * never observe a half-written batch, and a rerun with the same inputs
  * leaves byte-identical output.
  *
  * Scale posture: one feed file per (runId, taskName) — these are
  * partner/reference feeds (prices, TVL rows), not the 100 TB fact path;
  * the driver-side stream copy is the right tool. Fan-out across feeds
  * is the orchestrator's parallelism, as in the reference.
  */
object ApiPull {

  /** Batch lineage stamped onto every record, mirroring the reference's
    * `get_airflow_metadata()` trio (build_internal_export_task.py:17-24).
    */
  final case class BatchMeta(batchId: String, batchRunDate: String,
                             batchInsertTs: String)

  /** Pull `endpoint` (must answer 200 with NDJSON) into
    * `{outRoot}/{runId}/{taskName}-exported-entity.txt`; returns the
    * output path. Blank lines are dropped; with `meta`, each JSON object
    * line gains `batch_id`/`batch_run_date`/`batch_insert_ts` fields. A
    * non-object line under `meta` fails the batch loudly (the FAILFAST
    * philosophy of the downstream load, not silent passthrough).
    */
  def pullNdjson(endpoint: String, outRoot: String, runId: String,
                 taskName: String, meta: Option[BatchMeta] = None,
                 connectTimeoutMs: Int = 10000,
                 readTimeoutMs: Int = 60000): String = {
    val outDir = Paths.get(outRoot, runId)
    Files.createDirectories(outDir)
    val out = outDir.resolve(s"$taskName-exported-entity.txt")
    // parse/connect BEFORE creating the temp file: a bad endpoint must
    // not leak a .tmp into the output dir on every retry (the Airflow
    // rerun contract retries exactly this path)
    val conn = java.net.URI.create(endpoint).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    val tmp = Files.createTempFile(outDir, s".$taskName-", ".tmp")
    try {
      val code = conn.getResponseCode
      require(code == 200, s"API pull $endpoint answered HTTP $code")
      val src = scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8")
      try {
        val w = Files.newBufferedWriter(tmp, UTF_8)
        try src.getLines().filter(_.trim.nonEmpty).foreach { line =>
          w.write(stamp(line, meta)); w.write("\n")
        } finally w.close()
      } finally src.close()
      Files.move(tmp, out, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
      out.toString
    } finally {
      Files.deleteIfExists(tmp)
      conn.disconnect()
    }
  }

  private def stamp(line: String, meta: Option[BatchMeta]): String =
    meta match {
      case None => line
      case Some(m) =>
        val t = line.trim
        require(t.startsWith("{") && t.endsWith("}"),
          s"cannot stamp batch metadata onto a non-object NDJSON line: $t")
        val body = t.substring(0, t.length - 1)
        val sep = if (body.trim == "{") "" else ","
        body + sep +
          s""""batch_id":${jstr(m.batchId)},""" +
          s""""batch_run_date":${jstr(m.batchRunDate)},""" +
          s""""batch_insert_ts":${jstr(m.batchInsertTs)}}"""
    }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Local-HTTP fixture: serve `payload` on an ephemeral loopback port
    * for the duration of `f` — the stand-in for the external API in
    * specs and the driver gate (this container has no egress; the
    * reference's pod boundary becomes a loopback GET, the pull-stage
    * contract being what's under test).
    */
  def withLocalEndpoint[A](payload: String, path: String = "/export")
                          (f: String => A): A = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    try {
      server.createContext(path,
        (ex: com.sun.net.httpserver.HttpExchange) => {
          val bytes = payload.getBytes(UTF_8)
          ex.getResponseHeaders.add("Content-Type", "application/x-ndjson")
          ex.sendResponseHeaders(200, bytes.length.toLong)
          val os = ex.getResponseBody
          try os.write(bytes) finally os.close()
        })
      server.start()
      f(s"http://127.0.0.1:${server.getAddress.getPort}$path")
    } finally server.stop(0)
  }
}
