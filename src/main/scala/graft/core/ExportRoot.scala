package graft.core

/** Per-process root for the /tmp parquet/text exports that feed the DuckDB
  * oracle twins (q_pages_*, q_xml_*, q_multimodal).
  *
  * The paths must be literal /tmp strings (not java.io.tmpdir, which Bench
  * redirects) because the static oracle SQL carries them — but they are
  * suffixed with this JVM's PID so two concurrent sessions on one machine
  * (e.g. a Verify run racing a test suite) can never overwrite each
  * other's export mid-read. `SparkEntry.oracleSql` is evaluated in the
  * SAME process that writes the exports, so the SQL the driver dumps
  * always points at this process's directories. Stale per-PID dirs are
  * bounded (one small parquet per run) and live in /tmp.
  */
object ExportRoot {
  private val pid: Long = ProcessHandle.current().pid()
  def dir(name: String): String = s"/tmp/graft_${name}_p$pid"
}
