package graft.pipeline

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, StandardCopyOption}
import java.time.Duration

/** P1/P2 — the driver-side HTTP fetch that starts every reference DAG
  * (`requests.get` → staging file, dags/warsaw-gtfs.py:49-58 and
  * dags/warsaw-weather.py:30-34), on `java.net.http.HttpClient`.
  *
  * Deliberately DRIVER-side: one small object per feed per run (a zip of
  * a few MB, a weather CSV of a few KB) — distributing a single fetch
  * buys nothing and loses the retry/observability simplicity. Everything
  * after the staged file is executor-side ([[Ingest.stageZip]] onward).
  * Fetching many objects in parallel is a different operator: put the
  * URL list in a DataFrame and fetch per-partition.
  */
object Fetch {

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(Duration.ofSeconds(30))
    .build()

  /** GET `url` and return the body bytes. Non-2xx status throws
    * (`requests.raise_for_status` semantics, dags/warsaw-gtfs.py:51) —
    * a failed fetch must fail the job, never land a half payload. */
  def bytes(url: String): Array[Byte] = {
    val res = client.send(
      HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofMinutes(5)) // a stalled feed must FAIL the
        .GET().build(),                 // task, not hang the scheduler slot
      HttpResponse.BodyHandlers.ofByteArray())
    if (res.statusCode() < 200 || res.statusCode() >= 300)
      throw new java.io.IOException(
        s"GET $url returned HTTP ${res.statusCode()}")
    res.body()
  }

  /** GET `url` into `dest`, atomically: the body lands in a sibling temp
    * file and renames into place, so a crash mid-download never leaves a
    * truncated file where the ingest expects a complete one (the
    * reference's plain `open(path, "wb").write` has that hole). Returns
    * `dest`. */
  def toFile(url: String, dest: Path): Path = {
    val body = bytes(url)
    Option(dest.getParent).foreach(Files.createDirectories(_))
    val tmp = dest.resolveSibling(dest.getFileName.toString + ".part")
    Files.write(tmp, body)
    Files.move(tmp, dest, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    dest
  }
}
