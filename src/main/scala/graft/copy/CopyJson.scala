package graft.copy

import com.fasterxml.jackson.databind.ObjectMapper

/** JSON wire format of the copy API — the reference's request body shape
  * and its Jackson rendering of task state, shared by the HTTP facade and
  * the CLI so the two entry points can't drift.
  *
  * Field names follow the reference model verbatim (hdfsPath/localPath/
  * bandwidth — reference/model/CopyRequest.java:8-12, CopyItem.java:6-9,
  * CopyTask.java:9-17, CopyItemTask.java:6-27) even though the engine's
  * internal names are source/dest, because the REST JSON is the
  * reference's public contract.
  */
object CopyJson {

  private val mapper = new ObjectMapper()

  /** Parse the reference's request JSON. Throws on malformed input —
    * callers normalize to "Invalid request body".
    */
  def parseRequest(json: String): CopyRequest = {
    val root = mapper.readTree(json)
    if (root == null || !root.isObject)
      throw new IllegalArgumentException("not a JSON object")
    val ns = if (root.hasNonNull("namespace")) root.get("namespace").asText() else null
    val items = if (root.has("items") && root.get("items").isArray) {
      val it = root.get("items").elements()
      val buf = scala.collection.mutable.ArrayBuffer.empty[CopyItem]
      while (it.hasNext) {
        val n = it.next()
        buf += CopyItem(
          if (n.hasNonNull("hdfsPath")) n.get("hdfsPath").asText() else null,
          if (n.hasNonNull("localPath")) n.get("localPath").asText() else null)
      }
      buf.toSeq
    } else null
    val bw = if (root.hasNonNull("bandwidth")) {
      val n = root.get("bandwidth")
      // canConvertToInt: asInt() would silently TRUNCATE out-of-range
      // longs (2^32+1 → 1 MB/s — a massively-throttled copy instead of a
      // 400). The reference's Integer binding rejects these as an
      // unreadable body, so normalize the same way.
      if (!n.isIntegralNumber || !n.canConvertToInt)
        throw new IllegalArgumentException("bandwidth must be a 32-bit integer")
      Some(n.asInt())
    } else None
    CopyRequest(ns, items, bw)
  }

  /** {"error": msg} — the controller/exception-handler error envelope. */
  def error(msg: String): String = {
    val root = mapper.createObjectNode()
    root.put("error", msg)
    mapper.writeValueAsString(root)
  }

  /** {"status":"UP","tasks":{<STATUS>: count, …}} — the /health body
    * (statuses sorted for a stable rendering).
    */
  def health(counts: Map[String, Long]): String = {
    val root = mapper.createObjectNode()
    root.put("status", "UP")
    val tasks = root.putObject("tasks")
    counts.toSeq.sortBy(_._1).foreach { case (k, v) => tasks.put(k, v) }
    mapper.writeValueAsString(root)
  }

  /** {"requestId": id} — the 202 submit acknowledgement. */
  def requestId(id: String): String = {
    val root = mapper.createObjectNode()
    root.put("requestId", id)
    mapper.writeValueAsString(root)
  }

  /** Full task snapshot, shaped like Jackson's rendering of the
    * reference's CopyTask/CopyItemTask (statuses by enum name, speed as
    * the formatted string, Instants as ISO-8601).
    */
  def renderTask(t: CopyTaskState): String = {
    val root = mapper.createObjectNode()
    root.put("requestId", t.requestId)
    root.put("namespace", t.namespace)
    t.bandwidthMbPerSec match {
      case Some(b) => root.put("bandwidth", b)
      case None    => root.putNull("bandwidth")
    }
    root.put("status", t.status.toString)
    val items = root.putArray("items")
    t.items.foreach { i =>
      val n = items.addObject()
      n.put("hdfsPath", i.sourcePath)
      n.put("localPath", i.destPath)
      n.put("status", i.status.toString)
      n.put("bytesCopied", i.bytesCopied)
      n.put("durationMs", i.durationMs)
      if (i.errorMessage == null) n.putNull("errorMessage")
      else n.put("errorMessage", i.errorMessage)
      n.put("checksumVerified", i.checksumVerified)
      n.put("speed", i.speed)
    }
    root.put("createdAt", t.createdAt.toString)
    if (t.completedAt == null) root.putNull("completedAt")
    else root.put("completedAt", t.completedAt.toString)
    mapper.writeValueAsString(root)
  }
}
