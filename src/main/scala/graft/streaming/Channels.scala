package graft.streaming

import org.apache.spark.sql.DataFrame

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

/** The Spark analog of the reference's send library
  * (/root/reference/lib/send.go:136-197: send_to/send_refval_to/close
  * push values into named Go channels mid-evaluation — the embedding
  * hook Elastic Agent uses to emit events).
  *
  * In Spark, values leave a query through SINKS, not mid-expression
  * side effects; the named-channel surface becomes named driver-side
  * queues fed by foreachBatch. `sendTo` attaches a batch query or
  * stream to a channel; consumers drain with `poll`/`drain`.
  */
object Channels {
  private val channels = new ConcurrentHashMap[String, ConcurrentLinkedQueue[String]]()

  private def queue(name: String): ConcurrentLinkedQueue[String] =
    channels.computeIfAbsent(name, _ => new ConcurrentLinkedQueue[String]())

  /** send_to for a batch DataFrame: every row's JSON lands on the named
    * channel (driver-side; rows are collected per batch — intended for
    * event emission, not bulk data movement). */
  /** Channels are an event/control-flow mechanism (the reference's chan
    * map, lib/send.go:61) — not a bulk data path. The guard keeps a
    * caller from accidentally collecting a large frame to the driver. */
  val MaxRowsPerSend = 100000

  def sendTo(name: String, df: DataFrame): Unit = {
    val q = queue(name)
    val rows = df.toJSON.take(MaxRowsPerSend + 1)
    require(rows.length <= MaxRowsPerSend,
      s"send_to('$name') exceeds $MaxRowsPerSend rows; channels are for " +
        "events — write bulk data to a sink instead")
    rows.foreach(q.add)
  }

  /** One in-band value send (the CEL tier's v.send_to(name)). */
  def send(name: String, json: String): Unit = queue(name).add(json)

  /** close with existence check (send.go:136-147: closing an unknown or
    * already-closed channel is an error). */
  def closeStrict(name: String): Boolean = channels.remove(name) != null

  /** send_to for a stream: foreachBatch pushing each micro-batch. */
  def sendToStream(name: String, df: DataFrame): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sendTo(name, batch)
    }

  def poll(name: String): Option[String] = Option(queue(name).poll())

  def drain(name: String): Seq[String] = {
    val q = queue(name)
    val out = Seq.newBuilder[String]
    var v = q.poll()
    while (v != null) { out += v; v = q.poll() }
    out.result()
  }

  /** close(name) — lib/send.go:179-197. */
  def close(name: String): Unit = channels.remove(name)
}
