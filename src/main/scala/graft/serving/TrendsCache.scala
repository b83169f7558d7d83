package graft.serving

import java.sql.Timestamp

import scala.collection.concurrent.TrieMap

import graft.model.Statistic

/**
 * Read-through result cache for the trends query — the serving-plane
 * equivalent of the reference's memcache layer
 * (`trends/listing/service.go:78-124`, SURVEY.md §2.1 S7 / §2.5 D5):
 * composite key `fromMs-toMs-curFrom-curTo` (:83), 60 s TTL (:118), and
 * fall-through to the engine on any cache trouble (:86-89, :102-105).
 *
 * This is deliberately NOT an engine concern (Catalyst caches inputs, not
 * parameterized results, SURVEY.md §4): it wraps whatever function computes
 * the statistics. Process-local like one trends replica; a shared cache
 * would slot in behind the same interface.
 */
class TrendsCache(ttlMillis: Long = 60000L, clock: () => Long = System.currentTimeMillis) {

  protected case class Entry(at: Long, value: Array[Statistic])
  private val cache = TrieMap.empty[String, Entry]

  /** Cache I/O seams — a remote-cache deployment overrides these two. Any
    * exception they throw falls through to the engine, exactly like the
    * reference's memcache error paths (service.go:86-89 on read,
    * :102-105 on write: log-and-continue, never fail the request). */
  protected def load(k: String): Option[Entry] = cache.get(k)
  protected def store(k: String, e: Entry): Unit = cache.put(k, e)

  private[graft] def key(from: Timestamp, to: Timestamp, cf: String,
      ct: String): String =
    s"${from.getTime}-${to.getTime}-$cf-$ct" // trends/listing/service.go:83

  def get(from: Timestamp, to: Timestamp, cf: String, ct: String)(
      compute: => Array[Statistic]): Array[Statistic] = {
    val k = key(from, to, cf, ct)
    val now = clock()
    val cached =
      try load(k)
      catch { case scala.util.control.NonFatal(_) => None }
    cached match {
      case Some(e) if now - e.at < ttlMillis => e.value
      case _ =>
        val v = compute
        try store(k, Entry(now, v))
        catch { case scala.util.control.NonFatal(_) => () }
        v
    }
  }

  /** Drop expired entries (the reference relies on memcache eviction). */
  def sweep(): Unit = {
    val now = clock()
    cache.foreach { case (k, e) => if (now - e.at >= ttlMillis) cache.remove(k) }
  }

  def size: Int = cache.size
}

/** JSON page encode — the trends service's response shape
  * (`trends/http/rest/api.go:14-28,68-78`, S8). The reference's `omitempty`
  * quirk (zero-valued floats dropped from JSON) is an observed bug, not
  * replicated (SURVEY.md §1.1d). */
object TrendsPage {
  def toJson(dateFrom: String, dateTo: String, cf: String, ct: String,
      stats: Seq[Statistic]): String = {
    def d(x: Double): String =
      if (x.isNaN) "\"NaN\""
      else if (x.isInfinity) { if (x > 0) "\"Infinity\"" else "\"-Infinity\"" }
      else x.toString
    val items = stats.map { s =>
      s"""{"window":"${s.window}","min":${d(s.min)},"max":${d(s.max)},""" +
        s""""mean":${d(s.mean)},"median":${d(s.median)}}"""
    }.mkString("[", ",", "]")
    s"""{"dateFrom":"$dateFrom","dateTo":"$dateTo","currencyFrom":"$cf",""" +
      s""""currencyTo":"$ct","statistics":$items}"""
  }
}
