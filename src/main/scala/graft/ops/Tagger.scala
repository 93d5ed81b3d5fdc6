package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.IpFunctions

/** The tagger plugin: bulk-tag sessions from intel lists of IPs/CIDRs,
  * domains and content md5s (reference: capture/plugins/tagger.c —
  * ip entries live in a patricia tree matched against src/dst/xff
  * addresses with ALL covering prefixes firing, domain entries match a
  * hostname exactly or with its first label stripped, md5 entries match
  * content digests exactly).
  *
  * Intel lists are small and driver-held (the reference keeps them in
  * process memory too), so the whole tagger compiles into the session
  * projection: per-entry predicates become codegen'd Column conditions —
  * zero joins, zero shuffles, the tags land map-side at any corpus size.
  */
object Tagger {

  final case class Entry(kind: String, pattern: String, tags: Seq[String])

  def tag(
      sessions: DataFrame, entries: Seq[Entry],
      ipCols: Seq[String] = Seq("srcIp", "dstIp"),
      hostCols: Seq[String] = Seq("httpHost", "dnsQname"),
      md5Cols: Seq[String] = Seq("httpMd5", "emailMd5")): DataFrame = {
    val present = sessions.columns.toSet
    def anyOf(cols: Seq[String], f: Column => Column): Column =
      cols.filter(present.contains).map(c => coalesce(f(col(c)), lit(false)))
        .reduceOption(_ || _).getOrElse(lit(false))
    // exact hostname, or the hostname with its first label stripped —
    // the tagger's one-level domain walk (tagger.c:199-206)
    def hostMatches(h: Column, pat: String): Column = {
      val stripped = h.substr(instr(h, ".") + 1, length(h))
      h === pat || (instr(h, ".") > 0 && stripped === pat)
    }
    def cond(e: Entry): Column = e.kind match {
      case "ip" =>
        anyOf(ipCols, c => IpFunctions.ipInCidr(c, e.pattern))
      case "domain" =>
        anyOf(hostCols, c => exists(c, h => hostMatches(h, e.pattern)))
      case "md5" =>
        anyOf(md5Cols, c => exists(c, m => m === e.pattern))
      case other => throw new IllegalArgumentException(s"tagger kind $other")
    }
    val empty = array().cast("array<string>")
    val perEntry = entries.map(e =>
      when(cond(e), array(e.tags.map(lit): _*).cast("array<string>"))
        .otherwise(empty))
    val existing =
      if (present.contains("tags")) coalesce(col("tags"), empty) else empty
    sessions.withColumn("tags",
      array_sort(array_distinct(concat(existing +: perEntry: _*))))
  }
}
