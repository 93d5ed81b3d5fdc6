package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WISE service model — the reference's standalone intel service plus its
  * capture-side client (wiseService/wiseService.js, wiseService/
  * simpleSource.js, capture/plugins/wise.c).
  *
  * The service combines many typed sources (file/redis/url/reversedns/…,
  * wiseService/source.*.js); a lookup dispatches the value to every source
  * registered for that type and unions the per-source results
  * (wiseService.js:948-1110). Types and their matching rules:
  *
  *   - `ip`     — entries may be CIDRs, kept in an IP trie; a lookup finds
  *                the most-specific covering entry (simpleSource.js:60-63,
  *                iptrie).
  *   - `domain` — the capture client strips any `http[s]://` prefix and
  *                refuses values that cannot be DNS names
  *                (wise.c:461-518); each source answers with the EXACT
  *                domain if it has it, else falls back to the one-label-
  *                stripped parent (simpleSource.js:65-71). Exclusion is by
  *                suffix list (wise.c:510-517).
  *   - `md5`/`sha256`/`email`/`url`/`ja3` — exact-key lookups (url minus
  *                protocol, funcName wiseService.js:879-885).
  *
  * Spark-first shape: intel sources are tiny next to 100 TB of sessions,
  * so every lookup is a BROADCAST equi-join; the fact side never
  * shuffles. Non-exact matching never becomes a nested-loop join:
  *   - domain fallback: the ≤2 candidate keys (exact, parent) are
  *     exploded map-side, equi-joined, and the exact-first preference is
  *     resolved by a per-(fact,source) min-preference aggregate;
  *   - CIDR: the (few) distinct prefix lengths present in the intel are
  *     compiled into the plan; each fact row emits one truncated-network
  *     candidate per length (map-side explode), equi-joins on the network
  *     key, and a max_by(prefixLen) aggregate keeps the most-specific
  *     entry — the trie's longest-prefix semantics as two narrow
  *     hash-joins, no BroadcastNestedLoop at any scale.
  */
object Wise {

  /** One configured source (a `[section]` in wiseService.ini): typed
    * entries plus source-level tags applied to every hit
    * (wiseSource.js tagsSetting).
    * `entries` columns: `key`, `field`, `value` (string each).
    */
  final case class Source(
      name: String,
      typ: String,
      entries: DataFrame,
      tags: Seq[String] = Nil)

  /** Candidate lookup keys for a value, most-preferred first.
    * pref 0 = exact (protocol-stripped), pref 1 = one-label-stripped
    * parent (domain only, simpleSource.js:70).
    */
  def candidates(value: Column, typ: String): Column = typ match {
    case "domain" =>
      val d = regexp_replace(lower(value), "^https?://", "")
      // exact first; parent only when stripping changed something
      filter(
        array(
          struct(lit(0).as("pref"), d.as("key")),
          struct(lit(1).as("pref"),
            regexp_replace(d, "^[^.]*\\.", "").as("key"))),
        c => c.getField("pref") === 0 ||
          c.getField("key") =!= d)
    case "url" =>
      array(struct(lit(0).as("pref"),
        regexp_replace(value, "^https?://", "").as("key")))
    case _ =>
      array(struct(lit(0).as("pref"), value.as("key")))
  }

  /** Per-type exclusion predicate (wise.c:510-517 — domains by suffix,
    * IPs by covering CIDR, everything else literal).
    */
  def excluded(value: Column, typ: String, excludes: Seq[String]): Column =
    if (excludes.isEmpty) lit(false)
    else typ match {
      case "domain" =>
        // protocol is stripped before the exclude check (wise.c:461-517)
        val d = regexp_replace(lower(value), "^https?://", "")
        excludes.map(s => d.endsWith(s)).reduce(_ || _)
      case "ip" =>
        excludes.map(c => graft.functions.IpFunctions.ipInCidr(value, c))
          .reduce(_ || _)
      case _ => excludes.map(e => value === lit(e)).reduce(_ || _)
    }

  /** Union the entries of all sources of one type into a single
    * broadcastable intel frame (source, key, field, value).
    */
  private def unionIntel(sources: Seq[Source]): DataFrame = {
    require(sources.nonEmpty, "at least one source")
    sources.map { s =>
      s.entries.select(lit(s.name).as("source"), col("key"),
        col("field"), col("value"))
    }.reduce(_ union _)
  }

  /** Exact / domain-fallback lookup: every hit row is
    * (idCol, source, field, value), exact-key hits shadowing parent-key
    * hits per source (simpleSource.js:65-71). `facts` never shuffles on
    * its own columns: the only exchanges are the broadcast of the intel
    * and the per-(id, source) preference aggregate over HITS (bounded by
    * the intel fan-out, a tiny fraction of the fact table).
    */
  def lookup(
      facts: DataFrame,
      idCol: Column,
      valueCol: Column,
      typ: String,
      sources: Seq[Source],
      excludes: Seq[String] = Nil): DataFrame = {
    val intel = unionIntel(sources)
    val cands = facts
      .filter(valueCol.isNotNull && !excluded(valueCol, typ, excludes))
      .select(idCol.as("_id"),
        explode(candidates(valueCol, typ)).as("_cand"))
      .select(col("_id"), col("_cand.pref").as("_pref"),
        col("_cand.key").as("_key"))
    val hits = cands
      .join(broadcast(intel), col("_key") === col("key"))
      .select(col("_id"), col("source"), col("_pref"),
        col("field"), col("value"))
    // exact-first fallback: per (fact, source) keep only the rows at the
    // minimum preference seen. One partial-agg shuffle over hits.
    hits.groupBy(col("_id"), col("source"))
      .agg(min(col("_pref")).as("_mp"),
        collect_list(struct(col("_pref"), col("field"), col("value")))
          .as("_rows"))
      .select(col("_id"), col("source"),
        explode(expr("filter(_rows, r -> r._pref = _mp)")).as("_r"))
      .select(col("_id").as("id"), col("source"),
        col("_r.field").as("field"), col("_r.value").as("value"))
  }

  /** CIDR (`ip` type) lookup with longest-prefix-wins trie semantics.
    * `sources` entries' `key` column holds v4 CIDRs (`a.b.c.d/len`).
    * The distinct prefix lengths are read from the intel (driver-side
    * collect of the already-tiny dimension) and compiled into the plan;
    * each fact row then emits one `(len, network)` candidate per length.
    */
  def lookupIp(
      facts: DataFrame,
      idCol: Column,
      ipCol: Column,
      sources: Seq[Source],
      excludes: Seq[String] = Nil): DataFrame = {
    val intel = unionIntel(sources)
      // bare-IP keys (the common plain threat-list format; the
      // reference iptrie accepts them) are /32 — try_cast because a
      // missing '/len' yields '' and ANSI cast would fail the job
      .withColumn("_plen", coalesce(
        expr("try_cast(split_part(key, '/', 2) AS INT)"), lit(32)))
      .withColumn("_ipLong",
        v4ToLong(split_part(col("key"), lit("/"), lit(1))))
      // non-v4 intel keys (v6 feeds) have no place in the v4 trie — drop
      // them instead of crashing the build
      .filter(col("_ipLong").isNotNull)
      .withColumn("_net", expr("shiftright(_ipLong, 32 - _plen)"))
      // packed LONG join key: plen in the high bits, network below
      // (plen <= 32 fits above the 33-bit network space) — a long
      // equi-join with no per-row string rendering (concat_ws keys
      // measured ~15% of the i19 profile)
      .withColumn("_netKey",
        expr("(cast(_plen AS BIGINT) << 33) | _net"))
    val plens: Seq[Int] = intel.select(col("_plen")).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    require(plens.nonEmpty, "intel has no CIDR entries")

    // computed ONCE per row as a named column: inlining the parse into
    // every per-prefix-length candidate struct multiplies its cost by
    // |prefix lengths|
    val candArr = array(plens.map { l =>
      struct(lit(l).as("plen"),
        shiftright(col("_ipl"), 32 - l)
          .bitwiseOR(lit(l.toLong << 33)).as("netKey"))
    }: _*)
    val cands = facts
      .filter(ipCol.isNotNull && !excluded(ipCol, "ip", excludes))
      .withColumn("_ipl", v4ToLong(ipCol))
      // a non-dotted-quad fact value (any v6 session) is a non-match,
      // not an ANSI cast crash of the whole job
      .filter(col("_ipl").isNotNull)
      .select(idCol.as("_id"), explode(candArr).as("_c"))
      .select(col("_id"), col("_c.plen").as("_plen2"),
        col("_c.netKey").as("_nk"))
    val hits = cands
      .join(broadcast(intel), col("_nk") === col("_netKey"))
      .select(col("_id"), col("source"), col("_plen2"),
        col("key").as("cidr"), col("field"), col("value"))
    // most-specific entry per (fact, source): max prefix length
    hits.groupBy(col("_id"), col("source"))
      .agg(max(col("_plen2")).as("_best"),
        collect_list(struct(col("_plen2"), col("cidr"),
          col("field"), col("value"))).as("_rows"))
      .select(col("_id"), col("source"),
        explode(expr("filter(_rows, r -> r._plen2 = _best)")).as("_r"))
      .select(col("_id").as("id"), col("source"), col("_r.cidr").as("cidr"),
        col("_r.field").as("field"), col("_r.value").as("value"))
  }

  /** v4 dotted-quad → long, pure arithmetic (codegen'd; identical SQL
    * runs on the oracle side).
    */
  def v4ToLong(ip: Column): Column = {
    // regex-gated casts: '::1' or garbage yields NULL (a non-match),
    // never an ANSI SparkNumberFormatException. The gate short-circuits
    // in codegen, so the casts only run on dotted-quad shapes — measured
    // ~10x over a try_to_number form when the expression is expanded
    // per candidate prefix length.
    val ok = ip.rlike("^[0-9]{1,3}(\\.[0-9]{1,3}){3}$")
    val p = split(ip, "\\.")
    def o(i: Int) = get(p, lit(i)).cast("long")
    val valid = o(0) <= 255 && o(1) <= 255 && o(2) <= 255 && o(3) <= 255
    when(ok && valid,
      o(0) * 16777216L + o(1) * 65536L + o(2) * 256L + o(3))
      .otherwise(lit(null).cast("long"))
  }

  // --------------------------------------------------- concrete loaders
  /** One field mapping of a simpleSource feed: `path` is the
    * dotted path into each JSON item (the reference's `shortcut`),
    * `field` the session-field expression the value lands in, `mod`
    * the case fold (0 none, 1 lower, 2 upper — `kind:lotermfield` /
    * `kind:uptermfield`, wiseSource.js:155-165).
    */
  final case class FeedField(path: String, field: String, mod: Int = 0)

  /** Parse one reference `fields=` definition line —
    * `field:<exp>;db:…;kind:lotermfield;…;shortcut:<path>`
    * (wiseSource.js parseFieldDef:146-170). Lines without a
    * `shortcut:` map no JSON value and yield nothing; `view:` lines are
    * UI-side and skipped.
    */
  def parseFieldDef(line: String): Option[FeedField] = {
    val l = line.stripPrefix("#")
    if (!l.startsWith("field:")) return None
    val exp = l.substring("field:".length).takeWhile(_ != ';')
    val shortcut = "shortcut:([^;]+)".r.findFirstMatchIn(l).map(_.group(1))
    val mod = "kind:([^;]+)".r.findFirstMatchIn(l).map(_.group(1)) match {
      case Some("lotermfield") => 1
      case Some("uptermfield") => 2
      case _ => 0
    }
    shortcut.map(s => FeedField(s, exp, mod))
  }

  /** url-json source adapter — source.url.js + the simpleSource base
    * class with `format=json` (wiseSource.js parseJSON:263-330): fetch
    * the whole feed, walk `arrayPath` to the item array, take each
    * item's `keyPath` value as the lookup key (an array key fans out,
    * parseJSON:318-323), and map each [[FeedField]]'s path to a
    * (field, value) pair, case-folded per its kind. `url`-typed keys
    * drop a leading `http://` (simpleSource.js load():148-151). Items
    * whose key resolves but match no field still register the key
    * (the reference's emptyResult — the source's tags apply on hit) as
    * a row with null field/value.
    *
    * The feed is an intel dimension — tiny by definition — so the body
    * is read and walked on the driver, exactly like the reference
    * service holds it in memory; the resulting entries frame then rides
    * the normal broadcast-join path of [[lookup]]/[[lookupIp]].
    * `url` accepts `http(s)://` (with optional request headers,
    * source.url.js:36-48), `file://`, or a bare filesystem path.
    */
  def fromJsonUrl(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      typ: String,
      url: String,
      keyPath: String,
      arrayPath: Option[String] = None,
      fieldDefs: Seq[String] = Nil,
      tags: Seq[String] = Nil,
      headers: Map[String, String] = Map.empty): Source = {
    val body = readBody(url, headers)
    val defs = fieldDefs.flatMap(parseFieldDef)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    var node = mapper.readTree(body)
    for (p <- arrayPath.toSeq; seg <- p.split('.')) {
      node = node.path(seg)
      require(!node.isMissingNode, s"wise $name: no '$seg' in feed")
    }
    require(node.isArray, s"wise $name: feed is not an array")
    def walk(item: com.fasterxml.jackson.databind.JsonNode,
        path: String): com.fasterxml.jackson.databind.JsonNode =
      path.split('.').foldLeft(item)((n, seg) => n.path(seg))
    def keyText(k: com.fasterxml.jackson.databind.JsonNode): String = {
      val s = k.asText()
      if (typ == "url" && s.startsWith("http://")) s.substring(7) else s
    }
    val rows = Seq.newBuilder[(String, String, String)]
    node.forEach { item =>
      val k = walk(item, keyPath)
      if (!k.isMissingNode && !k.isNull) {
        val keys =
          if (k.isArray) {
            val b = Seq.newBuilder[String]
            k.forEach(e => b += keyText(e))
            b.result()
          } else Seq(keyText(k))
        val kvs = defs.flatMap { d =>
          val v = walk(item, d.path)
          if (v.isMissingNode || v.isNull || v.asText().isEmpty) None
          else Some((d.field, d.mod match {
            case 1 => v.asText().toLowerCase(java.util.Locale.ROOT)
            case 2 => v.asText().toUpperCase(java.util.Locale.ROOT)
            case _ => v.asText()
          }))
        }
        keys.filter(_.nonEmpty).foreach { key =>
          if (kvs.isEmpty) rows += ((key, null, null))
          else kvs.foreach { case (f, v) => rows += ((key, f, v)) }
        }
      }
    }
    import spark.implicits._
    Source(name, typ, rows.result().toDF("key", "field", "value"), tags)
  }

  /** Fetch a feed body: http(s) GET with headers, or a local file. */
  private def readBody(url: String, headers: Map[String, String]): String = {
    if (url.startsWith("http://") || url.startsWith("https://")) {
      val conn = java.net.URI.create(url).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      conn.setConnectTimeout(30000)
      conn.setReadTimeout(60000)
      try {
        require(conn.getResponseCode == 200,
          s"wise feed $url: HTTP ${conn.getResponseCode}")
        new String(conn.getInputStream.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
      } finally conn.disconnect()
    } else {
      val p = if (url.startsWith("file://")) url.substring(7) else url
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), java.nio.charset.StandardCharsets.UTF_8)
    }
  }

  /** Source-level tags for hits (wiseSource.js tagsSetting): one row per
    * (fact, tag), set-semantics union across sources — feed the result
    * of `lookup`/`lookupIp`.
    */
  def hitTags(hits: DataFrame, sources: Seq[Source]): DataFrame = {
    val tagRows = sources.filter(_.tags.nonEmpty).map { s =>
      (s.name, s.tags)
    }
    val tagMap = typedLit(tagRows.toMap)
    hits.select(col("id"), col("source")).distinct()
      .select(col("id"),
        explode(try_element_at(tagMap, col("source"))).as("tag"))
      .distinct()
  }
}
