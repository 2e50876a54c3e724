package graft.sources.cassandralike

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.sources.{EqualTo, Filter, In}

/** Secondary (value → row key) indexes over regular-mapping cell columns —
  * the store-level answer to "find the rows where c = v" without scanning
  * every bucket, shaped like Cassandra's per-table 2i: each indexed column
  * gets its own cell sub-store (`<table>/idx_<col>/`) whose row key is the
  * ENCODED CELL VALUE and whose cells are the base row keys carrying it.
  *
  * Soundness rests on two invariants, not on index freshness:
  *   1. SUPERSET: every (value, key) ever written is in the index (index
  *      segments commit BEFORE their base segments, so no committed base
  *      cell lacks its entry), and entries are never removed — an
  *      overwritten or deleted row just leaves a stale entry behind.
  *   2. EXACT RE-FILTER: the scan only ever uses the index to SHRINK the
  *      key set it reads (a planning-time In(key, candidates) translation);
  *      the original value predicate stays in the plan as a residual
  *      filter Spark re-applies exactly. A stale candidate therefore costs
  *      one pruned point read, never a wrong row.
  * The same two invariants are why Cassandra's 2i read path re-validates
  * hits against the base row instead of trusting the index.
  *
  * Scale shape: a lookup routes to ONE index bucket (token of the value
  * bytes), seeks it through the run index and per-run blooms like any point
  * read, then plans the base scan restricted to the candidate keys — cost
  * is O(matching rows), independent of table size. `index.columns` is a
  * layout property: it must be declared before the first write (a
  * later-added index would silently miss existing rows — rejected the same
  * way bucket-count changes are). */
object Index {

  /** The sub-store holding one column's index. */
  def dir(tableDir: String, colName: String): String = s"$tableDir/idx_$colName"

  /** Index-key encoding: the cell-value codec plus float/double
    * normalization, applied identically on write and lookup. SQL equality
    * makes -0.0 = 0.0 true and Spark treats NaN as self-equal, but raw IEEE
    * bits differ — un-normalized, a -0.0 probe would MISS +0.0 postings (a
    * false negative, the one failure the index must never produce). */
  def encodeKey(dt: org.apache.spark.sql.types.DataType, cat: Any,
      textEncoding: Boolean): Array[Byte] = {
    val n = cat match {
      case d: java.lang.Double =>
        if (d.isNaN) java.lang.Double.valueOf(Double.NaN)
        else if (d == 0.0d) java.lang.Double.valueOf(0.0d) else d
      case f: java.lang.Float =>
        if (f.isNaN) java.lang.Float.valueOf(Float.NaN)
        else if (f == 0.0f) java.lang.Float.valueOf(0.0f) else f
      case other => other
    }
    if (textEncoding) Codecs.encodeText(dt, n) else Codecs.encode(dt, n)
  }

  /** Validated indexed column set from `index.columns` (comma list of
    * schema column names; regular mappings only, named cells only). */
  def columns(mapping: ColumnMapping, opt: String => Option[String]): Set[String] = {
    val listed = opt(Options.IndexColumns)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    if (listed.isEmpty) return Set.empty
    require(!mapping.transposed,
      "index.columns requires a regular (non-transposed) mapping")
    val cells = mapping.cellFields.map(_.name).toSet
    val unknown = listed -- cells
    require(unknown.isEmpty,
      s"index.columns names non-cell columns: ${unknown.mkString(", ")}")
    listed
  }

  /** Planning-time candidate resolution: every pushed EqualTo/In on an
    * indexed column becomes a point lookup into that column's index store;
    * conjuncts intersect. Returns one In(key, candidates) filter (possibly
    * with an empty value list — a provably-empty scan), or nothing when no
    * indexed predicate is pushed. */
  def keyFilters(
      table: CassandraLikeTable,
      options: Map[String, String],
      filters: Array[Filter]): Array[Filter] = {
    val opt = (k: String) => table.opt(options, k)
    val idxCols = columns(table.mapping, opt)
    if (idxCols.isEmpty) return Array.empty
    val preds: Seq[(String, Seq[Any])] = filters.toSeq.collect {
      case EqualTo(c, v) if idxCols(c) => c -> Seq(v)
      case In(c, vs) if idxCols(c) && vs.nonEmpty => c -> vs.toSeq
    }
    if (preds.isEmpty) return Array.empty
    val textEnc = opt(Options.Encoding).contains("text")
    val buckets = opt(Options.Buckets).map(_.toInt)
      .getOrElse(Options.DefaultBuckets)
    val candSets: Seq[Set[Seq[Byte]]] = preds.map { case (c, vs) =>
      val dt = table.mapping.fields.find(_.name == c).get.dataType
      vs.flatMap { v =>
        val cat = CatalystTypeConverters.convertToCatalyst(v)
        if (cat == null) Nil
        else lookupOne(dir(table.dir, c), encodeKey(dt, cat, textEnc), buckets)
      }.map(_.toSeq).toSet
    }
    val cands = candSets.reduce(_ intersect _)
    val keyType = table.mapping.keyField.dataType
    val ext = cands.toSeq.map(kb =>
      CatalystTypeConverters.convertToScala(Codecs.decode(keyType, kb.toArray), keyType))
    Array(In(table.mapping.keyField.name, ext.toArray))
  }

  /** One value's base-key postings: bloom-and-run-index-pruned point read
    * of the index bucket the value routes to. */
  private def lookupOne(
      idxDir: String, ek: Array[Byte], buckets: Int): Seq[Array[Byte]] = {
    val b = TokenRing.bucket(ek, buckets)
    val hi = java.util.Arrays.copyOf(ek, ek.length + 1) // succ: ek ++ 0x00
    val it = new CellStore.BucketMergeIterator(idxDir, b, ek, hi,
      lookupKeys = Seq(ek))
    try it.filter(c => java.util.Arrays.equals(c.key, ek)).map(_.col).toVector
    finally it.close()
  }
}
