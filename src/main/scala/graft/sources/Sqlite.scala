package graft.sources

import scala.collection.mutable.ArrayBuffer

/**
 * Minimal read-only SQLite3 file parser — enough of the PUBLIC file
 * format (sqlite.org/fileformat2.html) to scan table b-trees: page
 * header walk, table interior/leaf cells, record serial types, and
 * overflow-page chains. No SQL, no indexes, no writes.
 *
 * IO shape: page-level random access over a seekable [[ByteSource]]
 * with a small LRU page cache — an 800 MB Natural Earth sqlite is read
 * page-by-page through the Hadoop FileSystem API (any scheme: file://,
 * hdfs://, s3a://), never slurped whole into task memory and never
 * captured in a task closure. The b-tree scan touches pages in DFS
 * order, so the cache only needs to hold the interior-page fringe plus
 * the current leaf/overflow chain (default 256 pages ≈ 1 MB).
 *
 * This unlocks the reference's SQLite-backed sources without any
 * SQLite library: GeoPackage (`reader/GeoPackageReader.java`), Natural
 * Earth (`reader/NaturalEarthReader.java`) and MBTiles archives
 * (`mbtiles/Mbtiles.java` — incl. the compact map+images schema).
 */
object Sqlite {

  /** One table row: rowid + column values (null | Long | Double |
    * String | Array[Byte]). */
  type Row = (Long, Array[Any])

  /** Positioned-read byte source (the subset of FSDataInputStream the
    * parser needs). */
  trait ByteSource extends java.io.Closeable {
    def readFully(pos: Long, buf: Array[Byte], off: Int, len: Int): Unit
  }

  final class BytesSource(bytes: Array[Byte]) extends ByteSource {
    override def readFully(pos: Long, buf: Array[Byte], off: Int, len: Int): Unit =
      System.arraycopy(bytes, pos.toInt, buf, off, len)
    override def close(): Unit = ()
  }

  /** Hadoop-FS positioned reads — works for any registered scheme. */
  final class HadoopSource(in: org.apache.hadoop.fs.FSDataInputStream) extends ByteSource {
    override def readFully(pos: Long, buf: Array[Byte], off: Int, len: Int): Unit =
      in.readFully(pos, buf, off, len)
    override def close(): Unit = in.close()
  }

  final class Db(source: ByteSource, cachePages: Int = 256) extends java.io.Closeable {

    def this(bytes: Array[Byte]) = this(new BytesSource(bytes))

    private val header = new Array[Byte](100)
    source.readFully(0L, header, 0, 100)
    require(new String(header, 0, 15, "ISO-8859-1") == "SQLite format 3", "not an SQLite file")
    private val pageSize: Int = {
      val raw = ((header(16) & 0xff) << 8) | (header(17) & 0xff)
      if (raw == 1) 65536 else raw
    }
    private val reserved: Int = header(20) & 0xff
    private val usable: Int = pageSize - reserved

    override def close(): Unit = source.close()

    // LRU page cache (access-ordered); eldest evicted past cachePages
    private val cache = new java.util.LinkedHashMap[Int, Array[Byte]](64, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[Int, Array[Byte]]): Boolean =
        size() > cachePages
    }

    /** Fetch page `no` (1-based) through the cache. */
    private def page(no: Int): Array[Byte] = {
      var p = cache.get(no)
      if (p == null) {
        p = new Array[Byte](pageSize)
        source.readFully((no - 1L) * pageSize, p, 0, pageSize)
        cache.put(no, p)
      }
      p
    }

    private def u16(p: Array[Byte], off: Int): Int =
      ((p(off) & 0xff) << 8) | (p(off + 1) & 0xff)
    private def u32(p: Array[Byte], off: Int): Long =
      ((p(off) & 0xffL) << 24) | ((p(off + 1) & 0xffL) << 16) |
        ((p(off + 2) & 0xffL) << 8) | (p(off + 3) & 0xffL)

    private def varintOf(p: Array[Byte], off: Int): (Long, Int) = {
      var v = 0L
      var i = 0
      while (i < 8) {
        val b = p(off + i)
        v = (v << 7) | (b & 0x7fL)
        i += 1
        if ((b & 0x80) == 0) return (v, i)
      }
      ((v << 8) | (p(off + 8) & 0xffL), 9)
    }

    /** Collect a full cell payload (page-local inline part + overflow
      * chain). */
    private def payload(p: Array[Byte], off0: Int, total: Long): Array[Byte] = {
      val x = usable - 35
      if (total <= x) java.util.Arrays.copyOfRange(p, off0, off0 + total.toInt)
      else {
        val m = (usable - 12) * 32 / 255 - 23
        val k = m + ((total - m) % (usable - 4)).toInt
        val inline = if (k <= x) k else m
        val out = new java.io.ByteArrayOutputStream(total.toInt)
        out.write(p, off0, inline)
        var pageNo = u32(p, off0 + inline)
        var remaining = total - inline
        while (pageNo != 0 && remaining > 0) {
          val op = page(pageNo.toInt)
          val take = math.min(remaining, (usable - 4).toLong).toInt
          out.write(op, 4, take)
          remaining -= take
          pageNo = u32(op, 0)
        }
        out.toByteArray
      }
    }

    /** Decode a record (header serial types + body). */
    private def record(p: Array[Byte]): Array[Any] = {
      val (hdrLen, n0) = varintOf(p, 0)
      var pos = n0
      val types = ArrayBuffer.empty[Long]
      while (pos < hdrLen) {
        val (t, n) = varintOf(p, pos)
        types += t
        pos += n
      }
      var body = hdrLen.toInt
      types.map { t =>
        val (v, size) = t match {
          case 0 => (null, 0)
          case 1 => (p(body).toLong, 1)
          case 2 => (((p(body).toLong << 8) | (p(body + 1) & 0xffL)), 2)
          case 3 => ((p(body).toLong << 16) | ((p(body + 1) & 0xffL) << 8) | (p(body + 2) & 0xffL), 3)
          case 4 => (be(p, body, 4), 4)
          case 5 => (be(p, body, 6), 6)
          case 6 => (be(p, body, 8), 8)
          case 7 => (java.lang.Double.longBitsToDouble(be(p, body, 8)), 8)
          case 8 => (0L, 0)
          case 9 => (1L, 0)
          case b if b >= 12 && b % 2 == 0 =>
            val len = ((b - 12) / 2).toInt
            (java.util.Arrays.copyOfRange(p, body, body + len): Any, len)
          case s if s >= 13 =>
            val len = ((s - 13) / 2).toInt
            (new String(p, body, len, "UTF-8"): Any, len)
          case other => throw new IllegalArgumentException(s"serial type $other")
        }
        body += size
        v
      }.toArray
    }

    private def be(p: Array[Byte], off: Int, n: Int): Long = {
      var v = if ((p(off) & 0x80) != 0) -1L else 0L // sign extend
      var i = 0
      while (i < n) { v = (v << 8) | (p(off + i) & 0xffL); i += 1 }
      v
    }

    /** Depth-first scan of a table b-tree rooted at `pageNo` (1-based).
      * All cell offsets are page-local, so each step touches one cached
      * page (plus any overflow chain). */
    def scanTable(pageNo: Int): Iterator[Row] = {
      val p = page(pageNo)
      val hdr = if (pageNo == 1) 100 else 0
      val pageType = p(hdr) & 0xff
      val nCells = u16(p, hdr + 3)
      pageType match {
        case 13 => // table leaf
          (0 until nCells).iterator.map { i =>
            val off = u16(p, hdr + 8 + 2 * i)
            val (len, n1) = varintOf(p, off)
            val (rowid, n2) = varintOf(p, off + n1)
            (rowid, record(payload(p, off + n1 + n2, len)))
          }
        case 5 => // table interior
          val children = (0 until nCells).map(i => u32(p, u16(p, hdr + 12 + 2 * i)).toInt) :+
            u32(p, hdr + 8).toInt
          children.iterator.flatMap(scanTable)
        case other => throw new IllegalArgumentException(s"unexpected page type $other at page $pageNo")
      }
    }

    /**
     * Rowid split keys for the table b-tree at `pageNo` — interior-cell
     * keys (each = max rowid of its child subtree) gathered level by
     * level until at least `target` ranges exist or leaves are reached.
     * ANY sorted key set partitions the rowid space exactly (ranges
     * `(-inf,k1], (k1,k2], …, (km,+inf)`), so callers can turn these
     * into disjoint [[scanTableRange]] partitions that together cover
     * the table exactly once. Only interior pages are read — the
     * fringe, not the data.
     */
    def splitKeys(pageNo: Int, target: Int): Seq[Long] = {
      var keys = Vector.empty[Long]
      var frontier = List(pageNo)
      while (frontier.nonEmpty && keys.length + 1 < target) {
        val next = ArrayBuffer.empty[Int]
        val ks = ArrayBuffer.empty[Long]
        frontier.foreach { pn =>
          val p = page(pn)
          val hdr = if (pn == 1) 100 else 0
          if ((p(hdr) & 0xff) == 5) { // table interior
            val n = u16(p, hdr + 3)
            var i = 0
            while (i < n) {
              val off = u16(p, hdr + 12 + 2 * i)
              next += u32(p, off).toInt
              ks += varintOf(p, off + 4)._1
              i += 1
            }
            next += u32(p, hdr + 8).toInt
          }
        }
        keys = (keys ++ ks).distinct.sorted
        frontier = if (keys.length + 1 >= target) Nil else next.toList
      }
      keys
    }

    /** Depth-first scan restricted to rowids in [lo, hi]; interior
      * subtrees wholly outside the range are pruned without fetching
      * their pages — the executor-side half of a rowid-range-partitioned
      * parallel table scan. */
    def scanTableRange(pageNo: Int, lo: Long, hi: Long): Iterator[Row] = {
      val p = page(pageNo)
      val hdr = if (pageNo == 1) 100 else 0
      val pageType = p(hdr) & 0xff
      val nCells = u16(p, hdr + 3)
      pageType match {
        case 13 => // table leaf
          (0 until nCells).iterator.flatMap { i =>
            val off = u16(p, hdr + 8 + 2 * i)
            val (len, n1) = varintOf(p, off)
            val (rowid, n2) = varintOf(p, off + n1)
            if (rowid >= lo && rowid <= hi)
              Iterator.single((rowid, record(payload(p, off + n1 + n2, len))))
            else Iterator.empty
          }
        case 5 => // table interior: child i covers (prevKey, key_i]
          val kids = ArrayBuffer.empty[Int]
          var prev = Long.MinValue
          var i = 0
          while (i < nCells) {
            val off = u16(p, hdr + 12 + 2 * i)
            val key = varintOf(p, off + 4)._1
            if (key >= lo && prev < hi) kids += u32(p, off).toInt
            prev = key
            i += 1
          }
          if (prev < hi) kids += u32(p, hdr + 8).toInt // rightmost: (prev, inf)
          kids.iterator.flatMap(scanTableRange(_, lo, hi))
        case other => throw new IllegalArgumentException(s"unexpected page type $other at page $pageNo")
      }
    }

    /** sqlite_master: (type, name, tbl_name, rootpage, sql). */
    lazy val master: Seq[(String, String, String, Int, String)] =
      scanTable(1).map { case (_, v) =>
        (str(v(0)), str(v(1)), str(v(2)),
          Option(v(3)).map(_.asInstanceOf[Long].toInt).getOrElse(0), str(v(4)))
      }.toSeq

    private def str(a: Any): String = if (a == null) null else a.toString

    // SQLite identifiers are case-insensitive: `CREATE TABLE Tiles`
    // and a lookup for "tiles" name the same table
    def tableRoot(name: String): Option[Int] =
      master.collectFirst { case ("table", n, _, root, _) if n.equalsIgnoreCase(name) => root }

    /** Column (name, isIntegerPrimaryKey) from the CREATE TABLE sql
      * (best-effort: top-level comma split, quoted identifiers
      * unwrapped). */
    def columns(name: String): Seq[(String, Boolean)] = {
      val sql = master.collectFirst { case ("table", n, _, _, s) if n.equalsIgnoreCase(name) => s }
        .getOrElse(return Seq.empty)
      val open = sql.indexOf('(')
      val close = sql.lastIndexOf(')')
      if (open < 0 || close <= open) return Seq.empty
      val body = sql.substring(open + 1, close)
      val cols = ArrayBuffer.empty[String]
      var depth = 0
      val cur = new StringBuilder
      (body + ",").foreach {
        case '(' => depth += 1; cur += '('
        case ')' => depth -= 1; cur += ')'
        case ',' if depth == 0 => cols += cur.toString.trim; cur.clear()
        case c => cur += c
      }
      def unquote(s: String): String = s.stripPrefix("\"").stripSuffix("\"")
        .stripPrefix("`").stripSuffix("`").stripPrefix("[").stripSuffix("]")
      // the table-constraint form `PRIMARY KEY(x)` also makes a single
      // INTEGER column a rowid alias (stored NULL) — sqlite docs §ROWID
      val tablePkCol: Option[String] = cols.toSeq.collectFirst {
        case c if c.toUpperCase.matches("(?s)PRIMARY\\s+KEY\\s*\\(\\s*[^,()]+\\s*\\)") =>
          unquote(c.substring(c.indexOf('(') + 1, c.lastIndexOf(')')).trim
            .split("\\s+")(0)) // tolerate `PRIMARY KEY(x ASC)`
      }
      // table-constraint detection needs a WORD BOUNDARY after the
      // keyword: a column named `checksum` or `unique_id` must not be
      // dropped (which would shift every later column's values)
      val constraintRe =
        "(?is)^(PRIMARY|FOREIGN|UNIQUE|CHECK|CONSTRAINT)\\b.*".r
      cols.toSeq
        .filterNot(c => constraintRe.matches(c.trim))
        .map { c =>
          val n = unquote(c.split("\\s+")(0))
          val inlineIpk = c.toUpperCase.matches("(?s).*INTEGER\\s+PRIMARY\\s+KEY.*")
          val constraintIpk = tablePkCol.exists(_.equalsIgnoreCase(n)) &&
            c.toUpperCase.matches("(?s).*\\bINTEGER\\b.*")
          (n, inlineIpk || constraintIpk)
        }
        .filter(_._1.nonEmpty)
    }

    def columnNames(name: String): Seq[String] = columns(name).map(_._1)

    /** Scan a named table as (columnName -> value) maps. */
    def rows(table: String): Iterator[(Long, Map[String, Any])] =
      rowsRange(table, Long.MinValue, Long.MaxValue)

    /** [[rows]] restricted to rowids in [lo, hi] (b-tree pruned). */
    def rowsRange(table: String, lo: Long, hi: Long): Iterator[(Long, Map[String, Any])] = {
      val root = tableRoot(table)
        .getOrElse(throw new IllegalArgumentException(s"no such table: $table"))
      val cols = columns(table)
      scanTableRange(root, lo, hi).map { case (rowid, vals) =>
        val m = cols.zipWithIndex.map { case ((n, isIpk), i) =>
          // an INTEGER PRIMARY KEY column stores null and aliases rowid
          val v = if (i < vals.length) vals(i) else null
          n -> (if (v == null && isIpk) rowid: Any else v)
        }.toMap
        (rowid, m)
      }
    }
  }

  /** Open through the Hadoop FileSystem API — scheme-agnostic,
    * page-at-a-time positioned reads, no whole-file buffering. */
  def open(path: String, conf: org.apache.hadoop.conf.Configuration): Db = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    new Db(new HadoopSource(fs.open(p)))
  }

  def open(path: String): Db = open(path, new org.apache.hadoop.conf.Configuration())
}
