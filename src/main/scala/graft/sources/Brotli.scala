package graft.sources

import java.io.{DataInputStream, IOException}

/** Pure-JVM Brotli (RFC 7932) decompressor.
  *
  * The reference's landing format is one brotli-compressed JSON document
  * per minute (`YYYY/MM/DD/HH/MM.br` — local_development_helpers.py:14,
  * process_snapshot.py:324-342 pipes downloads through `brotli -d`).
  * Spark's classpath carries only brotli *wrappers* (commons-compress,
  * orc) that require an external native binding, so graft ships its own
  * decoder: a direct implementation of RFC 7932 — window/meta-block
  * framing, simple+complex prefix codes, block switching, context
  * modeling, the distance ring buffer, and the static dictionary with
  * all 121 word transforms.
  *
  * The normative data tables (Appendix A dictionary, Appendix B context
  * maps, the transform prefix/suffix strings) are carried verbatim as a
  * resource blob (`rfc7932_tables.bin`) — they are spec constants, the
  * same bytes every conforming implementation embeds.
  *
  * Decoding is a pure function of the input array (no shared mutable
  * state), so it is safe to call from any number of executor threads —
  * the intended use is `mapPartitions` over `binaryFile` rows, which
  * keeps decode fully distributed (the codec-boundary analogue of the
  * reference's per-file subprocess decode, minus the subprocess).
  */
object Brotli {

  // ---------- RFC 7932 normative tables (resource blob) ----------

  private lazy val tables: (Array[Byte], Array[Byte], Array[Byte], Array[Byte], Array[Int]) = {
    val in = new DataInputStream(
      getClass.getResourceAsStream("/graft/brotli/rfc7932_tables.bin"))
    try {
      val sizes = Array.fill(5)(in.readInt())
      val parts = sizes.map { n => val b = new Array[Byte](n); in.readFully(b); b }
      val psMap = Array.tabulate(50)(i =>
        (parts(4)(2 * i) & 0xff) | ((parts(4)(2 * i + 1) & 0xff) << 8))
      (parts(0), parts(1), parts(2), parts(3), psMap)
    } finally in.close()
  }
  private def dictData: Array[Byte] = tables._1      // 122,784 B, Appendix A
  private def contextLut: Array[Byte] = tables._2    // 4 modes x 512, §7.1
  private def transformsData: Array[Byte] = tables._3 // 121 x (prefix,type,suffix)
  private def prefixSuffix: Array[Byte] = tables._4  // length-prefixed strings
  private def psMap: Array[Int] = tables._5          // 50 offsets into the above

  /** Appendix A: number of words per length is 1 << sizeBits(len). */
  private val dictSizeBits =
    Array(0, 0, 0, 0, 10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8, 7, 7, 8, 7, 7, 6, 6, 5, 5)
  private val dictOffsets: Array[Int] = {
    val o = new Array[Int](26)
    var i = 4
    while (i < 25) { o(i + 1) = o(i) + (i << dictSizeBits(i)); i += 1 }
    o
  }

  /** §6: block count code — 26 symbols of (base, extra bits). */
  private val blockCountBase = Array(
    1, 5, 9, 13, 17, 25, 33, 41, 49, 65, 81, 97, 113, 145, 177, 209, 241, 305,
    369, 497, 753, 1265, 2289, 4337, 8433, 16625)
  private val blockCountBits = Array(
    2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 6, 6, 7, 8, 9, 10, 11, 12, 13, 24)

  /** §5: insert length code — 24 symbols of (base, extra bits). */
  private val insertBase = Array(
    0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50, 66, 98, 130, 194, 322, 578,
    1090, 2114, 6210, 22594)
  private val insertBits = Array(
    0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10, 12, 14, 24)

  /** §5: copy length code — 24 symbols of (base, extra bits). */
  private val copyBase = Array(
    2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22, 30, 38, 54, 70, 102, 134, 198,
    326, 582, 1094, 2118)
  private val copyBits = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10, 24)

  /** §3.5: the fixed order in which code-length-code lengths appear. */
  private val clcOrder = Array(1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  private def err(msg: String): Nothing = throw new IOException(s"brotli: $msg")

  // ---------- bit reader (LSB-first within bytes, §3.1) ----------

  private final class BitReader(buf: Array[Byte]) {
    private var pos = 0
    private var bitBuf = 0L
    private var bitCnt = 0
    def readBits(n: Int): Int = {
      while (bitCnt < n) {
        if (pos >= buf.length) err("unexpected end of input")
        bitBuf |= (buf(pos) & 0xffL) << bitCnt
        pos += 1; bitCnt += 8
      }
      val v = (bitBuf & ((1L << n) - 1)).toInt
      bitBuf >>>= n; bitCnt -= n
      v
    }
    def readBit(): Int = readBits(1)
    def alignToByte(): Unit = { val r = bitCnt & 7; bitBuf >>>= r; bitCnt -= r }
    /** next whole byte; callers align first */
    def readAlignedByte(): Int =
      if (bitCnt >= 8) { val v = (bitBuf & 0xff).toInt; bitBuf >>>= 8; bitCnt -= 8; v }
      else {
        if (pos >= buf.length) err("unexpected end of input")
        val v = buf(pos) & 0xff; pos += 1; v
      }
  }

  // ---------- canonical prefix codes (§3.2) ----------

  /** Canonical prefix decoder: first bit read is the MSB of the code.
    * Symbols within a length class are ordered by symbol value. */
  private final class Prefix(lens: Array[Int]) {
    private val maxLen = { var m = 0; var i = 0; while (i < lens.length) { if (lens(i) > m) m = lens(i); i += 1 }; m }
    val singleSymbol: Int = {
      var nz = 0; var s = -1; var i = 0
      while (i < lens.length) { if (lens(i) > 0) { nz += 1; s = i }; i += 1 }
      if (nz <= 1) math.max(s, 0) else -1
    }
    private val count = new Array[Int](maxLen + 1)
    private val firstCode = new Array[Int](maxLen + 2)
    private val offset = new Array[Int](maxLen + 2)
    private val syms: Array[Int] = {
      var i = 0
      while (i < lens.length) { if (lens(i) > 0) count(lens(i)) += 1; i += 1 }
      var l = 1
      while (l <= maxLen) {
        firstCode(l + 1) = (firstCode(l) + count(l)) << 1
        offset(l + 1) = offset(l) + count(l)
        l += 1
      }
      val out = new Array[Int](offset(maxLen + 1))
      val fill = offset.clone()
      i = 0
      while (i < lens.length) {
        val ln = lens(i)
        if (ln > 0) { out(fill(ln)) = i; fill(ln) += 1 }
        i += 1
      }
      out
    }
    def read(br: BitReader): Int = {
      if (singleSymbol >= 0 && syms.length <= 1) return singleSymbol
      var code = 0; var len = 0
      while (len < 32) {
        code = (code << 1) | br.readBit()
        len += 1
        if (len <= maxLen && code - firstCode(len) < count(len))
          return syms(offset(len) + code - firstCode(len))
      }
      err("invalid prefix code word")
    }
  }

  /** §3.5 fixed code for the code-length alphabet {0..5}. */
  private def readClcSymbol(br: BitReader): Int = {
    val b0 = br.readBit(); val b1 = br.readBit()
    (b0 | (b1 << 1)) match {
      case 0 => 0
      case 1 => 4
      case 2 => 3
      case _ =>
        if (br.readBit() == 0) 2
        else if (br.readBit() == 0) 1
        else 5
    }
  }

  private def log2ceil(n: Int): Int = {
    var b = 0
    while ((1 << b) < n) b += 1
    b
  }

  /** §3.4/§3.5: read a prefix code over `alphabetSize` symbols. */
  private def readHuffmanCode(alphabetSize: Int, br: BitReader): Prefix = {
    val lens = new Array[Int](alphabetSize)
    val skip = br.readBits(2)
    if (skip == 1) {
      // simple code: 1..4 symbols listed explicitly
      val nsym = br.readBits(2) + 1
      val alphaBits = log2ceil(alphabetSize)
      val symbols = new Array[Int](nsym)
      var i = 0
      while (i < nsym) {
        val s = br.readBits(alphaBits)
        if (s >= alphabetSize) err("simple code symbol out of range")
        var j = 0
        while (j < i) { if (symbols(j) == s) err("duplicate simple code symbol"); j += 1 }
        symbols(i) = s
        i += 1
      }
      nsym match {
        case 1 => lens(symbols(0)) = 1 // marker; Prefix emits it with 0 bits
        case 2 => lens(symbols(0)) = 1; lens(symbols(1)) = 1
        case 3 => lens(symbols(0)) = 1; lens(symbols(1)) = 2; lens(symbols(2)) = 2
        case _ =>
          if (br.readBit() == 0) { symbols.foreach(lens(_) = 2) }
          else {
            lens(symbols(0)) = 1; lens(symbols(1)) = 2
            lens(symbols(2)) = 3; lens(symbols(3)) = 3
          }
      }
      new Prefix(lens)
    } else {
      // complex code: code lengths for the code-length code first
      val clLens = new Array[Int](18)
      var space = 32
      var numCl = 0
      var i = skip // skip == 0, 2 or 3 leading entries of clcOrder
      while (i < 18 && space > 0) {
        val v = readClcSymbol(br)
        clLens(clcOrder(i)) = v
        if (v != 0) { space -= 32 >> v; numCl += 1 }
        i += 1
      }
      if (space != 0 && numCl != 1) err("corrupt code-length code")
      val clCode = new Prefix(clLens)
      // then the symbol code lengths with 16/17 repeat semantics
      var symbol = 0
      var prevLen = 8
      var repeat = 0
      var repeatLen = 0
      var space2 = 32768
      while (symbol < alphabetSize && space2 > 0) {
        val p = clCode.read(br)
        if (p < 16) {
          lens(symbol) = p; symbol += 1
          if (p != 0) { prevLen = p; space2 -= 32768 >> p }
          repeat = 0
        } else {
          val extra = p - 14 // 16 -> 2 bits, 17 -> 3 bits
          val newLen = if (p == 16) prevLen else 0
          if (repeatLen != newLen) { repeat = 0; repeatLen = newLen }
          val old = repeat
          if (repeat > 0) { repeat -= 2; repeat <<= extra }
          repeat += br.readBits(extra) + 3
          val delta = repeat - old
          if (symbol + delta > alphabetSize) err("repeat overflows alphabet")
          var j = 0
          while (j < delta) { lens(symbol) = repeatLen; symbol += 1; j += 1 }
          if (repeatLen != 0) space2 -= delta << (15 - repeatLen)
        }
      }
      if (space2 != 0) {
        var nz = 0; var k = 0
        while (k < alphabetSize) { if (lens(k) > 0) nz += 1; k += 1 }
        if (nz != 1) err("unbalanced prefix code")
      }
      new Prefix(lens)
    }
  }

  // ---------- context map (§7.3) ----------

  private def inverseMoveToFront(map: Array[Byte]): Unit = {
    val mtf = Array.tabulate(256)(_.toByte)
    var i = 0
    while (i < map.length) {
      val idx = map(i) & 0xff
      val v = mtf(idx)
      map(i) = v
      var j = idx
      while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
      mtf(0) = v
      i += 1
    }
  }

  private def readContextMap(size: Int, nTrees: Int, br: BitReader): Array[Byte] = {
    val map = new Array[Byte](size)
    if (nTrees <= 1) return map
    val rleMax = if (br.readBit() == 1) br.readBits(4) + 1 else 0
    val code = readHuffmanCode(nTrees + rleMax, br)
    var i = 0
    while (i < size) {
      val s = code.read(br)
      if (s == 0) { map(i) = 0; i += 1 }
      else if (s <= rleMax) {
        var reps = (1 << s) + br.readBits(s)
        if (i + reps > size) err("context map run overflow")
        while (reps > 0) { map(i) = 0; i += 1; reps -= 1 }
      } else {
        map(i) = (s - rleMax).toByte; i += 1
      }
    }
    if (br.readBit() == 1) inverseMoveToFront(map)
    map
  }

  // ---------- block switching (§6) ----------

  private def readBlockCount(code: Prefix, br: BitReader): Int = {
    val s = code.read(br)
    blockCountBase(s) + br.readBits(blockCountBits(s))
  }

  private final class Blocks(val nTypes: Int, br: BitReader) {
    var curType = 0
    private var prevType = 1
    private var typeCode: Prefix = null
    private var countCode: Prefix = null
    private var count = Int.MaxValue
    if (nTypes >= 2) {
      typeCode = readHuffmanCode(nTypes + 2, br)
      countCode = readHuffmanCode(26, br)
      count = readBlockCount(countCode, br)
    }
    /** consume one element of this category, switching blocks first if
      * the current block is exhausted */
    def tick(br: BitReader): Unit = {
      if (nTypes >= 2) {
        if (count == 0) {
          val t = typeCode.read(br)
          val nt =
            if (t == 0) prevType
            else if (t == 1) (curType + 1) % nTypes
            else t - 2
          prevType = curType; curType = nt
          count = readBlockCount(countCode, br)
        }
        count -= 1
      }
    }
  }

  // ---------- variable-length type counts (§9.2) ----------

  private def readVarLenTypes(br: BitReader): Int =
    if (br.readBit() == 0) 1
    else {
      val n = br.readBits(3)
      if (n == 0) 2 else (1 << n) + br.readBits(n) + 1
    }

  // ---------- dictionary word transforms (Appendix B) ----------

  private def psEntry(idx: Int): (Int, Int) = {
    val off = psMap(idx)
    ((off + 1), prefixSuffix(off) & 0xff) // (start, length)
  }

  /** "Ferment" one position (brotli's UTF-8-aware uppercasing). */
  private def ferment(buf: Array[Byte], off: Int, end: Int): Int = {
    val b = buf(off) & 0xff
    if (b < 192) {
      if (b >= 'a' && b <= 'z') buf(off) = (b ^ 32).toByte
      1
    } else if (b < 224) {
      if (off + 1 < end) buf(off + 1) = (buf(off + 1) ^ 32).toByte
      2
    } else {
      if (off + 2 < end) buf(off + 2) = (buf(off + 2) ^ 5).toByte
      3
    }
  }

  // ---------- main decode ----------

  private def decodeWindowBits(br: BitReader): Int = {
    if (br.readBit() == 0) return 16
    var n = br.readBits(3)
    if (n != 0) return 17 + n
    n = br.readBits(3)
    if (n != 0) {
      if (n == 1) err("reserved window-bits pattern")
      return 8 + n
    }
    17
  }

  /** Decompress a complete brotli stream. Pure function; thread-safe.
    * All failures — including the index/size runtime errors a corrupt
    * or truncated stream can drive the table lookups into — surface as
    * `IOException("brotli: ...")`, so callers have ONE failure type to
    * wrap with file context. */
  def decompress(input: Array[Byte]): Array[Byte] =
    try decompressImpl(input)
    catch {
      case e: IOException => throw e
      case e: RuntimeException =>
        throw new IOException(s"brotli: corrupt stream (${e.getClass.getSimpleName}: ${e.getMessage})", e)
    }

  private def decompressImpl(input: Array[Byte]): Array[Byte] = {
    val br = new BitReader(input)
    val wbits = decodeWindowBits(br)
    val windowSize = (1 << wbits) - 16

    var out = new Array[Byte](math.min(1 << 16, math.max(64, input.length * 4)))
    var outLen = 0
    def ensure(extra: Int): Unit =
      if (outLen + extra > out.length) {
        var n = out.length * 2
        while (n < outLen + extra) n *= 2
        out = java.util.Arrays.copyOf(out, n)
      }

    val distRing = Array(16, 15, 11, 4)
    var distIdx = 0
    def ringAt(back: Int): Int = distRing((distIdx + 4 - back) & 3) // back = 1..4
    def pushDistance(d: Int): Unit = { distRing(distIdx & 3) = d; distIdx += 1 }

    var isLast = false
    while (!isLast) {
      isLast = br.readBit() == 1
      if (isLast && br.readBit() == 1) {
        // ISLASTEMPTY
      } else {
        val mNibbles = br.readBits(2) match {
          case 0 => 4
          case 1 => 5
          case 2 => 6
          case _ => 0
        }
        if (mNibbles == 0) {
          // metadata meta-block: skip
          if (isLast) err("metadata meta-block marked last")
          if (br.readBit() != 0) err("corrupt metadata reserved bit")
          val skipBytes = br.readBits(2)
          var skipLen = 0
          var i = 0
          while (i < skipBytes) {
            val b = br.readBits(8)
            if (b == 0 && i + 1 == skipBytes && skipBytes > 1) err("non-minimal metadata length")
            skipLen |= b << (8 * i)
            i += 1
          }
          if (skipBytes > 0) skipLen += 1
          br.alignToByte()
          var j = 0
          while (j < skipLen) { br.readAlignedByte(); j += 1 }
        } else {
          var mlenM1 = 0
          var i = 0
          while (i < mNibbles) {
            val nib = br.readBits(4)
            if (nib == 0 && i + 1 == mNibbles && mNibbles > 4) err("non-minimal MLEN")
            mlenM1 |= nib << (4 * i)
            i += 1
          }
          val mlen = mlenM1 + 1
          val uncompressed = !isLast && br.readBit() == 1
          ensure(mlen)
          if (uncompressed) {
            br.alignToByte()
            var j = 0
            while (j < mlen) { out(outLen) = br.readAlignedByte().toByte; outLen += 1; j += 1 }
          } else {
            // ---- compressed meta-block header ----
            val blocksL = new Blocks(readVarLenTypes(br), br)
            val blocksI = new Blocks(readVarLenTypes(br), br)
            val blocksD = new Blocks(readVarLenTypes(br), br)
            val nPostfix = br.readBits(2)
            val nDirect = br.readBits(4) << nPostfix
            val postfixMask = (1 << nPostfix) - 1
            val contextModes = Array.fill(blocksL.nTypes)(br.readBits(2))
            val nTreesL = readVarLenTypes(br)
            val cmapL = readContextMap(64 * blocksL.nTypes, nTreesL, br)
            val nTreesD = readVarLenTypes(br)
            val cmapD = readContextMap(4 * blocksD.nTypes, nTreesD, br)
            val literalCodes = Array.fill(nTreesL)(readHuffmanCode(256, br))
            val cmdCodes = Array.fill(blocksI.nTypes)(readHuffmanCode(704, br))
            val distAlphabet = 16 + nDirect + (48 << nPostfix)
            val distCodes = Array.fill(nTreesD)(readHuffmanCode(distAlphabet, br))

            // ---- command loop ----
            var remaining = mlen
            while (remaining > 0) {
              blocksI.tick(br)
              val cmd = cmdCodes(blocksI.curType).read(br)
              val cell = cmd >>> 6
              val implicitD0 = cell < 2
              val r = if (cell >= 2) cell - 2 else cell
              val insCode = (((0x29850 >> (r * 2)) & 3) << 3) | ((cmd >> 3) & 7)
              val cpyCode = (((0x26244 >> (r * 2)) & 3) << 3) | (cmd & 7)
              val insertLen = insertBase(insCode) + br.readBits(insertBits(insCode))
              val copyLen = copyBase(cpyCode) + br.readBits(copyBits(cpyCode))

              if (insertLen > remaining) err("insert length exceeds meta-block")
              var j = 0
              while (j < insertLen) {
                blocksL.tick(br)
                val mode = contextModes(blocksL.curType)
                val p1 = if (outLen > 0) out(outLen - 1) & 0xff else 0
                val p2 = if (outLen > 1) out(outLen - 2) & 0xff else 0
                val ctx = (contextLut(512 * mode + p1) | contextLut(512 * mode + 256 + p2)) & 0xff
                val tree = literalCodes(cmapL(64 * blocksL.curType + ctx) & 0xff)
                out(outLen) = tree.read(br).toByte
                outLen += 1
                j += 1
              }
              remaining -= insertLen

              if (remaining > 0) {
                val maxDistance = math.min(windowSize, outLen)
                val distance =
                  if (implicitD0) ringAt(1)
                  else {
                    blocksD.tick(br)
                    val distCtx = math.min(copyLen, 5) - 2
                    val tree = distCodes(cmapD(4 * blocksD.curType + distCtx) & 0xff)
                    val dcode = tree.read(br)
                    val d =
                      if (dcode < 16) {
                        if (dcode < 4) ringAt(dcode + 1)
                        else {
                          val base = if (dcode < 10) ringAt(1) else ringAt(2)
                          val k = if (dcode < 10) dcode - 4 else dcode - 10
                          // k: 0-> -1, 1-> +1, 2-> -2, 3-> +2, 4-> -3, 5-> +3
                          val delta = (k / 2 + 1) * (if ((k & 1) == 0) -1 else 1)
                          base + delta
                        }
                      } else if (dcode < 16 + nDirect) {
                        dcode - 16 + 1
                      } else {
                        val x = dcode - nDirect - 16
                        val postfix = x & postfixMask
                        val h = x >> nPostfix
                        val nbits = 1 + (h >> 1)
                        val offset = ((2 + (h & 1)) << nbits) - 4
                        ((offset + br.readBits(nbits)) << nPostfix) + postfix + nDirect + 1
                      }
                    if (d <= 0) err("non-positive distance")
                    if (dcode != 0 && d <= maxDistance) pushDistance(d)
                    d
                  }

                if (distance <= maxDistance) {
                  if (copyLen > remaining) err("copy length exceeds meta-block")
                  ensure(copyLen)
                  var src = outLen - distance
                  var k = 0
                  while (k < copyLen) { out(outLen) = out(src); outLen += 1; src += 1; k += 1 }
                  remaining -= copyLen
                } else {
                  // static dictionary reference (§8)
                  if (copyLen < 4 || copyLen > 24) err(s"dictionary copy length $copyLen")
                  val wordId = distance - maxDistance - 1
                  val nWords = 1 << dictSizeBits(copyLen)
                  val index = wordId & (nWords - 1)
                  val transformId = wordId >> dictSizeBits(copyLen)
                  if (transformId >= 121) err(s"transform id $transformId")
                  val wordOff = dictOffsets(copyLen) + index * copyLen
                  val prefixIdx = transformsData(3 * transformId) & 0xff
                  val ttype = transformsData(3 * transformId + 1) & 0xff
                  val suffixIdx = transformsData(3 * transformId + 2) & 0xff
                  val (pOff, pLen) = psEntry(prefixIdx)
                  val (sOff, sLen) = psEntry(suffixIdx)
                  ensure(pLen + copyLen + sLen)
                  var w = 0
                  while (w < pLen) { out(outLen) = prefixSuffix(pOff + w); outLen += 1; w += 1 }
                  // transformed word
                  val skipFirst = if (ttype >= 12) ttype - 11 else 0
                  val dropLast = if (ttype >= 1 && ttype <= 9) ttype else 0
                  val wLen = copyLen - skipFirst - dropLast
                  if (wLen < 0) err("transform longer than word")
                  val wordStart = outLen
                  w = 0
                  while (w < wLen) {
                    out(outLen) = dictData(wordOff + skipFirst + w); outLen += 1; w += 1
                  }
                  if (ttype == 10) { if (wLen > 0) ferment(out, wordStart, outLen) }
                  else if (ttype == 11) {
                    var fp = wordStart
                    while (fp < outLen) fp += ferment(out, fp, outLen)
                  }
                  w = 0
                  while (w < sLen) { out(outLen) = prefixSuffix(sOff + w); outLen += 1; w += 1 }
                  val produced = pLen + wLen + sLen
                  if (produced > remaining) err("dictionary word exceeds meta-block")
                  remaining -= produced
                }
              }
            }
            if (remaining != 0) err("meta-block length mismatch")
          }
        }
      }
    }
    java.util.Arrays.copyOf(out, outLen)
  }

  // ---------- minimal encoder (uncompressed meta-blocks) ----------

  /** Wrap raw bytes as a VALID brotli stream of uncompressed
    * meta-blocks (RFC 9.2 framing, no entropy coding) — enough for
    * round-trip specs and for writing `.br` landing files that any
    * conforming decoder (including this one) reads. */
  def compressUncompressed(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(data.length + 16 + data.length / (1 << 24) * 8)
    var bitBuf = 0L
    var bitCnt = 0
    def writeBits(v: Int, n: Int): Unit = {
      bitBuf |= (v.toLong & ((1L << n) - 1)) << bitCnt
      bitCnt += n
      while (bitCnt >= 8) { bos.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8 }
    }
    def align(): Unit = if (bitCnt > 0) { bos.write((bitBuf & 0xff).toInt); bitBuf = 0; bitCnt = 0 }
    writeBits(0, 1) // WBITS = 16
    var off = 0
    val chunk = 1 << 24 // max MLEN with 6 nibbles
    while (off < data.length) {
      val n = math.min(chunk, data.length - off)
      writeBits(0, 1) // ISLAST = 0 (uncompressed blocks cannot be last)
      val nibbles = if (n - 1 < (1 << 16)) 4 else if (n - 1 < (1 << 20)) 5 else 6
      writeBits(nibbles - 4, 2)
      var i = 0
      while (i < nibbles) { writeBits(((n - 1) >> (4 * i)) & 0xf, 4); i += 1 }
      writeBits(1, 1) // ISUNCOMPRESSED
      align()
      bos.write(data, off, n)
      off += n
    }
    writeBits(1, 1) // ISLAST
    writeBits(1, 1) // ISLASTEMPTY
    align()
    bos.toByteArray
  }
}
