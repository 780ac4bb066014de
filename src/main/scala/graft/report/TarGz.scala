package graft.report

import java.io.{ByteArrayOutputStream, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** Minimal POSIX ustar tar.gz writer/reader (dependency-free; format per
  * the public ustar specification). Just enough for the schema-registry
  * archive contract: regular files with names <= 100 bytes.
  */
object TarGz {

  private def headerFor(name: String, size: Int): Array[Byte] = {
    require(name.getBytes(UTF_8).length <= 100, s"tar name too long: $name")
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes(UTF_8); System.arraycopy(b, 0, h, off, b.length)
    }
    put(0, name)
    put(100, "0000644")             // mode
    put(108, "0000000")             // uid
    put(116, "0000000")             // gid
    put(124, f"$size%011o" + "")    // size (octal)
    put(136, "00000000000")         // mtime (fixed: reproducible archives)
    put(156, "0")                          // typeflag: regular file
    put(257, "ustar")               // magic
    put(263, "00")                         // version
    // checksum: spaces while computing
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    val sum = h.map(_ & 0xff).sum
    put(148, f"$sum%06o" + " ")
    h
  }

  def write(out: OutputStream, entries: Seq[(String, Array[Byte])]): Unit = {
    val gz = new GZIPOutputStream(out)
    entries.foreach { case (name, data) =>
      gz.write(headerFor(name, data.length))
      gz.write(data)
      val pad = (512 - data.length % 512) % 512
      gz.write(new Array[Byte](pad))
    }
    gz.write(new Array[Byte](1024)) // end-of-archive
    gz.finish()
  }

  def read(in: InputStream): Seq[(String, Array[Byte])] = {
    val gz = new GZIPInputStream(in)
    val out = Seq.newBuilder[(String, Array[Byte])]
    val header = new Array[Byte](512)
    def readFully(buf: Array[Byte], n: Int): Boolean = {
      var off = 0
      while (off < n) {
        val r = gz.read(buf, off, n - off)
        if (r < 0) return false
        off += r
      }
      true
    }
    var done = false
    while (!done && readFully(header, 512)) {
      if (header.forall(_ == 0)) done = true
      else {
        val name = new String(header.take(100).takeWhile(_ != 0), UTF_8)
        val size = Integer.parseInt(
          new String(header.slice(124, 135), UTF_8).trim, 8)
        val data = new Array[Byte](size)
        require(readFully(data, size), s"truncated entry $name")
        val pad = (512 - size % 512) % 512
        if (pad > 0) { val skip = new Array[Byte](pad); readFully(skip, pad) }
        out += name -> data
      }
    }
    out.result()
  }

  def writeBytes(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    write(bos, entries)
    bos.toByteArray
  }
}
