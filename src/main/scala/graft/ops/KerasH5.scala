package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal in-engine reader for the subset of the public Keras-3 /
  * HDF5 formats the reference artifact uses, so the engine loads
  * `lstm_model.keras` DIRECTLY — no external tooling step between the
  * reference's shipped model and a running query.
  *
  * Scope (errors loudly on anything else — this is an artifact reader,
  * not a general HDF5 library):
  *  - `.keras` = zip with `model.weights.h5` inside (Keras 3 container);
  *  - HDF5 superblock v0, 8-byte offsets/lengths;
  *  - classic v1 groups (TREE/SNOD B-tree + local HEAP for names);
  *  - v1 object headers with continuation blocks;
  *  - contiguous or compact numeric dataset layouts (f4/f8/i4/i8).
  *
  * Format reference: the public HDF5 file-format specification
  * (https://docs.hdfgroup.org/hdf5/develop/_f_m_t3.html). The same
  * subset is implemented by `tools/dump_keras_weights.py`, which
  * produced the shipped text resource; KerasH5Spec pins this reader
  * bit-identical to that extraction.
  */
object KerasH5 {

  final case class Tensor(shape: Seq[Int], data: Array[Double])

  /** Read every dataset under the HDF5 root into path → tensor
    * (paths like `/layers/lstm/cell/vars/0`). */
  def readH5(bytes: Array[Byte]): Map[String, Tensor] = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def u8(off: Long): Long = b.getLong(off.toInt)
    def u4(off: Long): Long = b.getInt(off.toInt).toLong & 0xffffffffL
    def u2(off: Long): Int = b.getShort(off.toInt) & 0xffff
    def u1(off: Long): Int = b.get(off.toInt) & 0xff
    def sig(off: Long, s: String): Boolean =
      (0 until s.length).forall(i => u1(off + i) == s.charAt(i))

    require(sig(0, "HDF"), "not an HDF5 file")
    require(u1(8) == 0, "only superblock v0 supported")
    require(u1(13) == 8 && u1(14) == 8, "need 8-byte offsets/lengths")
    // v0 superblock: sig(8) + versions/sizes(8) + group-k(4) + flags(4)
    // + base/freespace/eof/driver(32) = 56, then the root symbol entry
    val rootOh = u8(56 + 8)

    // v1 object header → (msgType, bodyOffset, size) with continuations
    def messages(oh: Long): Seq[(Int, Long, Int)] = {
      require(u1(oh) == 1, s"only v1 object headers supported (at $oh)")
      val nmsg = u2(oh + 2)
      val out = Seq.newBuilder[(Int, Long, Int)]
      var blocks = List((oh + 16, u4(oh + 8)))
      var seen = 0
      while (blocks.nonEmpty && seen < nmsg) {
        var (pos, remaining) = blocks.head
        blocks = blocks.tail
        while (remaining >= 8 && seen < nmsg) {
          val mtype = u2(pos); val msize = u2(pos + 2); val body = pos + 8
          if (mtype == 0x0010) blocks = blocks :+ (u8(body), u8(body + 8))
          else out += ((mtype, body, msize))
          seen += 1
          pos += 8 + msize
          remaining -= 8 + msize
        }
      }
      out.result()
    }

    def heapName(heap: Long, nameOff: Long): String = {
      require(sig(heap, "HEAP"), "bad local heap")
      val data = u8(heap + 24)
      val sb = new StringBuilder
      var i = data + nameOff
      while (u1(i) != 0) { sb.append(u1(i).toChar); i += 1 }
      sb.toString
    }

    // if the object is a v1 group: its (name, childOh) entries
    def groupEntries(oh: Long): Option[Seq[(String, Long)]] = {
      val st = messages(oh).find(_._1 == 0x0011)
      st.map { case (_, body, _) =>
        val heap = u8(body + 8)
        val out = Seq.newBuilder[(String, Long)]
        def walk(addr: Long): Unit = {
          require(sig(addr, "TREE"), "bad v1 B-tree node")
          val level = u1(addr + 5); val n = u2(addr + 6)
          val kids = addr + 24 + 8
          for (i <- 0 until n) {
            val child = u8(kids + i * 16)
            if (level > 0) walk(child)
            else {
              require(sig(child, "SNOD"), "bad symbol node")
              val cnt = u2(child + 6)
              for (j <- 0 until cnt) {
                val e = child + 8 + 40 * j
                out += ((heapName(heap, u8(e)), u8(e + 8)))
              }
            }
          }
        }
        walk(u8(body))
        out.result()
      }
    }

    def dataset(oh: Long): Option[Tensor] = {
      var shape: Seq[Int] = null
      var dtClass = -1; var dtSize = -1
      var data: (Long, Long) = null // (offset, byteLen) into the buffer
      messages(oh).foreach {
        case (0x0001, body, _) => // dataspace
          val ver = u1(body); val rank = u1(body + 1)
          val hdr = if (ver == 1) 8 else 4
          shape = (0 until rank).map(i => u8(body + hdr + 8L * i).toInt)
        case (0x0003, body, _) => // datatype
          dtClass = u1(body) & 0x0f
          dtSize = u4(body + 4).toInt
        case (0x0008, body, _) => // data layout
          require(u1(body) == 3, "only layout message v3 supported")
          u1(body + 1) match {
            case 1 => data = (u8(body + 2), u8(body + 10)) // contiguous
            case 0 => data = (body + 4, u2(body + 2).toLong) // compact
            case _ => throw new IllegalArgumentException(
              "chunked dataset layout unsupported")
          }
        case _ => ()
      }
      if (shape == null || data == null) None
      else {
        val n = shape.product
        val (off, _) = data
        val arr = new Array[Double](n)
        (dtClass, dtSize) match {
          case (1, 4) => for (i <- 0 until n) arr(i) = b.getFloat((off + 4L * i).toInt).toDouble
          case (1, 8) => for (i <- 0 until n) arr(i) = b.getDouble((off + 8L * i).toInt)
          case (0, 4) => for (i <- 0 until n) arr(i) = b.getInt((off + 4L * i).toInt).toDouble
          case (0, 8) => for (i <- 0 until n) arr(i) = b.getLong((off + 8L * i).toInt).toDouble
          case other => throw new IllegalArgumentException(
            s"unsupported datatype $other")
        }
        Some(Tensor(shape, arr))
      }
    }

    val out = Map.newBuilder[String, Tensor]
    def walk(oh: Long, path: String): Unit = groupEntries(oh) match {
      case Some(entries) =>
        entries.foreach { case (name, child) => walk(child, s"$path/$name") }
      case None =>
        dataset(oh).foreach(t => out += (path -> t))
    }
    walk(rootOh, "")
    out.result()
  }

  /** Extract `model.weights.h5` from a `.keras` zip on disk. */
  def readKerasArchive(path: String): Map[String, Tensor] = {
    val zf = new java.util.zip.ZipFile(path)
    try {
      val entry = zf.getEntry("model.weights.h5")
      require(entry != null, s"$path has no model.weights.h5 — not a Keras 3 archive")
      readH5(zf.getInputStream(entry).readAllBytes())
    } finally zf.close()
  }

  /** Assemble [[Predict.LstmWeights]] from a Keras-3 LSTM stack's
    * tensors: per LSTM layer, kernel (in, 4·units) / recurrent_kernel
    * (units, 4·units) / bias (4·units) with gate column blocks in
    * Keras's [i, f, g, o] order, de-interleaved to the engine's
    * per-gate row-major (units, in) layout; Dense(1) kernel+bias as the
    * readout. `layerNames` follow Keras auto-naming ("lstm", "lstm_1",
    * …). The frozen scaler pair is passed by the caller (Keras archives
    * don't carry the sklearn scaler — the reference ships it as the
    * separate scaler.pkl). */
  def lstmWeights(tensors: Map[String, Tensor], layerNames: Seq[String],
      denseName: String, scaler: Option[(Double, Double)]): Predict.LstmWeights = {
    def t(p: String): Tensor =
      tensors.getOrElse(p, throw new IllegalArgumentException(
        s"missing tensor '$p' (have: ${tensors.keys.toSeq.sorted.mkString(", ")})"))
    val layers = layerNames.map { name =>
      val kernel = t(s"/layers/$name/cell/vars/0")
      val recur = t(s"/layers/$name/cell/vars/1")
      val bias = t(s"/layers/$name/cell/vars/2")
      val Seq(m, four) = kernel.shape
      val n = four / 4
      require(recur.shape == Seq(n, 4 * n) && bias.shape == Seq(4 * n),
        s"inconsistent LSTM tensor shapes for layer $name")
      // gate block g of a (rows, 4n) kernel, transposed to (n, rows)
      def gate(src: Tensor, rows: Int, g: Int): Array[Double] =
        Array.tabulate(n * rows) { x =>
          val i = x / rows; val j = x % rows
          src.data(j * 4 * n + g * n + i)
        }
      def bgate(g: Int): Array[Double] =
        Array.tabulate(n)(i => bias.data(g * n + i))
      Predict.LstmLayerWeights(m, n,
        gate(kernel, m, 0), gate(recur, n, 0), bgate(0),
        gate(kernel, m, 1), gate(recur, n, 1), bgate(1),
        gate(kernel, m, 2), gate(recur, n, 2), bgate(2),
        gate(kernel, m, 3), gate(recur, n, 3), bgate(3))
    }
    val dk = t(s"/layers/$denseName/vars/0")
    val db = t(s"/layers/$denseName/vars/1")
    require(dk.shape.last == 1 && db.shape == Seq(1),
      "readout must be Dense(1)")
    Predict.LstmWeights(layers, dk.data, "relu", db.data(0), scaler)
  }
}
