package graft.tools

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}

/** The hermetic external video decoder — the subprocess half of
  * [[graft.multimodal.Multimodal.videoFramesExternal]]'s seam. Speaks
  * the length-prefixed pipe protocol (BE int byteLen + bitstream in;
  * BE int status, then width/height/nFrames + raw gray frames out;
  * byteLen = −1 ends the session) and decodes GDIF via the library's
  * ONE decode definition ([[graft.multimodal.Multimodal.gdifDecode]]).
  * A real deployment replaces this command with an ffmpeg invocation
  * emitting the same framing — no Spark-side change.
  */
object GdifDecoder {
  def main(args: Array[String]): Unit = {
    val in = new DataInputStream(new BufferedInputStream(System.in))
    val out = new DataOutputStream(new BufferedOutputStream(System.out))
    try {
      var run = true
      while (run) {
        val len =
          try in.readInt()
          catch { case _: EOFException => -1 } // closed pipe = done
        if (len < 0) run = false
        else {
          val bytes = new Array[Byte](len)
          in.readFully(bytes)
          graft.multimodal.Multimodal.gdifDecode(bytes) match {
            case Some((w, h, frames)) =>
              out.writeInt(0)
              out.writeInt(w); out.writeInt(h); out.writeInt(frames.size)
              frames.foreach(out.write)
            case None =>
              out.writeInt(1) // corrupt payload: data, not an error
          }
          out.flush()
        }
      }
    } finally out.flush()
  }
}
