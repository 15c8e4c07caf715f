package graft.streaming

/** Package-private bridge for [[graft.tools.ProfileStreaming]]. */
object WireCodecAccess {
  def decode(factory: com.fasterxml.jackson.core.JsonFactory,
      s: String): Option[MotionPipeline.BinFrame] =
    MotionPipeline.decodeJsonFrame(factory, s)
}
