package graft.multimodal

/** Once-per-JVM ImageIO configuration. ImageIO's default stream cache
  * spills every ImageInputStream to a temp FILE — a large constant
  * cost per tiny in-memory image (measured: q205 85 s → 1.5 s at
  * sf0.1). `setUseCache` mutates GLOBAL static JVM state, so it must
  * run exactly once per executor JVM, not per row: hot-path decode
  * sites reference [[heapOnly]] (forcing this object's initializer
  * under the class-init lock, thread-safe and free after the first
  * touch) instead of calling setUseCache themselves. */
object ImageIoConfig {
  private val applied: Unit = javax.imageio.ImageIO.setUseCache(false)

  /** Calling this guarantees the heap-only setting is applied in the
    * current JVM (forces the object initializer; a no-op after the
    * first touch). */
  def heapOnly(): Unit = applied
}
