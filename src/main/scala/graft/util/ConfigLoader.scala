package graft.util

import java.io.{File, FileInputStream}
import java.util.Properties

/** Layered .properties loading, mirroring the reference's three identical
  * ConfigLoaders (/root/reference/dvaf/{processor,producer,scaler}/.../utils/
  * ConfigLoader.java:20-68): explicit file → ./config/ dir → classpath
  * resource, with a `name.local.properties` overlay winning over
  * `name.properties` at each layer. Engine confs go to
  * `SparkSession.builder.config`; this covers the app-level knobs
  * (paths, camera lists, intervals).
  */
object ConfigLoader {

  /** Load `<name>.properties` (+ `.local.` overlay) from, in priority order:
    * an explicit path (if given), `./config/`, then the classpath.
    */
  def load(
      name: String,
      explicitPath: Option[String] = None,
      configDir: String = "config"): Properties = {
    val props = new Properties()

    def overlayFile(f: File): Unit =
      if (f.isFile) {
        val in = new FileInputStream(f)
        try props.load(in) finally in.close()
      }

    def overlayResource(resource: String): Unit = {
      val in = getClass.getClassLoader.getResourceAsStream(resource)
      if (in != null) try props.load(in) finally in.close()
    }

    // lowest priority first — later loads overwrite earlier keys
    overlayResource(s"$name.properties")
    overlayResource(s"$name.local.properties")
    overlayFile(new File(configDir, s"$name.properties"))
    overlayFile(new File(configDir, s"$name.local.properties"))
    explicitPath.foreach(p => overlayFile(new File(p)))
    props
  }

  def get(props: Properties, key: String, default: String): String =
    Option(props.getProperty(key)).getOrElse(default)

  def getInt(props: Properties, key: String, default: Int): Int =
    Option(props.getProperty(key)).map(_.trim.toInt).getOrElse(default)
}
