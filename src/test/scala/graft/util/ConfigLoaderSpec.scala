package graft.util

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class ConfigLoaderSpec extends AnyFunSuite {

  test("config-dir file loads and .local. overlay wins per key") {
    val dir = graft.ScratchDir.dir("cfg")
    Files.writeString(java.nio.file.Paths.get(dir, "app.properties"),
      "a=1\nb=2\n")
    Files.writeString(java.nio.file.Paths.get(dir, "app.local.properties"),
      "b=20\nc=30\n")
    val p = ConfigLoader.load("app", configDir = dir)
    assert(p.getProperty("a") == "1")
    assert(p.getProperty("b") == "20") // .local. overlay wins
    assert(p.getProperty("c") == "30")
  }

  test("explicit path has highest priority; typed getters and defaults") {
    val dir = graft.ScratchDir.dir("cfg2")
    Files.writeString(java.nio.file.Paths.get(dir, "app.properties"), "x=5\n")
    val explicit = java.nio.file.Paths.get(dir, "override.properties")
    Files.writeString(explicit, "x=7\n")
    val p = ConfigLoader.load("app", explicitPath = Some(explicit.toString), configDir = dir)
    assert(ConfigLoader.getInt(p, "x", 0) == 7)
    assert(ConfigLoader.getInt(p, "missing", 42) == 42)
    assert(ConfigLoader.get(p, "missing", "d") == "d")
  }

  test("missing everything yields empty properties") {
    assert(ConfigLoader.load("nonexistent", configDir = "/nonexistent").isEmpty)
  }
}
