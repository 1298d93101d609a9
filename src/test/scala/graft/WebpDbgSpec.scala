package graft
import graft.operators.Webp
import org.scalatest.funsuite.AnyFunSuite
class WebpDbgSpec extends AnyFunSuite {
  test("which fixture fails") {
    for (name <- Seq("photo_61x37", "palette_40x25", "repeats_96x48")) {
      val in = getClass.getResourceAsStream(s"/vp8l/$name.webp")
      val b = try in.readAllBytes() finally in.close()
      try {
        val (w, h, px) = Webp.decodeWebpPixels(b)
        println(s"[dbg] $name OK ${w}x$h")
      } catch { case e: Throwable => println(s"[dbg] $name FAIL ${e.getMessage}") }
    }
  }
}
