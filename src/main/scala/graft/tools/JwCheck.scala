package graft.tools
object JwCheck {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(7)
    val alpha = "abcde"
    def rs() = (0 until (1 + rnd.nextInt(10))).map(_ => alpha(rnd.nextInt(5))).mkString
    val pairs = (1 to 2000).map(_ => (rs(), rs()))
    pairs.foreach { case (a, b) =>
      println(a + "," + b + "," + graft.functions.JaroWinkler.similarity(a, b))
    }
  }
}
