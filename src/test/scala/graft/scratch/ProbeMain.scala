package graft.scratch
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val d = graft.util.HostProbe.memSweep(2, 1.5)
    val f = graft.util.HostProbe.computeSweep(2, 1.5)
    println(f"dram2=$d%.0f flops2=$f%.0f")
  }
}
