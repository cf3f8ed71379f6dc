package graft

/** Host provenance for bench/shuffle records: wall-clock numbers are
  * only comparable within one boot (a mid-round reboot shifted every
  * wall 1.2-1.4× while per-key shuffle bytes stayed 1.0000× — the
  * adjudication that motivated this), so every record stamps the boot
  * id + cpu model and the compare tools auto-label cross-boot
  * comparisons as bytes-only instead of printing a raw wall ratio. */
object BootInfo {
  private def firstLine(path: String): Option[String] =
    try {
      val src = scala.io.Source.fromFile(path)
      try src.getLines().nextOption().map(_.trim).filter(_.nonEmpty)
      finally src.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  lazy val bootId: String =
    firstLine("/proc/sys/kernel/random/boot_id").getOrElse("unknown")

  lazy val cpu: String =
    try {
      val src = scala.io.Source.fromFile("/proc/cpuinfo")
      try src.getLines()
        .collectFirst { case l if l.startsWith("model name") =>
          l.split(":", 2).last.trim }
        .getOrElse("unknown")
      finally src.close()
    } catch { case scala.util.control.NonFatal(_) => "unknown" }

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  }

  /** Ready-to-splice JSON fields (no surrounding braces/comma). */
  def jsonFields: String =
    s""""boot_id":"${esc(bootId)}","cpu":"${esc(cpu)}""""
}
