package graft.io

/** S3 YAML config round-trip (SURVEY.md §2.1; reference `app.py:122-130`
  * `yaml.safe_dump`/`safe_load` of a flat settings map). Pure driver-side;
  * the subset emitted/parsed is flat scalar key→value — exactly what the
  * reference round-trips — so no external YAML dependency is needed
  * (zero-egress build).
  */
object YamlConfig {

  /** Pipeline configuration (the reference's session settings surface:
    * `app.py:122-130,185-192`). */
  final case class PipelineConfig(
      sdcCols: Seq[String] = Seq.empty,
      sdcThreshold: Long = 5,
      generalizeCols: Seq[String] = Seq.empty,
      generalizeBins: Int = 10,
      dpCols: Seq[String] = Seq.empty,
      epsilon: Double = 1.0,
      sensitivity: Double = 1.0,
      synthetic: Boolean = false,
      seed: Long = 42L)

  def dump(c: PipelineConfig): String = {
    def seq(xs: Seq[String]) = if (xs.isEmpty) "[]" else xs.mkString("[", ", ", "]")
    s"""sdc_cols: ${seq(c.sdcCols)}
       |sdc_threshold: ${c.sdcThreshold}
       |generalize_cols: ${seq(c.generalizeCols)}
       |generalize_bins: ${c.generalizeBins}
       |dp_cols: ${seq(c.dpCols)}
       |epsilon: ${c.epsilon}
       |sensitivity: ${c.sensitivity}
       |synthetic: ${c.synthetic}
       |seed: ${c.seed}
       |""".stripMargin
  }

  def load(yaml: String): PipelineConfig = {
    val kv = yaml.linesIterator
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap { l =>
        l.split(":", 2) match {
          case Array(k, v) => Some(k.trim -> v.trim)
          case _ => None
        }
      }.toMap
    def seq(s: String): Seq[String] = {
      val inner = s.stripPrefix("[").stripSuffix("]").trim
      if (inner.isEmpty) Seq.empty else inner.split(",").map(_.trim).toSeq
    }
    PipelineConfig(
      sdcCols = kv.get("sdc_cols").map(seq).getOrElse(Seq.empty),
      sdcThreshold = kv.get("sdc_threshold").map(_.toLong).getOrElse(5L),
      generalizeCols = kv.get("generalize_cols").map(seq).getOrElse(Seq.empty),
      generalizeBins = kv.get("generalize_bins").map(_.toInt).getOrElse(10),
      dpCols = kv.get("dp_cols").map(seq).getOrElse(Seq.empty),
      epsilon = kv.get("epsilon").map(_.toDouble).getOrElse(1.0),
      sensitivity = kv.get("sensitivity").map(_.toDouble).getOrElse(1.0),
      synthetic = kv.get("synthetic").exists(_.toBoolean),
      seed = kv.get("seed").map(_.toLong).getOrElse(42L))
  }
}
