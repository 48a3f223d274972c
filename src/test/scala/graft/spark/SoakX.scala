package graft.spark

/** Soak multiplier for the randomized DSv2 differential specs: default
  * trial counts keep CI fast; GRAFT_FUZZ_TRIALS_X=20 multiplies every
  * fuzz loop for on-demand deep runs (seeds derive from the trial
  * index, so a soak explores NEW cases, not reruns).
  */
object SoakX {
  val x: Int = sys.env.getOrElse("GRAFT_FUZZ_TRIALS_X", "1").toInt
}
