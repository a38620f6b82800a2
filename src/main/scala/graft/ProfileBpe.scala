package graft

/**
 * Driver-side profiling main for the incremental BPE learner at PRODUCTION
 * vocabulary size (a real tokenizer is 32k–50k merges — the round-5 verdict's
 * one named scale ceiling). Synthesizes a deterministic Zipf word-count table
 * shaped like a 50k-word web-corpus head (random letter words, Zipf ranks),
 * then times `Bpe.learnMerges` at numMerges=32768. No Spark session — the
 * learn step is pure driver CPU by design (the distributed part of
 * `Bpe.learn` is the word-count aggregate, profiled by the corpus bench).
 *
 * Usage: tools/run.sh graft.ProfileBpe [numWords] [numMerges] [byteLevel] [recount]
 */
object ProfileBpe {
  def main(args: Array[String]): Unit = {
    val numWords = if (args.length > 0) args(0).toInt else 50000
    val numMerges = if (args.length > 1) args(1).toInt else 32768
    val byteLevel = args.length > 2 && args(2).toBoolean
    val recount = args.length > 3 && args(3) == "recount"
    val rnd = new java.util.Random(42)
    // Zipf head: rank r gets weight ~ 1e7 / (r+1); word lengths 2–12,
    // letters skewed toward a small hot set (realistic pair collisions)
    val words = (0 until numWords).map { r =>
      val len = 2 + rnd.nextInt(11)
      val w = (0 until len).map { _ =>
        val g = rnd.nextGaussian().abs
        ('a' + math.min(25, (g * 6).toInt)).toChar
      }.mkString
      (w + r.toString, (1e7 / (r + 1)).toLong + 2L) // suffix keeps words distinct
    }
    val t0 = System.nanoTime()
    val model =
      if (recount) graft.ml.Bpe.learnMergesRecount(words, numMerges, byteLevel)
      else graft.ml.Bpe.learnMerges(words, numMerges, byteLevel)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"learned ${model.merges.size} merges over $numWords words " +
      f"(byteLevel=$byteLevel, recount=$recount) in $secs%.1f s " +
      f"(${model.merges.size / secs}%.0f merges/s); vocab=${model.vocab.size}")
  }
}
