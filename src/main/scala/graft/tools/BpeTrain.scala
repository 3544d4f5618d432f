package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot trainer for the committed BPE merges fixture
  * (`src/main/resources/graft/bpe_merges.txt`), the classic Sennrich
  * et al. 2016 algorithm: count adjacent symbol pairs over the
  * frequency-weighted word vocabulary, merge the most frequent pair
  * everywhere (ties broken lexicographically for determinism), repeat
  * until no pair occurs twice or `maxMerges` is hit.
  *
  * Training order IS the rank order, which makes the table
  * TRAINING-CONSISTENT by construction: a pair involving a merged token
  * can only be counted (and therefore learned) after the merge that
  * created the token, so its rank is strictly greater — the property
  * [[graft.functions.Bpe]]'s oracle-equivalence argument relies on and
  * BpeSpec re-asserts.
  *
  * Usage: runMain graft.tools.BpeTrain <docsDir> <outFile> [maxMerges]
  */
object BpeTrain {
  def main(args: Array[String]): Unit = {
    val docsDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outFile = args.lift(1)
      .getOrElse("src/main/resources/graft/bpe_merges.txt")
    val maxMerges = args.lift(2).map(_.toInt).getOrElse(512)

    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val texts = graft.Tables.load(spark, docsDir, "documents")
      .select("text").collect().map(_.getString(0))
    spark.stop()

    // frequency-weighted vocabulary of whitespace words
    val freq = new scala.collection.mutable.HashMap[String, Long]()
    texts.foreach(t => graft.functions.Bpe.words(t)
      .foreach(w => freq.update(w, freq.getOrElse(w, 0L) + 1)))

    var vocab: Vector[(Array[String], Long)] = freq.toVector.sortBy(_._1)
      .map { case (w, n) => (w.toCharArray.map(String.valueOf), n) }

    val merges = Vector.newBuilder[(String, String)]
    var done = false
    var k = 0
    while (!done && k < maxMerges) {
      val pairs = new scala.collection.mutable.HashMap[(String, String), Long]()
      vocab.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairs.update(p, pairs.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      val best = pairs.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best match {
        case Some(((a, b), n)) if n >= 2 =>
          merges += ((a, b))
          vocab = vocab.map { case (syms, cnt) =>
            val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                out += a + b; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, cnt)
          }
          k += 1
        case _ => done = true
      }
    }

    val lines = merges.result().map { case (a, b) => s"$a\t$b" }
    val p = java.nio.file.Paths.get(outFile)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p,
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    println(s"[bpetrain] ${lines.size} merges -> $outFile")
  }
}
