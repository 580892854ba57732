package graft.tools

/** CLI for [[CrossoverProbe.extendCorpus]]: add named tables to an
  * existing ×N crossover corpus without rewriting the tables already
  * there. Usage: runMain graft.tools.SynthTables <factor> <table>...
  * e.g. `runMain graft.tools.SynthTables 100 embeddings` to give the
  * ×100 full-inventory oracle gate its 200k-vector embeddings table
  * (same per-copy offset + cyclic-shift synthesis the ×10 corpus got).
  */
object SynthTables {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: SynthTables <factor> <table> [table ...]")
    CrossoverProbe.extendCorpus(args(0).toInt, args.drop(1).toSeq)
  }
}
