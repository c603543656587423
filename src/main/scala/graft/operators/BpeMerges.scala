package graft.operators

/** LEARNED BPE merge rules — generated artifact ([[Bpe.train]]
  * over `/root/testdata/sf0.01/documents.parquet`, 24 weighted merges,
  * deterministic count-desc/lexicographic tiebreak). Produced by
  * `sbt "runMain graft.tools.TrainBpeMain"`. Checked in for the
  * same reason as [[PqCodebooks]]: production trains the
  * tokenizer offline and ships it, and the DuckDB oracle must
  * see the exact rules. BpeSpec retrains live and pins equality.
  */
object BpeMerges {
  val NMerges = 24

  val merges: Seq[(String, String)] = Seq(
    ("e", "r"),
    ("i", "n"),
    ("o", "w"),
    ("o", "r"),
    ("s", "t"),
    ("m", "er"),
    ("a", "t"),
    ("l", "u"),
    ("a", "r"),
    ("p", "ar"),
    ("j", "o"),
    ("jo", "in"),
    ("a", "s"),
    ("as", "h"),
    ("h", "ash"),
    ("r", "ow"),
    ("at", "c"),
    ("atc", "h"),
    ("b", "atch"),
    ("a", "n"),
    ("c", "an"),
    ("s", "can"),
    ("c", "o"),
    ("c", "u")
  )
}
