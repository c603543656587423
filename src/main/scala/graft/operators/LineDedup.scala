package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style cross-document line deduplication: lines that repeat
  * across many documents are boilerplate (headers, navigation chrome,
  * cookie banners) and are removed from every document BEFORE any
  * doc-level quality scoring — the standard first dedup stage of a web
  * training corpus, distinct from doc-level near-dup
  * ([[ApproxDedup]]) and corpus-wide span dedup ([[SubstringDedup]]).
  *
  * The corpus here has no newlines, so "lines" are fixed-width word
  * chunks — the segmentation is a pluggable convention; the removal
  * machinery is segmentation-agnostic.
  *
  * Design for 100 TB:
  *   - segmentation is posexplode(words) → groupBy (doc, chunk):
  *     LINEAR in document length. The tempting alternative — explode a
  *     chunk-index range and `slice` the words array per chunk — plants
  *     the full array on every chunk row, O(len²/lineWords) bytes into
  *     the exchange, quadratic for long documents;
  *   - the boilerplate set (doc-frequency ≥ minDocs) is by definition
  *     a tiny fraction of distinct lines; the removal anti-join's build
  *     side carries only those lines, and AQE broadcasts it when small;
  *   - reassembly shuffles narrow (doc, idx, line) rows once; every
  *     stage partitions by doc or by line hash — no all-pairs anywhere.
  */
object LineDedup {

  /** Fixed-width word-chunk segmentation: (id, line_idx, line). */
  def chunkLines(df: DataFrame, idCol: Column, textCol: Column, lineWords: Int): DataFrame = {
    require(lineWords >= 1, s"lineWords must be >= 1, got $lineWords")
    df.select(idCol.as("id"), posexplode(split(textCol, " ")).as(Seq("pos", "word")))
      .groupBy(col("id"), floor(col("pos") / lineWords).cast("long").as("line_idx"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("word")))), _.getField("word")),
          " "
        ).as("line")
      )
  }

  /** Remove every line occurring in >= `minDocs` distinct documents and
    * reassemble: (id, n_lines, n_removed, cleaned). Documents whose
    * every line was boilerplate survive with `cleaned = ""`.
    */
  def removeBoilerplate(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      lineWords: Int,
      minDocs: Int
  ): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lines = chunkLines(df, idCol, textCol, lineWords)
    val boiler = lines
      .groupBy(col("line"))
      .agg(countDistinct(col("id")).as("docs"))
      .where(col("docs") >= minDocs)
      .select(col("line"))
    val kept = lines.join(boiler, Seq("line"), "left_anti")
    val stats = lines.groupBy(col("id")).agg(count(lit(1)).as("n_lines"))
    val reassembled = kept
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("line_idx"), col("line")))), _.getField("line")),
          " "
        ).as("cleaned")
      )
    stats
      .join(reassembled, Seq("id"), "left")
      .select(
        col("id"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("cleaned"), lit("")).as("cleaned")
      )
  }
}
