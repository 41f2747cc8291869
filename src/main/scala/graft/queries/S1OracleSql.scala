package graft.queries

/** DuckDB oracle for s1_chunk: replays the recursive-character splitter
  * (ChunkKernel) at (120, 20) over the documents corpus.
  *
  * The kernel is recursive over the separator hierarchy ("\n\n" → "\n" →
  * " " → ""), but on THIS corpus (no newlines, single-spaced ASCII, every
  * word far below chunk_size — properties the driver's generator fixes) it
  * reduces exactly to the greedy word-merge fold with the 20-char overlap
  * carry. The fold accumulates one string with a chr(31) unit separator
  * between finished chunks (the corpus can't contain control chars;
  * list-in-struct accumulators miscompile in DuckDB 1.0 list_reduce).
  * Any corpus drift breaks the hash gate LOUDLY — the Spark side always
  * runs the real recursive kernel.
  */
object S1OracleSql {

  val sql: String =
    """WITH f AS (SELECT doc_id, list_reduce(string_split(text, ' '),
      |    (a, b) -> CASE WHEN len(string_split(a, chr(31))[-1]) + 1 + len(b) > 120
      |                    AND string_split(a, chr(31))[-1] <> ''
      |      THEN a || chr(31) || right(string_split(a, chr(31))[-1], 20) || ' ' || b
      |      ELSE a || ' ' || b END) AS st FROM documents),
      |c AS (SELECT doc_id, string_split(st, chr(31)) AS chunks FROM f)
      |SELECT doc_id, s.i AS chunk_index, s.l AS chunk_len FROM
      |  (SELECT doc_id, unnest(list_transform(range(len(chunks)),
      |      i -> {'i': i, 'l': len(chunks[i+1])})) AS s FROM c) t
      |ORDER BY doc_id, chunk_index""".stripMargin
}
