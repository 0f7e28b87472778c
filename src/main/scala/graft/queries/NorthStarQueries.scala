package graft.queries

import graft.GQuery

/** North-star pipeline operators (SURVEY.md §2.11): dedup family, similarity
  * search, text analysis, multimodal columns. Filled in milestone M5.
  */
object NorthStarQueries {
  val all: Seq[GQuery] = Seq()
}
