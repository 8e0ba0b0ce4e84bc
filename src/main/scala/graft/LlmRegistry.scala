package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of the LLM-training-data-pipeline operators (dedup, similarity
  * search, text analysis, multimodal) — filled in as they are built.
  */
object LlmRegistry {
  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map()
  val oracleSql: Map[String, String] = Map()
}
