package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar function surface (SURVEY.md §2.8): string / date / math / JSON.
  *
  * All built-in `org.apache.spark.sql.functions` — codegen'd, no UDFs in
  * the hot path. The reference's scalar surface is JSON serialize/parse
  * (`producer.py:9`, `stream_consumer.py:96-98`), ISO timestamp formatting
  * (`producer.py:23`), arithmetic scaling and round(2)
  * (`producer.py:18,24`); generalized here across string/date/math.
  */
object Scalars {

  /** String + date + math built-ins over orders. Exact-compare notes:
    * string/date/int outputs are exact; abs/sqrt are IEEE correctly-rounded
    * (bit-identical across engines); ln is libm (1-ulp engine variance) so
    * it is rounded to 4 decimals before compare. */
  def stringDateMath(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        upper(col("o_orderpriority")).as("pri_up"),
        substring(col("o_orderpriority"), 1, 1).as("pri_code"),
        concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("status_pri"),
        length(col("o_orderpriority")).cast(LongType).as("pri_len"),
        year(col("o_orderdate")).cast(LongType).as("yr"),
        month(col("o_orderdate")).cast(LongType).as("mon"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("mon_start"),
        abs(col("o_totalprice") - lit(100000.0)).as("centered"),
        sqrt(col("o_totalprice")).as("sqrt_price"),
        round(log(col("o_totalprice")), 4).as("ln_price"))
      .orderBy(col("o_orderkey"))

  /** Array scalar functions (§2.8 generalization — the reference's only
    * arrays are driver-side numpy): size/element_at/contains/sort/
    * distinct/slice/join over the document token arrays, all codegen'd
    * built-ins. The token split happens once in its own projection. */
  def arrayFunctions(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast(LongType).as("n_toks"),
        element_at(col("toks"), 1).as("first_tok"),
        element_at(col("toks"), -1).as("last_tok"),
        array_contains(col("toks"), "the").as("has_the"),
        array_join(slice(sort_array(array_distinct(col("toks"))), 1, 3), ",")
          .as("top3_alpha"))
      .orderBy(col("doc_id"))

  /** P1-P3 — JSON parse with explicit schema then struct flatten: the
    * reference's Kafka-envelope decode (`from_json(cast(value as string),
    * schema).alias("data")` → `select("data.*")`,
    * `stream_consumer.py:96-98`), applied to the events `props` column. */
  def parseJson(s: SparkSession, d: String): DataFrame = {
    val propsSchema = StructType(Seq(StructField("k", LongType)))
    Tables.events(s, d)
      .select(col("event_id"),
        from_json(col("props"), propsSchema).as("data"))
      .select(col("event_id"), col("data.k").as("k"))
      .orderBy(col("event_id"))
  }

  /** Semi-structured parse through Spark 4's VARIANT type — the
    * schema-on-read path for payloads whose shape is NOT known up
    * front (from_json needs the schema; parse_json needs nothing):
    * props parses once to a binary variant and fields extract lazily
    * with typed paths. At 100 TB this is the ingestion pattern for
    * heterogeneous event payloads — store the variant column, extract
    * per query, never re-parse strings per field. Emits the typed
    * extraction, a missing-path probe (try_variant_get → NULL, the
    * error-free path), and the discovered schema string. */
  def parseVariant(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"), parse_json(col("props")).as("v"))
      .select(col("event_id"),
        variant_get(col("v"), "$.k", "bigint").as("k"),
        try_variant_get(col("v"), "$.missing", "bigint").as("k_missing"),
        schema_of_variant(col("v")).as("v_schema"))
      .orderBy(col("event_id"))
}
