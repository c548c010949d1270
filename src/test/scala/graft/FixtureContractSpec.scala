package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** FIXTURE CONTRACT GUARD, all tables (round-7 widening of
  * [[EventsFixtureSchemaSpec]]'s round-6 postmortem): the driver owns
  * `/root/testdata` and has regenerated it mid-build before, changing a
  * physical encoding (events.ts ns→µs) without notice. This suite pins —
  * per table, in ONE named assertion each — the columns the engine
  * actually depends on together with the Spark-visible types the loaders
  * are prepared to accept. A future regeneration that drifts any of them
  * fails HERE, naming the table, column, and observed type, instead of
  * cascading through every consumer suite.
  *
  * Deliberately a SUBSET check: extra columns a future fixture might add
  * are not failures (the engine's scans are projection-pruned and never
  * see them); only a missing column or an unhandled type flips the
  * tripwire. Types list every encoding the engine handles TODAY — if a
  * regeneration lands e.g. `date32` for l_shipdate, the fix is to widen
  * the consumer (like `Tables.normalizeTs`) and then record the new
  * encoding here. */
class FixtureContractSpec extends SparkSpec {

  private val date_ish: Set[DataType] =
    Set(DateType, TimestampType, TimestampNTZType)
  private val int_ish: Set[DataType] = Set(IntegerType, LongType)

  private def check(table: String, df: => DataFrame,
      required: Seq[(String, Set[DataType])]): Unit = {
    val schema = df.schema
    val problems = required.flatMap { case (name, accepted) =>
      schema.find(_.name == name) match {
        case None =>
          Some(s"$table.$name MISSING (engine consumers depend on it)")
        case Some(f) if !accepted.contains(f.dataType) =>
          Some(s"$table.$name has dtype ${f.dataType}, engine handles " +
            accepted.mkString("{", ", ", "}") +
            " — widen the consumer, then record the encoding here")
        case _ => None
      }
    }
    assert(problems.isEmpty,
      "fixture regeneration drifted from the engine contract:\n  " +
        problems.mkString("\n  "))
  }

  test("lineitem carries the engine's required columns in handled encodings") {
    check("lineitem", Tables.lineitem(spark, sf), Seq(
      "l_orderkey" -> int_ish, "l_partkey" -> int_ish,
      "l_suppkey" -> int_ish, "l_linenumber" -> int_ish,
      "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
      "l_shipdate" -> date_ish))
  }

  test("orders/customer/supplier/part/nation/region carry their required columns") {
    check("orders", Tables.orders(spark, sf), Seq(
      "o_orderkey" -> int_ish, "o_custkey" -> int_ish,
      "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> date_ish, "o_orderpriority" -> Set(StringType)))
    check("customer", Tables.customer(spark, sf), Seq(
      "c_custkey" -> int_ish, "c_name" -> Set(StringType),
      "c_nationkey" -> int_ish, "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)))
    check("supplier", Tables.supplier(spark, sf), Seq(
      "s_suppkey" -> int_ish, "s_name" -> Set(StringType),
      "s_nationkey" -> int_ish, "s_acctbal" -> Set(DoubleType)))
    check("part", Tables.part(spark, sf), Seq(
      "p_partkey" -> int_ish, "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
      "p_size" -> int_ish, "p_retailprice" -> Set(DoubleType)))
    check("nation", Tables.nation(spark, sf), Seq(
      "n_nationkey" -> int_ish, "n_name" -> Set(StringType),
      "n_regionkey" -> int_ish))
    check("region", Tables.region(spark, sf), Seq(
      "r_regionkey" -> int_ish, "r_name" -> Set(StringType)))
  }

  test("events (post-normalization), documents, embeddings carry their contract") {
    // events goes through the loader's ts normalization — the OUTPUT
    // contract is what every consumer sees (EventsFixtureSchemaSpec
    // covers the physical-encoding branches underneath)
    check("events", Tables.events(spark, sf), Seq(
      "event_id" -> Set[DataType](LongType), "ts" -> Set[DataType](TimestampType),
      "user_id" -> int_ish, "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType)))
    check("documents", Tables.documents(spark, sf), Seq(
      "doc_id" -> int_ish, "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> int_ish))
    check("embeddings", Tables.embeddings(spark, sf), Seq(
      "vec_id" -> int_ish,
      "embedding" -> Set[DataType](ArrayType(FloatType), ArrayType(FloatType, false),
        ArrayType(DoubleType), ArrayType(DoubleType, false)),
      "label" -> int_ish))
  }
}
