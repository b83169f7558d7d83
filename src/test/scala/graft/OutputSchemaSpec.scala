package graft

import org.apache.spark.sql.types._

/** Driver-hashability tripwire, Spark side (the DuckDB side is
  * `tools/check_oracle_types.py`). The driver's correctness gate hashes
  * both frames through pandas; any output type the two engines render
  * with different precision/width — raw DECIMAL (round-7
  * `customer_value_deciles`), int128 (round-4 HUGEINT) — hash-mismatches
  * even when every value is equal. The repo's determinism ladder
  * therefore requires every `SparkEntry.queries` OUTPUT column to be one
  * of: BIGINT/INT (ints render identically), DOUBLE/FLOAT, STRING,
  * TIMESTAMP, DATE, BOOLEAN, or arrays/structs thereof. DECIMAL is fine
  * INTERNALLY (exact, combine-order-independent money arithmetic) but
  * must cross the boundary as BIGINT cents/micros or one final DOUBLE
  * cast. */
class OutputSchemaSpec extends SparkSpec {

  private def leafOk(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case DoubleType | FloatType => true
    case StringType | BooleanType => true
    case TimestampType | TimestampNTZType | DateType => true
    case BinaryType => true // opaque payloads hash bytewise on both sides
    case ArrayType(e, _) => leafOk(e)
    case MapType(k, v, _) => leafOk(k) && leafOk(v)
    case s: StructType => s.fields.forall(f => leafOk(f.dataType))
    case _ => false // DecimalType, CalendarIntervalType, ...
  }

  test("no registered query emits a driver-unhashable output type") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val offending = fn(spark, sf0001).schema.fields
          .filterNot(f => leafOk(f.dataType))
          .map(f => s"$name.${f.name}: ${f.dataType.sql}")
        offending
    }
    assert(bad.isEmpty,
      s"\nDECIMAL/unhashable output columns (put money on BIGINT " +
        s"cents/micros or a final DOUBLE cast):\n${bad.mkString("\n")}")
  }
}
