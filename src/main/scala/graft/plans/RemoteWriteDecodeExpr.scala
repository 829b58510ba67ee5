package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native generator decoding one UNCOMPRESSED Prometheus remote-write
  * `WriteRequest` payload (BINARY) into one row per (series, sample):
  * `(labels MAP<STRING,STRING>, value DOUBLE, ts_ms BIGINT)` — the
  * row-local fan-out of [[graft.sources.RemoteWrite.walk]], so a
  * payload decodes entirely on the executor that holds it and the
  * payload bytes never shuffle. Labels-only series emit nothing (a
  * series exists on the wire only through its samples).
  *
  * Generators sit at an explode boundary where whole-stage codegen is
  * already split, so CodegenFallback costs nothing here (same placement
  * as [[CharTrigramsExpr]]).
  */
case class RemoteWriteDecodeExpr(child: Expression)
  extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("labels", MapType(StringType, StringType, valueContainsNull = false)),
    StructField("value", DoubleType),
    StructField("ts_ms", LongType)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"prom_rw_decode expects binary, got ${child.dataType.simpleString}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val bytes = child.eval(input).asInstanceOf[Array[Byte]]
    if (bytes == null) return Iterator.empty
    graft.sources.RemoteWrite.walk(bytes).iterator.flatMap { s =>
      val keys = new GenericArrayData(
        s.labels.map(l => UTF8String.fromString(l._1)).toArray[Any])
      val values = new GenericArrayData(
        s.labels.map(l => UTF8String.fromString(l._2)).toArray[Any])
      val labels = new ArrayBasedMapData(keys, values)
      s.samples.iterator.map { case (v, ts) => InternalRow(labels, v, ts) }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** The native-histogram face of the same walker: one row per (series,
  * histogram sample) — `(labels, ts_ms, schema, offs, lens, deltas)`,
  * the exposition span encoding ready for the shared relational span
  * walk (`Metrics.decodeWireSpans`).
  */
case class RemoteWriteHistDecodeExpr(child: Expression)
  extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("labels", MapType(StringType, StringType, valueContainsNull = false)),
    StructField("ts_ms", LongType),
    StructField("schema", IntegerType),
    StructField("count", LongType),
    StructField("sum", DoubleType),
    StructField("zero_count", LongType),
    StructField("offs", ArrayType(IntegerType, containsNull = false)),
    StructField("lens", ArrayType(IntegerType, containsNull = false)),
    StructField("deltas", ArrayType(LongType, containsNull = false)),
    StructField("neg_offs", ArrayType(IntegerType, containsNull = false)),
    StructField("neg_lens", ArrayType(IntegerType, containsNull = false)),
    StructField("neg_deltas", ArrayType(LongType, containsNull = false)),
    // prompb ResetHint (field 14): 0 UNKNOWN, 1 YES, 2 NO, 3 GAUGE —
    // carried relationally so gauge-type families keep hint semantics
    // through this tier too (the serving door's chunk appender reads it)
    StructField("reset_hint", IntegerType)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"prom_rw_decode_hist expects binary, got ${child.dataType.simpleString}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val bytes = child.eval(input).asInstanceOf[Array[Byte]]
    if (bytes == null) return Iterator.empty
    graft.sources.RemoteWrite.walk(bytes).iterator.flatMap { s =>
      val keys = new GenericArrayData(
        s.labels.map(l => UTF8String.fromString(l._1)).toArray[Any])
      val values = new GenericArrayData(
        s.labels.map(l => UTF8String.fromString(l._2)).toArray[Any])
      val labels = new ArrayBasedMapData(keys, values)
      s.hists.iterator.map { h =>
        InternalRow(labels, h.tsMs, h.schema, h.count, h.sum, h.zeroCount,
          new GenericArrayData(h.offs.toArray),
          new GenericArrayData(h.lens.toArray),
          new GenericArrayData(h.deltas.toArray),
          new GenericArrayData(h.negOffs.toArray),
          new GenericArrayData(h.negLens.toArray),
          new GenericArrayData(h.negDeltas.toArray),
          h.resetHint)
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** The FLOAT-form native-histogram face: one row per (series, float
  * histogram sample) — absolute double bucket counts (prompb's
  * `positive_counts`/`negative_counts`), ready for the shared span
  * walk's ABSOLUTE mode. Column names mirror the integer face
  * (`deltas`/`neg_deltas`) so the family registry and quantile walk
  * are shape-compatible; the arrays are double-typed.
  */
case class RemoteWriteFHistDecodeExpr(child: Expression)
  extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("labels", MapType(StringType, StringType, valueContainsNull = false)),
    StructField("ts_ms", LongType),
    StructField("schema", IntegerType),
    StructField("count", DoubleType),
    StructField("sum", DoubleType),
    StructField("zero_count", DoubleType),
    StructField("offs", ArrayType(IntegerType, containsNull = false)),
    StructField("lens", ArrayType(IntegerType, containsNull = false)),
    StructField("deltas", ArrayType(DoubleType, containsNull = false)),
    StructField("neg_offs", ArrayType(IntegerType, containsNull = false)),
    StructField("neg_lens", ArrayType(IntegerType, containsNull = false)),
    StructField("neg_deltas", ArrayType(DoubleType, containsNull = false)),
    StructField("reset_hint", IntegerType)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"prom_rw_decode_fhist expects binary, got ${child.dataType.simpleString}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val bytes = child.eval(input).asInstanceOf[Array[Byte]]
    if (bytes == null) return Iterator.empty
    graft.sources.RemoteWrite.walk(bytes).iterator.flatMap { s =>
      val keys = new GenericArrayData(
        s.labels.map(l => UTF8String.fromString(l._1)).toArray[Any])
      val values = new GenericArrayData(
        s.labels.map(l => UTF8String.fromString(l._2)).toArray[Any])
      val labels = new ArrayBasedMapData(keys, values)
      s.fhists.iterator.map { h =>
        InternalRow(labels, h.tsMs, h.schema, h.count, h.sum, h.zeroCount,
          new GenericArrayData(h.offs.toArray),
          new GenericArrayData(h.lens.toArray),
          new GenericArrayData(h.counts.toArray),
          new GenericArrayData(h.negOffs.toArray),
          new GenericArrayData(h.negLens.toArray),
          new GenericArrayData(h.negCounts.toArray),
          h.resetHint)
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** The exemplar face: one row per (series, exemplar) — the series'
  * label map, the exemplar's own labels (trace ids), value, timestamp.
  */
case class RemoteWriteExDecodeExpr(child: Expression)
  extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("labels", MapType(StringType, StringType, valueContainsNull = false)),
    StructField("ex_labels", MapType(StringType, StringType, valueContainsNull = false)),
    StructField("value", DoubleType),
    StructField("ts_ms", LongType)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"prom_rw_decode_ex expects binary, got ${child.dataType.simpleString}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val bytes = child.eval(input).asInstanceOf[Array[Byte]]
    if (bytes == null) return Iterator.empty
    def toMap(ls: Seq[(String, String)]): ArrayBasedMapData =
      new ArrayBasedMapData(
        new GenericArrayData(ls.map(l => UTF8String.fromString(l._1)).toArray[Any]),
        new GenericArrayData(ls.map(l => UTF8String.fromString(l._2)).toArray[Any]))
    graft.sources.RemoteWrite.walk(bytes).iterator.flatMap { s =>
      val labels = toMap(s.labels)
      s.exemplars.iterator.map { e =>
        InternalRow(labels, toMap(e.labels), e.value, e.tsMs)
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object RemoteWriteDecodeExpr {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "prom_rw_decode",
      exprs => RemoteWriteDecodeExpr(exprs.head),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "prom_rw_decode_hist",
      exprs => RemoteWriteHistDecodeExpr(exprs.head),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "prom_rw_decode_ex",
      exprs => RemoteWriteExDecodeExpr(exprs.head),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "prom_rw_decode_fhist",
      exprs => RemoteWriteFHistDecodeExpr(exprs.head),
      "built-in")
  }
}
