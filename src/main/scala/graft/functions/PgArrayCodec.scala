package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.PgText

/** Codegen-callable Postgres 1-D array-literal parser for the wire
  * backfill's typed decode ([[graft.sources.PgCopy.decodeTyped]]).
  *
  * Invoked via Catalyst `StaticInvoke` so the call participates in
  * whole-stage codegen (no UDF SerDe); the actual tokenizer is
  * [[PgText.parseArray]], the same stateful escape-aware parser the CDC
  * path uses — unlike a regex split it handles `\"` inside quoted
  * elements and literal backslashes correctly (reference text-codec
  * semantics: crates/etl/src/postgres/codec/text.rs:163-210).
  */
object PgArrayCodec {
  /** `{a,"b c",NULL}` → ArrayData of nullable UTF8String elements. */
  def parse(s: UTF8String): ArrayData = {
    val elems = PgText.parseArray(s.toString)
    new GenericArrayData(
      elems.map(e => e.map(UTF8String.fromString).orNull).toArray[Any])
  }
}
