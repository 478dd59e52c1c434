package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.PackedRow

/** Codegen-callable parser for the packed change-log payload
  * ([[graft.core.PackedRow]]): invoked via Catalyst `StaticInvoke` from
  * the envelope decode so the hot CDC apply path parses cells without a
  * JSON library or a UDF SerDe boundary. */
object PgPackedRowCodec {
  /** `"=ab\\N"` → ArrayData of nullable UTF8String cells. */
  def parse(s: UTF8String): ArrayData = {
    val cells = PackedRow.parse(s.toString)
    new GenericArrayData(
      cells.map(c => c.map(UTF8String.fromString).orNull).toArray[Any])
  }
}
