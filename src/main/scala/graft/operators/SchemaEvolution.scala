package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** Schema-compat gate + evolution.
  *
  * The reference hard-aborts on any schema drift (`checkRequiredFields`,
  * CountyAddressPointETL.py:5343-5352) and separately hand-patches
  * additive drift (add_ugrc_zips / checkFlagField,
  * AddressPoints_ErrorChecker.py:40-55). The engine unifies both: additive
  * columns and widening casts EVOLVE the target; anything else REJECTS the
  * batch to error_records.
  */
object SchemaEvolution {

  /** true if a value of `from` can be losslessly widened to `to`. */
  def canWiden(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b                  => true
    case (IntegerType, LongType)           => true
    case (ShortType, IntegerType | LongType) => true
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (FloatType, DoubleType)           => true
    case (ArrayType(a, _), ArrayType(b, _)) => canWiden(a, b)
    case _                                 => false
  }

  sealed trait Change
  case class AddColumn(name: String, dt: DataType) extends Change
  case class WidenColumn(name: String, from: DataType, to: DataType) extends Change

  case class Incompatible(msg: String) extends Exception(msg)

  /** Evolve `target` to accept `batch`.
    * @return (evolved target schema, changes applied)
    * @throws Incompatible when a batch column conflicts non-widenably. */
  def evolve(target: StructType, batch: StructType): (StructType, Seq[Change]) = {
    var out     = target
    var changes = Vector.empty[Change]
    batch.fields.foreach { bf =>
      target.fields.find(_.name == bf.name) match {
        case None =>
          out = StructType(out.fields :+ StructField(bf.name, bf.dataType, nullable = true))
          changes :+= AddColumn(bf.name, bf.dataType)
        case Some(tf) if tf.dataType == bf.dataType => ()
        case Some(tf) if canWiden(bf.dataType, tf.dataType) => () // batch narrower: cast up on align
        case Some(tf) if canWiden(tf.dataType, bf.dataType) =>
          out = StructType(out.fields.map(f =>
            if (f.name == tf.name) f.copy(dataType = bf.dataType) else f))
          changes :+= WidenColumn(tf.name, tf.dataType, bf.dataType)
        case Some(tf) =>
          throw Incompatible(
            s"column ${bf.name}: batch type ${bf.dataType.sql} incompatible with target ${tf.dataType.sql}")
      }
    }
    (out, changes)
  }

  /** Project `df` onto `schema`: cast matching columns, null-fill missing
    * ones (the schema-evolution-tolerant union — reference analog:
    * Append 'NO_TEST', UpdateAddressPointsSDE.py:48). */
  def align(df: DataFrame, schema: StructType): DataFrame = {
    val present = df.columns.toSet
    df.select(schema.fields.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
  }
}
