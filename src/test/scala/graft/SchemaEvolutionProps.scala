package graft

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.SchemaEvolution
import graft.operators.SchemaEvolution.{AddColumn, WidenColumn}

/** ScalaCheck properties for the schema-evolution lattice (pure logic, no
  * SparkSession) — SURVEY.md §5.2-3. */
object SchemaEvolutionProps extends Properties("SchemaEvolution") {

  private val scalarGen: Gen[DataType] = Gen.oneOf(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType, StringType)

  private val fieldGen: Gen[StructField] = for {
    name <- Gen.oneOf("a", "b", "c", "d", "e", "f")
    dt   <- Gen.oneOf(scalarGen, scalarGen.map(ArrayType(_)))
  } yield StructField(name, dt)

  private val schemaGen: Gen[StructType] =
    Gen.listOf(fieldGen).map(fs =>
      StructType(fs.groupBy(_.name).map(_._2.head).toSeq.sortBy(_.name)))

  private def tryEvolve(t: StructType, b: StructType) =
    try Some(SchemaEvolution.evolve(t, b))
    catch { case SchemaEvolution.Incompatible(_) => None }

  property("evolving a schema with itself changes nothing") =
    forAll(schemaGen) { s =>
      val (out, changes) = SchemaEvolution.evolve(s, s)
      out == s && changes.isEmpty
    }

  property("evolution is idempotent: a second pass with the same batch is a no-op") =
    forAll(schemaGen, schemaGen) { (t, b) =>
      tryEvolve(t, b) match {
        case None => Prop.passed // incompatible is allowed; must just be stable
        case Some((out, _)) =>
          val (out2, changes2) = SchemaEvolution.evolve(out, b)
          Prop(out2 == out && changes2.isEmpty)
      }
    }

  property("evolution never drops or narrows an existing target column") =
    forAll(schemaGen, schemaGen) { (t, b) =>
      tryEvolve(t, b) match {
        case None => Prop.passed
        case Some((out, _)) =>
          Prop(t.fields.forall { tf =>
            out.fields.find(_.name == tf.name).exists(of =>
              of.dataType == tf.dataType ||
                SchemaEvolution.canWiden(tf.dataType, of.dataType))
          })
      }
    }

  property("every reported change is real: adds are new names, widens widen") =
    forAll(schemaGen, schemaGen) { (t, b) =>
      tryEvolve(t, b) match {
        case None => Prop.passed
        case Some((_, changes)) =>
          Prop(changes.forall {
            case AddColumn(n, _) => !t.fieldNames.contains(n)
            case WidenColumn(n, from, to) =>
              t.fields.exists(f => f.name == n && f.dataType == from) &&
                SchemaEvolution.canWiden(from, to) && from != to
          })
      }
    }

  property("canWiden is a partial order: reflexive, antisymmetric, transitive") = {
    val all = Seq(ByteType, ShortType, IntegerType, LongType, FloatType,
      DoubleType, StringType) ++
      Seq(ByteType, IntegerType, LongType, FloatType).map(ArrayType(_))
    val refl = all.forall(d => SchemaEvolution.canWiden(d, d))
    val anti = all.forall(a => all.forall(b =>
      !(SchemaEvolution.canWiden(a, b) && SchemaEvolution.canWiden(b, a)) || a == b))
    val trans = all.forall(a => all.forall(b => all.forall(c =>
      !(SchemaEvolution.canWiden(a, b) && SchemaEvolution.canWiden(b, c)) ||
        SchemaEvolution.canWiden(a, c))))
    Prop(refl && anti && trans)
  }
}
