package graft.functions

import graft.token.Murmur3Token
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftshim.GraftShims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Catalyst expression computing the Cassandra Murmur3 partition token of a
 * partition key (one or more columns) — the rebuild of the reference's
 * `Tokenizer` (`bulkwriter/Tokenizer.java`) + `MurmurHash.hash`
 * (`data/partitioner/MurmurHash.java`) as a native Spark expression
 * (SURVEY §4.2: "custom Catalyst work needed: a token(...) Expression").
 * Spark's builtin `hash()`/`xxhash64()` are NOT bit-compatible with the
 * Cassandra ring, hence the port (SURVEY §7.4).
 *
 * Null components hash as the empty buffer (CQL serialized-null), composite
 * keys use CompositeType framing — see [[Murmur3Token.serializeKey]].
 *
 * Scale note: this is the partitioning function of the entire write path
 * (`repartitionByRange` on the token column): per-row CPU only, no shuffle,
 * no driver involvement. Codegen emits child evaluation inline and one
 * static call into [[CassandraToken.evalComponents]], so the projection
 * feeding the write shuffle stays in whole-stage codegen.
 */
case class CassandraToken(children: Seq[Expression])
    extends Expression {

  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = children.map(_.dataType).collectFirst {
      case dt @ (ArrayType(_, _) | MapType(_, _, _) | StructType(_)) => dt
    }
    bad match {
      case Some(dt) => TypeCheckResult.TypeCheckFailure(
        s"graft_token does not support complex partition-key component type $dt")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  /** CQL serialization tags per component: Spark stores timestamps as epoch
   *  MICROS and dates as day counts, while the Cassandra ring hashes 8-byte
   *  millis / 4-byte centered days — the tag tells the shared eval to
   *  re-encode (see `Murmur3Token.serializeMillis/serializeDays`). */
  private def typeTags: Array[String] = CassandraToken.typeTagsOf(children)

  override def eval(input: InternalRow): Any =
    CassandraToken.evalComponents(children.map(_.eval(input)).toArray, typeTags)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val comps = ctx.freshName("comps")
    val cls = CassandraToken.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val tagsRef = ctx.addReferenceObj("graftTokenTags", typeTags, "java.lang.String[]")
    val fill = children.indices.map { i =>
      s"$comps[$i] = ${evals(i).isNull} ? null : (Object) ${evals(i).value};"
    }.mkString("\n")
    ev.copy(
      code = code"""
        |${evals.map(_.code).mkString("\n")}
        |Object[] $comps = new Object[${children.length}];
        |$fill
        |long ${ev.value} = $cls.evalComponents($comps, $tagsRef);
       """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)

  override def prettyName: String = "graft_token"
}

object CassandraToken {
  def apply(cols: Column*): Column =
    GraftShims.column(new CassandraToken(cols.map(GraftShims.expression).toSeq))

  /** Spark internal values → the values [[Murmur3Token.serializeKey]]
   *  understands (shared by the Murmur3 and RandomPartitioner expressions —
   *  both rings hash the identical CQL key serialization). */
  def normalizeComponents(components: Array[Any], tags: Array[String]): Seq[Any] =
    components.toSeq.zipWithIndex.map {
      case (null, _) => null
      case (v: java.lang.Long, i) if tags(i) == "ts" =>
        // Spark internal epoch micros → CQL 8-byte epoch millis
        Murmur3Token.serializeMillis(Math.floorDiv(v.longValue(), 1000L))
      case (v: java.lang.Integer, i) if tags(i) == "date" =>
        // Spark internal day count → CQL centered unsigned days
        Murmur3Token.serializeDays(v.intValue())
      case (u: UTF8String, _) => u.toString
      case (other, _) => other
    }

  /** CQL serialization tags per component (see [[CassandraToken.typeTags]]). */
  def typeTagsOf(children: Seq[Expression]): Array[String] =
    children.map(_.dataType match {
      case TimestampType | TimestampNTZType => "ts"
      case DateType => "date"
      case _ => ""
    }).toArray

  /** Shared eval for interpreted and generated code paths. */
  def evalComponents(components: Array[Any], tags: Array[String]): Long =
    Murmur3Token.tokenOf(normalizeComponents(components, tags))
}

/**
 * RandomPartitioner twin of [[CassandraToken]]: md5 `abs(BigInteger)` token
 * (see [[graft.token.RandomToken]]) emitted as fixed-width 16-byte
 * big-endian BINARY, whose unsigned-lexicographic ordering equals numeric
 * token ordering — so every downstream range-partition/sort treats it
 * exactly like the Murmur3 long. Same CQL key serialization, same codegen
 * shape (inline child eval + one static call).
 */
case class CassandraRandomToken(children: Seq[Expression])
    extends Expression {

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = children.map(_.dataType).collectFirst {
      case dt @ (ArrayType(_, _) | MapType(_, _, _) | StructType(_)) => dt
    }
    bad match {
      case Some(dt) => TypeCheckResult.TypeCheckFailure(
        s"graft_random_token does not support complex partition-key component type $dt")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  private def typeTags: Array[String] = CassandraToken.typeTagsOf(children)

  override def eval(input: InternalRow): Any =
    CassandraRandomToken.evalComponents(children.map(_.eval(input)).toArray, typeTags)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val comps = ctx.freshName("comps")
    val cls = CassandraRandomToken.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val tagsRef = ctx.addReferenceObj("graftRandomTokenTags", typeTags, "java.lang.String[]")
    val fill = children.indices.map { i =>
      s"$comps[$i] = ${evals(i).isNull} ? null : (Object) ${evals(i).value};"
    }.mkString("\n")
    ev.copy(
      code = code"""
        |${evals.map(_.code).mkString("\n")}
        |Object[] $comps = new Object[${children.length}];
        |$fill
        |byte[] ${ev.value} = $cls.evalComponents($comps, $tagsRef);
       """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)

  override def prettyName: String = "graft_random_token"
}

object CassandraRandomToken {
  def apply(cols: Column*): Column =
    GraftShims.column(new CassandraRandomToken(cols.map(GraftShims.expression).toSeq))

  /** Shared eval for interpreted and generated code paths. */
  def evalComponents(components: Array[Any], tags: Array[String]): Array[Byte] =
    graft.token.RandomToken.tokenBytes16(graft.token.RandomToken.tokenOf(
      CassandraToken.normalizeComponents(components, tags)))
}
