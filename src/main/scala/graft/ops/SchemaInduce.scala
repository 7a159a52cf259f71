package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema induction from data — the engine analog of the reference's
  * induce_class_definition_from_objects (reference:
  * src/linkml_store/api/collection.py:1065-1131: per-attribute type,
  * multivalued flag, nullability observed from the objects).
  *
  * Static shape (name, type, multivalued) comes from the Catalyst
  * schema; OBSERVED nullability and non-null counts need data and are
  * computed for all columns in a single scan (one agg row, then
  * exploded into per-column rows — no per-column jobs).
  */
object SchemaInduce {

  def induce(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toSeq
    val aggs = count(lit(1)).as("__total") +:
      fields.map(f => count(col(f.name)).as(s"__n_${f.name}"))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = fields.map { f =>
      val (dtype, multivalued) = f.dataType match {
        case ArrayType(et, _) => (et.simpleString, true)
        case dt => (dt.simpleString, false)
      }
      struct(
        lit(f.name).as("column"),
        lit(dtype).as("dtype"),
        lit(multivalued).as("multivalued"),
        (col("__total") > col(s"__n_${f.name}")).as("has_nulls"),
        col(s"__n_${f.name}").as("n_nonnull"))
    }
    one.select(explode(array(entries: _*)).as("e"))
      .select("e.*")
      .orderBy("column")
  }

  /** Duck oracle: expected dtype/multivalued are pinned constants (they
    * are deterministic for a fixed table); the observed stats are
    * recomputed independently.
    */
  def oracleSql(table: String, expected: Seq[(String, String, Boolean)]): String =
    expected.sortBy(_._1).map { case (name, dtype, mv) =>
      s"""SELECT '$name' AS "column", '$dtype' AS dtype, $mv AS multivalued,
         |  count(*) - count($name) > 0 AS has_nulls, count($name) AS n_nonnull
         |FROM $table""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")

  // ------- typed class-definition artifact ---------------------------

  /** Per-slot definition, mirroring the reference's SlotDefinition
    * fields (collection.py:1156-1158: range, multivalued, inlined,
    * inlined_as_list); `required` is the observed-nullability heuristic
    * (every sampled value present → required), the same
    * observation-driven induction the reference applies to types.
    */
  final case class SlotDefinition(
      name: String,
      range: Option[String],
      multivalued: Boolean,
      inlined: Boolean,
      required: Boolean) {
    def inlinedAsList: Boolean = inlined && multivalued
  }

  /** The induced class — an exportable schema artifact (reference
    * returns a LinkML ClassDefinition; this renders to deterministic
    * JSON and parses back, so it can round-trip through files or
    * catalogs).
    */
  final case class ClassDefinition(name: String, attributes: Seq[SlotDefinition]) {
    def toJson: String = {
      def slot(s: SlotDefinition): String = {
        val rng = s.range.map("\"" + _ + "\"").getOrElse("null")
        s"""{"name":"${s.name}","range":$rng,"multivalued":${s.multivalued},""" +
          s""""inlined":${s.inlined},"inlined_as_list":${s.inlinedAsList},""" +
          s""""required":${s.required}}"""
      }
      s"""{"name":"$name","attributes":[${attributes.map(slot).mkString(",")}]}"""
    }
  }

  object ClassDefinition {
    private val SlotRx =
      ("""\{"name":"([^"]*)","range":(null|"[^"]*"),"multivalued":(true|false),""" +
        """"inlined":(true|false),"inlined_as_list":(?:true|false),""" +
        """"required":(true|false)\}""").r
    private val HeadRx = """^\{"name":"([^"]*)","attributes":\[""".r

    /** Parse the JSON [[ClassDefinition.toJson]] emits (names must be
      * quote-free — Spark column names from parquet are).
      */
    def fromJson(json: String): ClassDefinition = {
      val name = HeadRx.findFirstMatchIn(json)
        .getOrElse(throw new IllegalArgumentException(s"not a class definition: $json"))
        .group(1)
      val slots = SlotRx.findAllMatchIn(json).map { m =>
        val rng = m.group(2) match {
          case "null" => None
          case quoted => Some(quoted.stripPrefix("\"").stripSuffix("\""))
        }
        SlotDefinition(m.group(1), rng,
          m.group(3).toBoolean, m.group(4).toBoolean, m.group(5).toBoolean)
      }.toSeq
      ClassDefinition(name, slots)
    }
  }

  /** Spark type → LinkML range (reference maps Python value types the
    * same way: str→string, bool→boolean, int→integer, float→float;
    * collection.py:1119-1134). Unmapped types get no range, like the
    * reference's `rng = None` fallback.
    */
  private def rangeOf(dt: DataType): Option[String] = dt match {
    case StringType => Some("string")
    case BooleanType => Some("boolean")
    case ByteType | ShortType | IntegerType | LongType => Some("integer")
    case FloatType | DoubleType => Some("float")
    case _: DecimalType => Some("decimal")
    case DateType => Some("date")
    case TimestampType | TimestampNTZType => Some("datetime")
    case _ => None
  }

  /** Induce the typed class definition: slot shape from the Catalyst
    * schema (array → multivalued over the element range; struct →
    * inlined, no range — the reference's nested-object case), observed
    * `required` from ONE data scan (the same single-aggregation pass as
    * [[induce]] — never a per-column job).
    */
  def induceClassDefinition(df: DataFrame, className: String): ClassDefinition = {
    val fields = df.schema.fields.toSeq
    val aggs = count(lit(1)).as("__total") +:
      fields.map(f => count(col(f.name)).as(s"__n_${f.name}"))
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    val total = row.getLong(0)
    val slots = fields.zipWithIndex.map { case (f, i) =>
      val (eff, multivalued) = f.dataType match {
        case ArrayType(et, _) => (et, true)
        case dt => (dt, false)
      }
      val inlined = eff.isInstanceOf[StructType]
      SlotDefinition(f.name, rangeOf(eff), multivalued, inlined,
        required = total > 0 && row.getLong(i + 1) == total)
    }
    ClassDefinition(className, slots)
  }
}
