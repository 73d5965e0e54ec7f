package graft.functions.expressions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Recursive JSON-hierarchy enrichment (SURVEY §2 N2): push parent context
  * into nested objects AND array elements, at arbitrary depth, mirroring the
  * reference's preprocessing (/root/reference .../SpecialCases.java:143-189):
  *
  *   - every child object gains `__parentKey` = the field name it sits under
  *   - every child object gains `__parent_<F>` for each F ∈ {id, name,
  *     domain, ocid} present on its parent, AND `__parent_<G>` for each
  *     already-materialized dunder field `__G` — so ancestry stacks
  *     (`__parent___parent_id` = grandparent id), exactly like the reference
  *   - array elements additionally gain `__index` = their position
  *
  * Spark-first shape: the recursion over a DYNAMIC document tree cannot be a
  * static Catalyst schema transform, so this is a native codegen'd unary
  * expression (one Jackson pass per row inside whole-stage codegen — the
  * §2.11 "promote to Expression" tier, not a UDF). Downstream, the enriched
  * string feeds the ordinary iterator-explode + get_json_object projection,
  * so `__parent_*` fields are addressable from any nesting level a mapping
  * iterator lands on.
  */
object JsonHierarchy {
  private val FieldsToMaterialize = Set("id", "name", "domain", "ocid")
  private val ParentPrefix = "__parent_"
  private val IndexField = "__index"
  private val ParentKey = "__parentKey"

  private val mapper = new ObjectMapper()

  /** Enrich a JSON document string; non-object roots pass through.
    * Malformed or empty input yields null — the null-in/null-out contract of
    * every other JSON path in the mapping compiler (get_json_object), so one
    * truncated line degrades to nulls/error-routing instead of failing the
    * whole job.
    */
  def enrich(json: UTF8String): UTF8String = {
    val root = try mapper.readTree(json.toString) catch {
      case _: com.fasterxml.jackson.core.JacksonException => null
    }
    if (root == null || root.isMissingNode) return null
    if (root.isObject) materialize(root.asInstanceOf[ObjectNode])
    UTF8String.fromString(mapper.writeValueAsString(root))
  }

  private def materialize(node: ObjectNode): Unit = {
    // capture the parent context BEFORE mutating children (stable iteration)
    val fields = {
      val it = node.fields()
      val buf = Vector.newBuilder[(String, JsonNode)]
      while (it.hasNext) { val e = it.next(); buf += e.getKey -> e.getValue }
      buf.result()
    }
    val toMaterialize = fields.collect {
      case (k, v) if k.startsWith("__") || FieldsToMaterialize.contains(k) =>
        (ParentPrefix + k) -> v
    }
    fields.foreach { case (parentKey, value) =>
      value match {
        case child: ObjectNode =>
          child.put(ParentKey, parentKey)
          toMaterialize.foreach { case (k, v) => child.set[JsonNode](k, v) }
          materialize(child)
        case arr: ArrayNode =>
          var index = 0
          val n = arr.size()
          while (index < n) {
            arr.get(index) match {
              case el: ObjectNode =>
                toMaterialize.foreach { case (k, v) => el.set[JsonNode](k, v) }
                el.put(ParentKey, parentKey)
                el.put(IndexField, index)
                materialize(el)
              case _ => ()
            }
            index += 1
          }
        case _ => ()
      }
    }
  }

  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  def enrichCol(json: Column): Column = column(JsonHierarchyExpr(expression(json)))
}

case class JsonHierarchyExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  // enrich() returns null for malformed input, so the expression is nullable
  // even for non-null children — nullSafeCodeGen (not defineCodeGen, which
  // assumes a non-null result) and an explicit isNull check.
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    JsonHierarchy.enrich(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.expressions.JsonHierarchy.enrich($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildInternal(newChild: Expression): JsonHierarchyExpr =
    copy(child = newChild)
}
