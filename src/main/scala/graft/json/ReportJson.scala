package graft.json

import com.fasterxml.jackson.databind.{ObjectMapper, SerializationFeature}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** JSON serialization of validation reports — the Spark-native analogue of
  * the reference's `jsonpickle.encode(report, unpicklable=False)`
  * (reference: README.md:58). Uses Jackson + jackson-module-scala, both
  * already on Spark's classpath. Case-class field declaration order matches
  * the reference's attribute assignment order, so key order is comparable.
  */
object ReportJson {
  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.disable(SerializationFeature.FAIL_ON_EMPTY_BEANS)
    m
  }

  def toJson(report: Any): String = mapper.writeValueAsString(report)

  def toPrettyJson(report: Any): String =
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(report)
}
