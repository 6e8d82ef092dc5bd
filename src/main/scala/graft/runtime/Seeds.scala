package graft.runtime

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** Seed loading: typed CSV → managed table (reference: 26 seeds under
  * seeds/, schemas pinned in seeds/properties.yml:1-60; e.g.
  * seeds/gold_regions_source.csv ref'd by models/spark/gold/gold_regions.sql:47).
  */
object Seeds {

  /** Load a CSV file as a table. `schema` pins column types (like
    * properties.yml); without it, types are inferred. */
  def load(ctx: Ctx, name: String, csvPath: String,
           schema: Option[StructType] = None): DataFrame = {
    val reader = ctx.spark.read.option("header", "true")
    val df = schema match {
      case Some(s) => reader.schema(s).csv(csvPath)
      case None => reader.option("inferSchema", "true").csv(csvPath)
    }
    ctx.warehouse.createTable(name, df)
    ctx.warehouse.read(name)
  }

  /** Inline seed (for tests / literal lookup tables). */
  def loadRows(ctx: Ctx, name: String, header: Seq[String],
               rows: Seq[Seq[String]], schema: Option[StructType] = None): DataFrame = {
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Files.createTempFile(s"seed_$name", ".csv")
    val lines = (header.mkString(",") +: rows.map(_.mkString(","))).asJava
    java.nio.file.Files.write(tmp, lines)
    try load(ctx, name, tmp.toString, schema)
    finally java.nio.file.Files.deleteIfExists(tmp)
  }
}
