package graft.std

import org.apache.spark.sql.DataFrame

/** Driver-side schema operators (SURVEY §2.2 P1/P2/P7).
  *
  * These manipulate column *names* before any plan is built, mirroring the
  * reference's driver-side schema repair (`/root/reference/Project.py:20-34,
  * 158-164`). They are deliberately not row expressions: schema resolution
  * happens once on the driver, so Catalyst sees plain resolved columns.
  */
object SchemaOps {

  /** P1 — snake_case a column name (`Project.py:20-23`).
    * Steps (order matters, matches the reference): trim; non-word/non-space
    * runs -> `_`; whitespace runs -> `_`; collapse `_+`; strip leading and
    * trailing `_`; lowercase. `(?U)` keeps `\w` unicode-aware like Python's.
    */
  def toSnake(name: String): String =
    name.trim
      .replaceAll("(?U)[^\\w\\s]+", "_")
      .replaceAll("(?U)\\s+", "_")
      .replaceAll("_+", "_")
      .replaceAll("^_+|_+$", "")
      .toLowerCase

  /** P1 applied to a whole frame (`Project.py:25`). */
  def snakeCaseColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(toSnake).toIndexedSeq: _*)

  /** P2 — drop index-artifact columns if present (`Project.py:32-34`). */
  val ArtifactColumns: Seq[String] = Seq("unnamed_0", "index", "unnamed")

  def dropArtifacts(df: DataFrame): DataFrame =
    df.drop(ArtifactColumns.filter(df.columns.contains): _*)

  /** P7 — fuzzy column resolver (`Project.py:158-164`): first column whose
    * lowercase name *contains* a pattern substring; priority is pattern
    * order first, then column order.
    */
  def findColumn(patterns: Seq[String], columns: Seq[String]): Option[String] =
    patterns.iterator
      .map(p => columns.find(_.toLowerCase.contains(p)))
      .collectFirst { case Some(c) => c }

  /** Two-tier product resolution (`Project.py:170-176`): description-like
    * names first, code-like names as fallback.
    */
  def findProductColumn(columns: Seq[String]): Option[String] =
    findColumn(
      Seq("product_desc", "product_description", "prod_desc",
          "description", "product_name", "prod_name"), columns)
      .orElse(findColumn(Seq("product_code", "product_id", "prod_code"), columns))

  def findRegionColumn(columns: Seq[String]): Option[String] =
    findColumn(Seq("region_desc", "region", "territory"), columns)

  def findBrandColumn(columns: Seq[String]): Option[String] =
    findColumn(Seq("brand_desc", "brand", "brand_name"), columns)

  /** Conform a frame to a target schema — the 100-TB form of the
    * reference's per-column `if col in df.columns` probing
    * (`Project.py:33,48,54`): a corpus written across months of
    * pipeline revisions has files with missing and drifted columns,
    * and every consumer wants ONE declared schema. Missing columns
    * materialize as typed nulls, present ones cast (ANSI off →
    * coerce-to-null, the reference's error model), extras drop,
    * order normalizes. Pure projection: no shuffle, codegen-friendly,
    * and safe to apply per-file-schema via the evolving reader
    * ([[graft.sources.Tables.readEvolving]]).
    */
  def conformTo(df: DataFrame,
                target: org.apache.spark.sql.types.StructType): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    // case-INSENSITIVE match, like Spark's own default resolution: a
    // writer that emitted 'Region' must conform to target 'region' as
    // a cast, not silently become nulls. Exact-case match wins when
    // both exist; otherwise the first case-variant in column order.
    val exact = df.columns.toSet
    val byLower = df.columns.groupBy(_.toLowerCase)
    df.select(target.fields.toIndexedSeq.map { f =>
      val source =
        if (exact.contains(f.name)) Some(f.name)
        else byLower.get(f.name.toLowerCase).map(_.head)
      (source match {
        case Some(c) => df(c).cast(f.dataType)
        case None => lit(null).cast(f.dataType)
      }).as(f.name)
    }: _*)
  }
}
