package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Enum domain validation: Spark's StringType loses the DDL enum symbol
  * set (SURVEY.md §4.2), so the registry keeps symbols in column
  * metadata and this check enforces them at projection time.
  */
object EnumCheck {

  /** Pass value through; raise on a symbol outside the enum domain.
    * NULL passes (nullability is the union's concern, not the enum's).
    */
  def assertEnum(c: Column, symbols: Seq[String]): Column =
    when(c.isNull || c.isin(symbols.map(_.asInstanceOf[Any]): _*), c)
      .otherwise(raise_error(concat(lit("enum violation: value '"), c,
        lit(s"' not in {${symbols.mkString(",")}}"))))

  /** Boolean membership variant for filter-style validation. */
  def isValidEnum(c: Column, symbols: Seq[String]): Column =
    c.isNull || c.isin(symbols.map(_.asInstanceOf[Any]): _*)
}
