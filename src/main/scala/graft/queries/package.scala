package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

package object queries {
  /** Session-independent `$"col"` syntax (no `spark.implicits._` needed
    * inside the (SparkSession, dir) => DataFrame query closures). */
  implicit class Dollar(val sc: StringContext) extends AnyVal {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
