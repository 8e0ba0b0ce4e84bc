import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

package object graft {
  /** Session-free `$"colName"` interpolator (spark.implicits needs a live
    * session; query builders here are static).
    */
  implicit class ColStr(private val sc: StringContext) extends AnyVal {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
